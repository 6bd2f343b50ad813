"""Streaming ANN ingest (streaming/ann_stream.py): persisted IVF-PQ
index + stream-static join must reproduce the batch operator exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators import similarity as sim
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming import ann_stream as A

N_CELLS = 8
NPROBE = 2
K = 3


def test_streaming_ann_matches_batch_ivf_pq(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ann_index")
    centers, books = A.write_ann_index(emb, idx, n_cells=N_CELLS)

    # queries = the batch operator's own query set (vec_id % 10 == 0),
    # replayed as a file stream of (qid, v) rows
    qdir = str(tmp_path / "queries")
    emb.where("vec_id % 10 = 0").select(
        F.col("vec_id").cast("long").alias("qid"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).write.parquet(qdir)
    qschema = "qid long, v array<double>"
    qstream = spark.readStream.schema(qschema).parquet(qdir)

    out = str(tmp_path / "results")
    q = A.streaming_ann_topk(
        qstream,
        spark,
        idx,
        out_path=out,
        checkpoint=str(tmp_path / "ckpt"),
        k=K,
        nprobe=NPROBE,
    )
    q.awaitTermination(180)

    got = {
        (r["query_id"], r["vec_id"], r["score"])
        for r in spark.read.parquet(out).collect()
    }
    # the batch operator self-searches EVERY vector; restrict to the
    # query subset that was streamed
    want = {
        (r["query_id"], r["vec_id"], r["score"])
        for r in sim.ivf_pq_topk(
            emb,
            k=K,
            n_cells=N_CELLS,
            nprobe=NPROBE,
            centers=centers,
            codebooks=books,
        )
        .where("query_id % 10 = 0")
        .collect()
    }
    assert got == want
    assert len({q for q, _, _ in got}) > 10  # real query coverage


def test_candidate_stream_is_cell_pruned(spark, sf_dir, tmp_path):
    """The stream-static join must produce ONLY candidates from probed
    cells — strictly fewer than queries × corpus (the pruning that makes
    the index an index)."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ann_index2")
    A.write_ann_index(emb, idx, n_cells=N_CELLS)

    qdir = str(tmp_path / "queries2")
    emb.where("vec_id % 10 = 0").select(
        F.col("vec_id").cast("long").alias("qid"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).write.parquet(qdir)
    qstream = spark.readStream.schema("qid long, v array<double>").parquet(
        qdir
    )

    cands = A.streaming_ann_candidates(qstream, spark, idx, nprobe=NPROBE)
    q = (
        cands.writeStream.format("memory")
        .queryName("ann_cands")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_cand = spark.sql("SELECT COUNT(*) c FROM ann_cands").collect()[0]["c"]
    n_q = emb.where("vec_id % 10 = 0").count()
    n_corpus = emb.count()
    assert 0 < n_cand < n_q * n_corpus
    # expected pruning ratio ~ nprobe/n_cells (cells are FFT-balanced
    # only roughly; allow generous slack)
    assert n_cand < n_q * n_corpus * 0.75


def test_knn_index_state_prefix_parity(spark, sf_dir, tmp_path):
    """KnnIndexState folded over micro-batch chunks equals the batch
    ivf_topk (pretrained centers, parity kernels) over the union
    bit-for-bit after EVERY prefix, and its mutual_pairs equal the
    batch reciprocity join; replays are no-ops."""
    emb = read_table(spark, sf_dir, "embeddings")
    centers = sim.build_ivf_centroids(emb, n_cells=4, seed=42, l=2)
    st = A.KnnIndexState(
        str(tmp_path / "knn_idx"),
        str(tmp_path / "knn_cand"),
        centers,
        k=K,
        nprobe=NPROBE,
    )
    for bid in range(3):
        batch = emb.where(F.col("vec_id") % 3 == bid)
        st.update(batch, bid)
        prefix = emb.where(F.col("vec_id") % 3 <= bid)
        want_topk = sim.ivf_topk(
            prefix, k=K, nprobe=NPROBE, centers=centers, parity=True
        )
        got = sorted(
            map(
                tuple,
                st.topk(spark)
                .select("query_id", "vec_id", "score")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                want_topk.select("query_id", "vec_id", "score").collect(),
            )
        )
        assert got == want, f"prefix through batch {bid}"
        want_pairs = sorted(
            map(
                tuple,
                sim.mutual_knn_pairs(None, k=K, topk=want_topk).collect(),
            )
        )
        got_pairs = sorted(map(tuple, st.mutual_pairs(spark).collect()))
        assert got_pairs == want_pairs

    n_before = spark.read.parquet(st.cand_dir).count()
    st.update(emb.where(F.col("vec_id") % 3 == 0), 0)  # replay
    assert spark.read.parquet(st.cand_dir).count() == n_before
