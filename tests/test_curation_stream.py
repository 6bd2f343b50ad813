"""Streaming curation: file-source replay must equal the batch
operators bit-for-bit (the stages are stateless per-row maps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators.curation import redact_pii
from big_data_computing__spark.operators.textstats import quality_scores
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.curation_stream import (
    quality_gate_stream,
    redact_pii_stream,
)


def test_streaming_curation_matches_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    # plant PII so redaction has real work
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" contact bob@example.com at 10.1.2.3")
            ),
        ).otherwise(F.col("text")),
    )
    data = str(tmp_path / "docs")
    seeded.write.parquet(data)

    stream = spark.readStream.schema(seeded.schema).parquet(data)
    out = quality_gate_stream(redact_pii_stream(stream), min_quality=0.45)
    query = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curation_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"], r["quality_score"])
        for r in spark.sql(
            "SELECT doc_id, text, quality_score FROM curation_out"
        ).collect()
    }

    # batch equivalent: redact, then score + filter
    red = redact_pii(seeded)
    scores = quality_scores(red).select("doc_id", "quality_score")
    want = {
        (r["doc_id"], r["text"], r["quality_score"])
        for r in red.join(scores, "doc_id")
        .where(F.col("quality_score") >= 0.45)
        .collect()
    }
    assert got == want and len(got) > 0
    # redaction actually fired on the planted rows that survived
    planted = [t for (d, t, q) in got if d % 7 == 0]
    assert planted and all(
        "<EMAIL>" in t and "<IP>" in t and "bob@" not in t for t in planted
    )


def test_repetition_stream_matches_batch(spark, sf_dir, tmp_path):
    """The per-row (sort + max-run) streaming reformulation must equal
    the batch explode→groupBy operator value-for-value on real docs."""
    from big_data_computing__spark.operators.curation import (
        repetition_metrics,
    )
    from big_data_computing__spark.streaming.curation_stream import (
        with_repetition_metrics,
    )

    docs = read_table(spark, sf_dir, "documents")
    data = str(tmp_path / "docs")
    docs.write.parquet(data)

    cols = [
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "dup_bigram_frac",
        "dup_trigram_frac",
    ]
    stream = spark.readStream.schema(docs.schema).parquet(data)
    query = (
        with_repetition_metrics(stream)
        .select(*cols)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rep_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_rep"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        tuple(r) for r in spark.sql("SELECT * FROM rep_stream_out").collect()
    }
    want = {tuple(r) for r in repetition_metrics(docs).select(*cols).collect()}
    assert got == want and len(got) > 0


def test_repetition_window_stream_watermarked_rollup(spark, sf_dir, tmp_path):
    """Watermarked tumbling-window repetition monitor: file replay must
    equal the batch groupBy-window computation of the same metrics."""
    from big_data_computing__spark.streaming.curation_stream import (
        repetition_window_stream,
        with_repetition_metrics,
    )

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") * 7),
    )
    data = str(tmp_path / "docs_ts")
    docs.write.parquet(data)

    stream = spark.readStream.schema(docs.schema).parquet(data)
    query = (
        repetition_window_stream(stream, ts_col="ts", window="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rep_win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM rep_win_out").collect()}

    # append mode emits a window only once the watermark passes its end;
    # the final window (end > max_event_time - delay) legitimately stays
    # open in state, so the batch expectation excludes it
    final_wm = docs.agg(
        (F.max("ts") - F.expr("INTERVAL 30 SECONDS")).alias("wm")
    ).collect()[0]["wm"]
    want = {
        tuple(r)
        for r in with_repetition_metrics(docs)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dup_bigram_frac"), 6).alias(
                "mean_dup_bigram_frac"
            ),
            F.sum((F.col("dup_bigram_frac") > 0.2).cast("int")).alias(
                "n_degenerate"
            ),
        )
        .where(F.col("w.end") <= F.lit(final_wm))
        .select(
            F.col("w.start"), F.col("w.end"), "n_docs",
            "mean_dup_bigram_frac", "n_degenerate",
        )
        .collect()
    }
    assert got == want and len(got) > 1


def test_curation_ingest_stream_composed(spark, sf_dir, tmp_path):
    """The composed ingest pipeline (redact → quality gate → repetition
    gate → streaming exact dedup): surviving fingerprint set must equal
    the batch-computed expectation (survivor doc_ids can differ — dedup
    keeps whichever duplicate arrives first)."""
    from big_data_computing__spark.functions.hashing import hash60
    from big_data_computing__spark.functions.text import normalized
    from big_data_computing__spark.streaming.curation_stream import (
        curation_ingest_stream,
        with_repetition_metrics,
    )

    docs = read_table(spark, sf_dir, "documents")
    # plant exact duplicates so the dedup stage has real work
    dup = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    seeded = docs.unionByName(dup)
    data = str(tmp_path / "docs_ingest")
    seeded.write.parquet(data)

    stream = spark.readStream.schema(seeded.schema).parquet(data)
    query = (
        curation_ingest_stream(stream)
        .select("fingerprint")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = [r["fingerprint"] for r in spark.sql(
        "SELECT fingerprint FROM ingest_out"
    ).collect()]

    red = redact_pii(seeded)
    scores = quality_scores(red).select("doc_id", "quality_score")
    kept = red.join(scores, "doc_id").where(F.col("quality_score") >= 0.45)
    batch = with_repetition_metrics(kept).where(
        F.col("dup_bigram_frac") <= 0.2
    )
    want = {
        r["f"]
        for r in batch.select(
            hash60(normalized(F.col("text"))).alias("f")
        ).collect()
    }
    assert set(got) == want and len(got) == len(want) > 0


def test_mixture_gate_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming mixture gate (stream-static broadcast join + counter
    draw) over a replay must keep exactly the batch resample's docs."""
    from big_data_computing__spark.operators.curation import (
        mixture_resample,
        mixture_resample_rates,
    )
    from big_data_computing__spark.streaming.curation_stream import (
        mixture_gate_stream,
    )

    docs = read_table(spark, sf_dir, "documents")
    rates = mixture_resample_rates(docs).select("source", "rate")
    data = str(tmp_path / "mix_docs")
    docs.write.parquet(data)

    stream = spark.readStream.schema(docs.schema).parquet(data)
    out = mixture_gate_stream(stream, rates).select("doc_id", "source")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("mix_gate")
        .option("checkpointLocation", str(tmp_path / "ckpt_mix"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["source"])
        for r in spark.sql("SELECT * FROM mix_gate").collect()
    }
    want = {
        (r["doc_id"], r["source"])
        for r in mixture_resample(docs).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_tokenize_matches_batch(spark, sf_dir, tmp_path):
    """Both learned tokenizers apply unchanged on a stream (bpe_apply
    is a pure Catalyst map, unigram_apply an Arrow mapInPandas — no
    state, no shuffle) and must equal the batch application
    bit-for-bit on a file-source replay."""
    from big_data_computing__spark.operators.textstats import (
        bpe_apply,
        bpe_train,
        unigram_apply,
        unigram_train,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    merges = bpe_train(docs, n_merges=6)
    vocab = unigram_train(
        docs, vocab_size=40, seed_size=200, max_piece_len=4, em_rounds=1
    )
    data = str(tmp_path / "docs")
    docs.write.parquet(data)
    stream = spark.readStream.schema(docs.schema).parquet(data)

    for name, apply_fn in (
        ("bpe", lambda df: bpe_apply(df, merges)),
        ("uni", lambda df: unigram_apply(df, vocab, max_piece_len=4)),
    ):
        q = (
            apply_fn(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"tok_{name}")
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out_col = "bpe_tokens" if name == "bpe" else "pieces"
        got = {
            r["doc_id"]: list(r[out_col])
            for r in spark.sql(f"SELECT * FROM tok_{name}").collect()
        }
        want = {
            r["doc_id"]: list(r[out_col])
            for r in apply_fn(docs).collect()
        }
        assert got == want and len(got) > 0, name


def test_dsir_stream_state_and_replay_parity(spark, sf_dir, tmp_path):
    """Streaming DSIR: (1) after every prefix of the stream the bucket
    state equals the batch bucket table over the arrived rows; (2)
    scoring the accumulated corpus against the final state reproduces
    batch dsir_importance bit-for-bit; (3) update is idempotent under
    batch-id replays."""
    from big_data_computing__spark.operators.curation import (
        dsir_feature_buckets,
        dsir_importance,
    )
    from big_data_computing__spark.streaming.curation_stream import (
        DsirBucketState,
    )

    docs = read_table(spark, sf_dir, "documents")
    splits = [
        docs.where(F.col("doc_id") % 3 == i).localCheckpoint()
        for i in range(3)
    ]
    state = DsirBucketState()
    seen = None
    for i, part in enumerate(splits):
        state.update(part, batch_id=i)
        state.update(part, batch_id=i)  # replay: must be a no-op
        seen = part if seen is None else seen.unionByName(part)
        want = {
            int(r["bucket"]): [int(r["t"]), int(r["r"])]
            for r in dsir_feature_buckets(seen)
            .groupBy("bucket")
            .agg(
                F.sum(F.col("is_target").cast("long")).alias("t"),
                F.count("*").alias("r"),
            )
            .collect()
        }
        assert state.buckets == want, f"prefix {i}"

    got = {
        tuple(r)
        for r in state.score(seen)
        .select("doc_id", "n_feats", "imp_milli")
        .collect()
    }
    want = {
        tuple(r)
        for r in dsir_importance(seen)
        .select("doc_id", "n_feats", "imp_milli")
        .collect()
    }
    assert got == want


def test_dsir_stream_foreachbatch_end_to_end(spark, sf_dir, tmp_path):
    """The real Structured Streaming path: a file stream folds into
    DsirBucketState via foreachBatch; the final state matches the
    batch bucket table."""
    from big_data_computing__spark.operators.curation import (
        dsir_feature_buckets,
    )
    from big_data_computing__spark.streaming.curation_stream import (
        DsirBucketState,
        dsir_stream,
    )

    docs = read_table(spark, sf_dir, "documents")
    data = str(tmp_path / "dsir_docs")
    docs.repartition(4).write.parquet(data)

    state = DsirBucketState()
    stream = spark.readStream.schema(docs.schema).parquet(data)
    q = (
        dsir_stream(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_dsir"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        int(r["bucket"]): [int(r["t"]), int(r["r"])]
        for r in dsir_feature_buckets(docs)
        .groupBy("bucket")
        .agg(
            F.sum(F.col("is_target").cast("long")).alias("t"),
            F.count("*").alias("r"),
        )
        .collect()
    }
    assert state.buckets == want


def test_drift_state_prefix_parity_and_replay(spark, sf_dir):
    """Streaming drift monitor: after EVERY prefix of the stream the
    folded report equals batch corpus_drift_report over the arrived
    documents bit-for-bit; batch-id replays are no-ops."""
    from big_data_computing__spark.operators.curation import (
        corpus_drift_report,
    )
    from big_data_computing__spark.streaming.curation_stream import (
        DriftState,
    )

    docs = read_table(spark, sf_dir, "documents")
    splits = [
        docs.where(F.col("doc_id") % 3 == i).localCheckpoint()
        for i in range(3)
    ]
    state = DriftState()
    seen = None
    for i, part in enumerate(splits):
        state.update(part, batch_id=i)
        state.update(part, batch_id=i)  # replay: no-op
        seen = part if seen is None else seen.unionByName(part)
        want = sorted(
            tuple(r)
            for r in corpus_drift_report(seen).collect()
        )
        assert sorted(state.report()) == want, f"prefix {i}"


def test_ingest_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The composed ingest (gopher gate -> global LSH dedup gate ->
    drift monitor -> exactly-once table append) over three
    micro-batches. The acceptance contract is re-derived INDEPENDENTLY
    post-hoc: greedy in arrival order over batch minhash_lsh_pairs
    restricted to batch-gopher survivors — the pipeline's table must
    hold exactly that set, the drift state must equal the batch drift
    report over it, and replays must be no-ops."""
    from big_data_computing__spark.operators.curation import (
        corpus_drift_report,
        gopher_quality_report,
    )
    from big_data_computing__spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from big_data_computing__spark.streaming.ingest_pipeline import (
        IngestPipeline,
    )

    docs = read_table(spark, sf_dir, "documents")
    splits = [
        docs.where(F.col("doc_id") % 3 == i).localCheckpoint()
        for i in range(3)
    ]
    pipe = IngestPipeline(
        str(tmp_path / "corpus"), str(tmp_path / "sig_index")
    )
    accepted_per_batch = []
    for i, part in enumerate(splits):
        n = pipe.process(part, batch_id=i)
        accepted_per_batch.append(n)
        assert pipe.process(part, batch_id=i) == 0  # replay: no-op
    assert sum(accepted_per_batch) > 0

    # ---- independent re-derivation of the contract ----
    surv = {
        r["doc_id"]
        for r in gopher_quality_report(docs)
        .where(F.col("passes"))
        .collect()
    }
    arrival = {}  # doc_id -> (batch, doc_id)
    for i, part in enumerate(splits):
        for r in part.select("doc_id").collect():
            arrival[r["doc_id"]] = (i, r["doc_id"])
    # the contract's pair graph is the UNCAPPED band-collision graph
    # (module doc) — and the gate implements it exactly, so the
    # recompute disables the enumeration cap rather than matching one
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs.join(
                spark.createDataFrame(
                    [(d,) for d in surv], "doc_id long"
                ),
                "doc_id",
            ),
            max_bucket=None,
        ).collect()
    ]
    partners: dict = {}
    for a, b in pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)
    want = set()
    for d in sorted(surv, key=lambda d: arrival[d]):
        if not any(
            arrival[p] < arrival[d] for p in partners.get(d, ())
        ):
            want.add(d)

    got = {
        r["doc_id"] for r in pipe.table.read(spark).collect()
    }
    assert got == want
    assert len(got) == sum(accepted_per_batch)

    # drift state == batch drift over exactly the accepted corpus
    accepted_df = docs.join(
        spark.createDataFrame([(d,) for d in want], "doc_id long"),
        "doc_id",
    )
    assert sorted(pipe.drift.report()) == sorted(
        tuple(r) for r in corpus_drift_report(accepted_df).collect()
    )

    # table history: one create + one append per non-degenerate batch
    ops = [h["operation"] for h in pipe.table.history()]
    assert ops[0] == "create" and set(ops[1:]) <= {"append"}

    # ---- cross-RESTART replay (r10: the batchlog guard) ----
    # a fresh pipeline over the same dirs must skip every committed
    # batch outright — no sig re-append (which would self-match the
    # batch into accepted=0 and bloat the index), no table change
    import os

    n_idx = spark.read.parquet(str(tmp_path / "sig_index")).count()
    pipe2 = IngestPipeline(
        str(tmp_path / "corpus"), str(tmp_path / "sig_index")
    )
    for i, part in enumerate(splits):
        assert pipe2.process(part, batch_id=i) == 0
    assert (
        spark.read.parquet(str(tmp_path / "sig_index")).count()
        == n_idx
    )
    # the restarted pipeline keeps INGESTING: a genuinely new batch
    # (fresh doc ids above the corpus) flows through create-less
    # append with the probe running against the recovered index
    new_docs = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).localCheckpoint()
    n_new = pipe2.process(new_docs, batch_id=len(splits))
    # every new doc duplicates an indexed gate survivor's text, so
    # the cross probe must reject all gate survivors among them;
    # gate failures were never accepted either way
    assert n_new == 0
    assert (
        spark.read.parquet(str(tmp_path / "sig_index")).count()
        > n_idx
    )
    # the reopened table still holds exactly the committed corpus
    assert {
        r["doc_id"] for r in pipe2.table.read(spark).collect()
    } == want
    # half-commit debris: drop the new batch's _SUCCESS marker and
    # replay on another fresh pipeline -> pruned and rewritten, with
    # the same decision and no duplicate index rows
    n_idx2 = spark.read.parquet(str(tmp_path / "sig_index")).count()
    os.remove(
        str(
            tmp_path
            / "sig_index"
            / f"batch_id={len(splits)}"
            / "_SUCCESS"
        )
    )
    pipe3 = IngestPipeline(
        str(tmp_path / "corpus"), str(tmp_path / "sig_index")
    )
    assert pipe3.process(new_docs, batch_id=len(splits)) == 0
    assert (
        spark.read.parquet(str(tmp_path / "sig_index")).count()
        == n_idx2
    )
