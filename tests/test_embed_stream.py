"""Streaming scatter maintenance: the running state must equal the
batch scatter on the union of arrived rows BIT-FOR-BIT after every
prefix is folded in (exact integer sums are additive), and replays
must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators.similarity import (
    embedding_scatter,
)
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.embed_stream import (
    ScatterState,
    scatter_stream,
)


def test_streaming_scatter_matches_batch_exactly(
    spark, sf_dir, tmp_path
):
    emb = read_table(spark, sf_dir, "embeddings")
    data = str(tmp_path / "emb")
    # several part files -> several micro-batches (maxFilesPerTrigger)
    emb.repartition(5).write.parquet(data)

    state = ScatterState(k=8)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data)
    )
    q = scatter_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert len(state._seen) >= 2, "fixture must split into batches"

    want = {
        (r["i"], r["j"]): (
            r["n_vecs"], r["s_i"], r["s_j"], r["s_ij"], r["cov"]
        )
        for r in embedding_scatter(emb, k=8).collect()
    }
    assert state.result() == want

    # replaying an already-seen batch id changes nothing (exactly-once)
    state.update(emb.limit(10), batch_id=next(iter(state._seen)))
    assert state.result() == want


def test_streaming_scatter_state_is_prefix_exact(spark, sf_dir):
    """Folding two halves manually equals the batch scatter of the
    whole — additivity of the exact sums, no stream machinery."""
    emb = read_table(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)
    state = ScatterState(k=4)
    state.update(first, 0)
    state.update(second, 1)
    want = {
        (r["i"], r["j"]): (
            r["n_vecs"], r["s_i"], r["s_j"], r["s_ij"], r["cov"]
        )
        for r in embedding_scatter(emb, k=4).collect()
    }
    assert state.result() == want


def test_streaming_drift_report_matches_batch_recomputation(
    spark, sf_dir
):
    """The per-batch covariance-drift series the streaming state emits
    must equal the series recomputed from scratch with the BATCH
    operator on every prefix — same covariances (the existing
    bit-parity contract), same drift arithmetic (covariance_drift on
    both sides)."""
    from big_data_computing__spark.streaming.embed_stream import (
        covariance_drift,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    thirds = [emb.where(F.col("vec_id") % 3 == i) for i in range(3)]

    state = ScatterState(k=4)
    for i, part in enumerate(thirds):
        state.update(part, i)
    got = state.drift_history
    assert [h["batch_id"] for h in got] == [0, 1, 2]
    assert got[0]["max_abs"] is None and got[0]["l2"] is None

    # batch recomputation over the prefixes
    prefix = thirds[0]
    prev_cov = None
    want = []
    for i in range(3):
        if i > 0:
            prefix = prefix.unionByName(thirds[i])
        cov = {
            (r["i"], r["j"]): r["cov"]
            for r in embedding_scatter(prefix, k=4).collect()
        }
        want.append(
            covariance_drift(prev_cov, cov) if prev_cov is not None
            else None
        )
        prev_cov = cov
    for i in (1, 2):
        assert got[i]["max_abs"] == want[i]["max_abs"]
        assert got[i]["l2"] == want[i]["l2"]
    assert got[2]["max_abs"] > 0.0  # the metric is alive, not a zero

    # replay leaves the drift history untouched (exactly-once)
    state.update(thirds[0], 0)
    assert state.drift_history == got
