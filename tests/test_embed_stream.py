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
