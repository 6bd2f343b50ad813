"""Streaming ridge maintenance: the running 14-sum state must equal
the batch Gram sums on the union of arrived rows EXACTLY after every
prefix (integer additivity), the re-solved betas must be bit-identical
to the batch fit (shared in-plan Cramer solve), and replays must be
idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators import regression as rg
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.regression_stream import (
    GramState,
    ridge_stream,
)


def _batch_gram(docs) -> dict[str, int]:
    row = rg.gram_sums(rg.quality_features(docs)).collect()[0]
    return {c: int(row[c]) for c in rg.GRAM_COLS}


def test_streaming_fit_matches_batch_exactly(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    data = str(tmp_path / "docs")
    # several part files -> several micro-batches (maxFilesPerTrigger)
    docs.repartition(5).write.parquet(data)

    state = GramState()
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data)
    )
    q = ridge_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert len(state._seen) >= 2, "fixture must split into batches"

    assert state.sums == _batch_gram(docs)
    # identical Gram ints through the SHARED solve -> identical betas,
    # down to the last bit of the doubles
    got = state.betas(spark).collect()[0]
    want = rg._ridge_betas_df(rg.quality_features(docs)).collect()[0]
    assert got.asDict() == want.asDict()

    # replaying an already-seen batch id changes nothing (exactly-once)
    before = dict(state.sums)
    state.update(docs.limit(10), batch_id=next(iter(state._seen)))
    assert state.sums == before


def test_streaming_state_is_prefix_exact(spark, sf_dir):
    """Folding halves manually equals the batch sums of each prefix —
    additivity, no stream machinery; and the model after prefix 1 is
    the batch fit OF prefix 1 (online refresh semantics)."""
    docs = read_table(spark, sf_dir, "documents")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)

    state = GramState()
    state.update(first, 0)
    assert state.sums == _batch_gram(first)
    got1 = state.betas(spark).collect()[0]
    want1 = rg._ridge_betas_df(rg.quality_features(first)).collect()[0]
    assert got1.asDict() == want1.asDict()

    state.update(second, 1)
    assert state.sums == _batch_gram(docs)


def test_empty_batch_is_a_noop(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    state = GramState()
    state.update(docs, 0)
    before = dict(state.sums)
    state.update(docs.where(F.lit(False)), 1)
    assert state.sums == before
    assert state._seen == {0, 1}
