"""Streaming BM25 corpus-stats maintenance: prefix-parity of the
statistics, final-state scoring ≡ batch bm25_topk, replay idempotence,
and the real foreachBatch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators.retrieval import bm25_topk
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.retrieval_stream import (
    Bm25State,
    bm25_stream,
)

QUERY = ["spark", "join", "window"]


def _batch_stats(docs, terms):
    from big_data_computing__spark.functions.text import tokens

    toks = tokens(F.col("text"))
    row = docs.select(
        F.sum((F.size(toks) > 0).cast("long")).alias("n"),
        F.sum(F.size(toks)).alias("l"),
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"d{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    return (
        int(row["n"]),
        int(row["l"]),
        {t: int(row[f"d{i}"]) for i, t in enumerate(terms)},
    )


def test_bm25_state_prefix_parity_and_final_score(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    splits = [
        docs.where(F.col("doc_id") % 3 == i).localCheckpoint()
        for i in range(3)
    ]
    state = Bm25State(QUERY)
    seen = None
    for i, part in enumerate(splits):
        state.update(part, batch_id=i)
        state.update(part, batch_id=i)  # replay: no-op
        seen = part if seen is None else seen.unionByName(part)
        n, l_tot, df = _batch_stats(seen, QUERY)
        assert (state.n_docs, state.l_total, state.df) == (n, l_tot, df)

    got = {
        tuple(r)
        for r in state.score(seen)
        .select("doc_id", "n_hit_terms", "score_milli")
        .collect()
    }
    want = {
        tuple(r)
        for r in bm25_topk(seen, QUERY, k=10**9)
        .select("doc_id", "n_hit_terms", "score_milli")
        .collect()
    }
    assert got == want


def test_bm25_state_empty_docs_excluded_from_n(spark):
    rows = [(0, "spark join"), (1, ""), (2, "join")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = Bm25State(["spark", "join"])
    state.update(docs, batch_id=0)
    assert state.n_docs == 2  # the empty doc never enters N
    assert state.l_total == 3
    assert state.df == {"spark": 1, "join": 2}


def test_bm25_stream_foreachbatch_end_to_end(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    data = str(tmp_path / "bm25_docs")
    docs.repartition(4).write.parquet(data)
    state = Bm25State(QUERY)
    stream = spark.readStream.schema(docs.schema).parquet(data)
    q = (
        bm25_stream(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_bm25"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n, l_tot, df = _batch_stats(docs, QUERY)
    assert (state.n_docs, state.l_total, state.df) == (n, l_tot, df)
