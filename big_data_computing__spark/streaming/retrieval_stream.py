"""Streaming retrieval: exact incremental maintenance of BM25's corpus
statistics over an unbounded document stream.

BM25's corpus state is three additive integers — N (docs), L (total
tokens) — plus one per-query-term document frequency, so the streaming
twin is exact by construction (the ScatterState/DsirBucketState
pattern): each micro-batch contributes its own counts (≤ |query| + 2
numbers to the driver), and after any prefix the folded state equals
the batch statistics over the arrived documents bit-for-bit. Scoring
uses the batch operator's score expression VERBATIM
(`retrieval.BM25_SCORE_EXPR`), so final-state scoring reproduces batch
``bm25_topk`` exactly (asserted in tests/test_retrieval_stream.py).

The assumption that makes df additive — each document arrives ONCE —
is the same new-docs-only stream contract the dedup/curation ingest
twins document; replays are handled by the batch-id idempotence guard.

This is the index-maintenance half of a live search deployment: the
stats a ranker needs are kept exact and O(|query terms|) on the
driver, while postings themselves stay wherever the corpus lives
(here: the accumulated table; at scale: the inverted index the
conjunctive/phrase operators emulate declaratively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.retrieval import BM25_SCORE_EXPR


class Bm25State:
    """Driver-side running BM25 corpus statistics for a fixed query:
    N, L as exact Python ints plus df per query term."""

    def __init__(self, query_terms: list[str], text_col: str = "text"):
        self.query_terms = list(query_terms)
        self.text_col = text_col
        self.n_docs = 0
        self.l_total = 0
        self.df: dict[str, int] = {t: 0 for t in self.query_terms}
        self._seen: set[int] = set()

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:
            return
        self._seen.add(batch_id)
        toks = tokens(F.col(self.text_col))
        # N counts docs with >= 1 token — the batch operator's N (its
        # dl table is built from the explode, so empty docs never
        # enter the statistics)
        agg = batch_df.select(
            F.sum((F.size(toks) > 0).cast("long")).cast("long").alias("n"),
            F.sum(F.size(toks)).cast("long").alias("l"),
            *[
                F.sum(
                    F.array_contains(toks, t).cast("long")
                ).cast("long").alias(f"df_{i}")
                for i, t in enumerate(self.query_terms)
            ],
        ).collect()[0]
        self.n_docs += int(agg["n"])
        self.l_total += int(agg["l"] or 0)
        for i, t in enumerate(self.query_terms):
            self.df[t] += int(agg[f"df_{i}"] or 0)

    def score(self, docs: DataFrame) -> DataFrame:
        """DataFrame[doc_id, n_hit_terms, score_milli] of ``docs``
        under the current corpus statistics — the batch operator's
        exact integer expression over state-supplied (n_docs, l_total,
        df). Terms unseen so far score through df=0 (the idf floor
        handles it). Raises if no documents have arrived."""
        if self.n_docs == 0 or self.l_total == 0:
            raise ValueError("Bm25State.score: no documents arrived yet")
        spark = docs.sparkSession
        df_tbl = spark.createDataFrame(
            [(t, self.df[t]) for t in self.query_terms],
            "term string, df long",
        )
        toks = tokens(F.col(self.text_col))
        base = docs.select(
            "doc_id", F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        ).where(F.col("term").isin(self.query_terms))
        tf = base.groupBy("doc_id", "term", "dl").agg(
            F.count("*").cast("long").alias("tf")
        )
        return (
            tf.join(F.broadcast(df_tbl), "term")
            .withColumn("n_docs", F.lit(self.n_docs).cast("long"))
            .withColumn("l_total", F.lit(self.l_total).cast("long"))
            .select("doc_id", F.expr(BM25_SCORE_EXPR).alias("s_milli"))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("int").alias("n_hit_terms"),
                F.sum("s_milli").cast("long").alias("score_milli"),
            )
        )


def bm25_stream(docs_stream: DataFrame, state: Bm25State):
    """Attach exact BM25 corpus-stats maintenance to a document
    stream (foreachBatch fold, replay-idempotent)."""
    return docs_stream.writeStream.foreachBatch(
        lambda df, bid: state.update(df, bid)
    )
