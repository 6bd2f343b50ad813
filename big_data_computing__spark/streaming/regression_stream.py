"""Streaming ridge-regression maintenance: the learned quality scorer
kept fit over an UNBOUNDED document stream, exactly.

The batch fit (`operators/regression.ridge_betas`) reduces the corpus
to 14 exact BIGINT normal-equation sums — and exact integer sums are
ADDITIVE, so the streaming twin is the engine's standard shape
(embed_stream.ScatterState sets the pattern): each micro-batch runs
the SAME distributed Gram aggregation over its own rows, the driver
folds the 14 numbers into running Python ints (:class:`GramState`,
arbitrary precision — no overflow at any stream length), and the
model is re-solved on demand by feeding the running totals back
through the batch operator's own in-plan Cramer expression
(`regression.betas_from_gram`). Sharing the solve is what makes the
contract bit-exact BY CONSTRUCTION: after any prefix of the stream,
state sums == batch Gram sums on the union of arrived rows (exact
integers), hence identical betas (tests/test_regression_stream.py).

This is online model refresh at stream speed: per micro-batch the
cluster reduces to ONE 14-column row, the driver adds 14 integers,
and "retraining" is an O(1) expression — the model is always exactly
the closed-form fit of everything seen so far, with no decay, no
approximation, and no replay drift.

Exactly-once: `update` is keyed by the micro-batch id and ignores
replays (the foreachBatch idempotence rule every sink here follows,
streaming/table_stream.py sets the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.regression import (
    GRAM_COLS,
    RIDGE_LAMBDA,
    betas_from_gram,
    gram_sums,
    quality_features,
)


class GramState:
    """Driver-side running normal-equation sums: one exact Python int
    per GRAM_COLS entry."""

    def __init__(self, lam: int = RIDGE_LAMBDA):
        self.lam = lam
        self.sums: dict[str, int] = {c: 0 for c in GRAM_COLS}
        self._seen: set[int] = set()

    def update(self, batch_docs: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch's Gram sums into the running state.
        Replays of an already-applied batch id are no-ops."""
        if batch_id in self._seen:
            return
        row = gram_sums(quality_features(batch_docs)).collect()[0]
        for c in GRAM_COLS:
            # an empty micro-batch aggregates SUM(...) to NULL with
            # COUNT 0 — contributes nothing
            self.sums[c] += int(row[c] or 0)
        self._seen.add(batch_id)

    def gram_df(self, spark: SparkSession) -> DataFrame:
        """The running totals as the 1-row Gram table the batch solve
        consumes."""
        return spark.createDataFrame(
            [tuple(self.sums[c] for c in GRAM_COLS)],
            ", ".join(f"{c} long" for c in GRAM_COLS),
        )

    def betas(self, spark: SparkSession) -> DataFrame:
        """DataFrame[det, b0..b3] — the batch operator's own Cramer
        solve applied to the running totals (unrounded, like
        regression._ridge_betas_df)."""
        return betas_from_gram(self.gram_df(spark), self.lam)


def ridge_stream(
    doc_stream: DataFrame,
    state: GramState,
    checkpoint: str,
):
    """Attach the running-fit sink to a streaming documents DataFrame;
    returns the started StreamingQuery."""
    return (
        doc_stream.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: state.update(df, bid))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
