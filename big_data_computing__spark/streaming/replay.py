"""Deterministic micro-batch replay for driver-held streaming states.

The engine's mergeable states (AucState, HtState, GiniState,
EwmaState, KSDriftState, CvmDriftState, ...) are driven in production
by ``writeStream.foreachBatch(state.update)`` — the sink calls
``state.update(batch_df, batch_id)`` once per trigger.
:func:`replay_batches` invokes that EXACT callable over a
deterministic partition of a batch fixture into micro-batches, so the
final ``estimate()`` report is the stream-end answer a foreachBatch
run over the same rows produces (the real-streaming machinery
equivalence — availableNow parquet source, checkpoints, replays — is
pinned separately by the suite's bit-parity tests, e.g.
tests/test_streaming.py::test_kmv_state_stream_parity_and_replay).

This gives every streaming state a driver-hash-checkable oracle row:
stream-end report ≡ the batch operator's SQL twin, verified by the
driver's DuckDB compare rather than only by pytest (VERDICT r7 item
#5). The split is value-deterministic (pmod over a stable key), so
the replay is reproducible across engines, sessions, and partition
layouts; batch contents differ from any real trigger's arrival order,
which is the point — the states are order-independent by design
(additive counts), and the oracle proves it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def replay_batches(
    df: DataFrame,
    state,
    key: Column,
    n_batches: int = 4,
) -> None:
    """Fold ``df`` through ``state.update`` in ``n_batches``
    deterministic micro-batches (batch i = rows where
    ``pmod(key, n_batches) == i``), exactly as a
    ``foreachBatch(state.update)`` sink would per trigger. Mutates
    ``state``; callers then read ``state.estimate()``.

    Scale: each update() call runs one cluster-side aggregation over
    its slice and collects only the state-sized delta (the states'
    documented contract) — the replay never gathers raw rows.

    NULL keys land deterministically in batch 0 (``pmod(NULL, n)`` is
    NULL and would match NO bucket, silently dropping the row from
    every update — the replay must be a true partition of ``df``).
    """
    bucket = F.coalesce(
        F.pmod(key.cast("long"), F.lit(n_batches)), F.lit(0)
    )
    tagged = df.withColumn("_replay_b", bucket)
    for i in range(n_batches):
        state.update(
            tagged.where(F.col("_replay_b") == i).drop("_replay_b"), i
        )
