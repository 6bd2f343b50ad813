"""Streaming ingest into the ZTable snapshot log.

``foreachBatch`` + the snapshot log's metadata give the table format's
exactly-once story: every micro-batch append records its ``batch_id``
in the snapshot it commits, and a batch whose id is already present in
the log is skipped. Structured Streaming's checkpoint already prevents
re-processing in steady state — the snapshot-side guard covers the case
it cannot: the sink half-completing before a crash (batch committed to
the table, offset not yet checkpointed → the engine REPLAYS the batch
on restart). This is exactly Delta Lake's ``txn`` (appId, version)
action, reduced to one writer stream per table.

Scale note: finding the last committed batch id reads snapshot JSONs
newest-first and stops at the first append that carries one, so steady
state reads one file; an object-store deployment would fold the id into
the same conditional-PUT commit the log already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.layout import ZTable


def last_committed_batch_id(table: ZTable) -> int | None:
    """Newest ``batch_id`` recorded in the snapshot log, or None."""
    for v in reversed(table.versions()):
        bid = table.snapshot(v).get("batch_id")
        if bid is not None:
            return int(bid)
    return None


def append_batch(
    table: ZTable, batch_df: DataFrame, batch_id: int, n_files: int = 2
) -> bool:
    """Idempotently append one micro-batch: returns True if committed,
    False if ``batch_id`` was already in the log (replayed batch).

    Micro-batch ids are monotonically increasing per query, so the
    guard only needs the newest recorded id — same contract Delta's
    idempotent writes use (``txn.version`` monotonicity)."""
    last = last_committed_batch_id(table)
    if last is not None and batch_id <= last:
        return False
    table.append(batch_df, n_files=n_files, extra_meta={"batch_id": batch_id})
    return True


def table_append_stream(
    src: DataFrame,
    table: ZTable,
    checkpoint_dir: str,
    n_files: int = 2,
):
    """Wire a streaming DataFrame into ``table``: returns the
    DataStreamWriter (caller picks the trigger and calls .start()).
    Each micro-batch becomes one snapshot-log append; replays are
    no-ops via :func:`append_batch`'s batch-id guard."""
    return (
        src.writeStream.foreachBatch(
            lambda df, bid: append_batch(table, df, bid, n_files)
        ).option("checkpointLocation", checkpoint_dir)
    )


def upsert_batch(
    table: ZTable, batch_df: DataFrame, batch_id: int, n_files: int = 2
) -> bool:
    """Idempotently MERGE one micro-batch (coordinate-keyed upsert —
    a streaming CDC apply): returns True if committed, False if
    ``batch_id`` was already in the log. Two idempotence layers: the
    batch-id guard (same as :func:`append_batch`) makes a replay a
    strict no-op, and even without it a replayed coordinate-keyed
    MERGE of the same batch is semantically idempotent (same keys →
    same replacement rows); the guard keeps the version history clean
    and the cost zero."""
    last = last_committed_batch_id(table)
    if last is not None and batch_id <= last:
        return False
    table.upsert(
        batch_df.sparkSession, batch_df, n_files=n_files,
        extra_meta={"batch_id": batch_id},
    )
    return True


def table_upsert_stream(
    src: DataFrame,
    table: ZTable,
    checkpoint_dir: str,
    n_files: int = 2,
):
    """Wire a streaming changefeed into ``table`` as MERGEs: each
    micro-batch's rows REPLACE existing rows at the same (x, y) and
    insert otherwise — the streaming upsert/CDC-apply pattern (Delta's
    foreachBatch-MERGE idiom). Returns the DataStreamWriter; caller
    picks the trigger and calls .start()."""
    return (
        src.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: upsert_batch(table, df, bid, n_files)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
