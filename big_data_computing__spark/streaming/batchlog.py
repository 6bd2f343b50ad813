"""Per-batch-partition parquet logs with directory-listing commit
detection — the durable replay guard shared by the disk-backed
streaming index states (LshIndexState, KnnIndexState).

Layout: one ``batch_id=N`` partition directory per micro-batch, so
``spark.read.parquet(root)`` recovers ``batch_id`` as a partition
column (readers that hide it re-select their documented columns).
Commit marker: the ``_SUCCESS`` file FileOutputCommitter drops at
job-commit COMPLETION — part files without it are crash debris (a
crash mid-job-commit can leave a visible partial file set, which a
row-level batch_id scan would misread as "committed"; the marker
cannot). Idempotence: a batch writes its partition with
``mode=overwrite`` (delete-then-write), so replaying an uncommitted
batch repairs it in place, never duplicates it.

Guard cost: ONE driver-side directory listing per log per process
lifetime — zero data read, independent of stream length (ADVICE r9:
the previous distinct-over-the-log scan on every batch made the guard
itself grow with the pair log).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame

_PART = re.compile(r"batch_id=(\d+)")


def committed_batch_ids(path: str) -> set[int]:
    """Batch ids with a COMPLETE commit under ``path`` (empty set for
    a not-yet-created log): partition dir present AND `_SUCCESS`
    marker present."""
    if not os.path.isdir(path):
        return set()
    out = set()
    for d in os.listdir(path):
        m = _PART.fullmatch(d)
        if m and os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.add(int(m.group(1)))
    return out


def prune_uncommitted(path: str) -> list[int]:
    """Delete partition dirs lacking the commit marker (crash debris
    from an interrupted write) so readers of the log never see a
    partial batch's rows; returns the pruned ids. Safe by
    construction: the marker is written last, so a marker-less dir is
    never a completed batch."""
    if not os.path.isdir(path):
        return []
    pruned = []
    for d in os.listdir(path):
        m = _PART.fullmatch(d)
        if m and not os.path.exists(
            os.path.join(path, d, "_SUCCESS")
        ):
            shutil.rmtree(os.path.join(path, d))
            pruned.append(int(m.group(1)))
    return pruned


def write_batch_partition(
    df: DataFrame, path: str, batch_id: int
) -> None:
    """(Re)write one batch's partition dir — overwrite =
    delete-then-write, the idempotent append."""
    df.write.mode("overwrite").parquet(
        os.path.join(path, f"batch_id={batch_id}")
    )
