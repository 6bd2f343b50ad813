"""Sinks. The reference only prints to driver stdout
(big_data_computing_1.py:109-114 etc.); the engine's canonical sink is
partitioned Parquet, plus a thin stdout report layer for parity with the
reference's printed output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink. ``partition_by`` produces hive-style directory
    partitioning — the layout that gives downstream readers partition
    pruning for free."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def show_report(df: DataFrame, title: str, n: int = 20) -> None:
    """Driver-stdout report (the reference's only output channel)."""
    print(f"== {title} ==")
    df.show(n, truncate=False)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (same contract as :func:`write_parquet`) — the second
    columnar format Spark writes natively; useful when downstream
    consumers are Hive/Trino-ecosystem ORC readers. Predicate pushdown
    and partition pruning work identically."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_json_lines(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """JSON-lines sink — the interchange format most training-data
    tooling ingests. Row-oriented: use for handoff, not for re-scan
    (no column pruning or pushdown on read)."""
    df.write.mode(mode).json(path)
