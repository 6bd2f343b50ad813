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
