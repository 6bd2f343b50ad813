"""Streaming event-time windowed aggregation with watermarks.

Extended surface (SURVEY.md §2.9 note): the reference has no event-time
windows or late-data handling — arrival order is the order. The engine
inherits both from Structured Streaming; this module pins the idiomatic
shape: timestamp column → withWatermark → window() groupBy → append-mode
sink, so late rows beyond the watermark are dropped and windows finalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts over a *streaming* events DataFrame.

    ``events`` must carry a real timestamp column (for the fixture's
    nanos-as-long ts, convert with ``nanos_to_timestamp`` first).
    Append-mode compatible: the watermark bounds state and finalizes
    windows ``watermark_delay`` after their end.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def nanos_to_timestamp(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Convert the fixture's nanos-since-epoch long into a proper
    timestamp column (microsecond precision)."""
    return df.withColumn(
        ts_col,
        F.timestamp_micros(F.expr(f"(`{ts_col}` div 1000)").cast("long")),
    )
