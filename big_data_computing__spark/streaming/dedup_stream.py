"""Streaming deduplication: exact dedup over an unbounded document
stream.

The streaming face of operators/dedup.py's exact dedup: fingerprint each
arriving document (same md5-based hash60 as the batch operator) and drop
repeats with Spark's stateful ``dropDuplicates``. With a watermark the
dedup state is bounded to the late-data horizon — the standard shape for
continuous training-data ingestion; without one, state grows with the
distinct-fingerprint count (exact global dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.text import normalized


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """First-seen documents only (streaming): adds ``fingerprint`` and
    drops rows whose fingerprint was already observed.

    ``ts_col``: event-time column; when given, a watermark bounds the
    dedup state to ``watermark_delay`` (duplicates older than the
    watermark may re-emit — the documented trade for bounded state).
    """
    fp = docs.withColumn(
        "fingerprint", hash60(normalized(F.col(text_col)))
    )
    if ts_col is not None:
        fp = fp.withWatermark(ts_col, watermark_delay)
        return fp.dropDuplicates(["fingerprint", ts_col])
    return fp.dropDuplicates(["fingerprint"])
