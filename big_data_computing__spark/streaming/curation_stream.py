"""Streaming corpus curation: per-row curation stages applied to an
unbounded document stream.

The streaming face of operators/curation.py's stateless stages. PII
redaction and quality gating are pure per-row expressions, so the SAME
Column expressions the batch operators use run unchanged under
Structured Streaming — no state, no watermark needed, and batch ≡
streaming bit-for-bit by construction (asserted by replay in
tests/test_curation_stream.py). A filtering ingest pipeline composes
them ahead of the stateful stages (streaming dedup, windowed aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import _PII_ORDER
from ..operators.textstats import quality_score_expr


def redact_pii_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming PII redaction: identical expression to
    operators.curation.redact_pii (typed placeholder tags, dependency
    order), valid on a streaming DataFrame because it is a stateless
    per-row map."""
    out = F.col(text_col)
    for pat, tag in _PII_ORDER:
        out = F.regexp_replace(out, pat, tag)
    return docs.withColumn(text_col, out)


def quality_gate_stream(
    docs: DataFrame,
    min_quality: float = 0.45,
    text_col: str = "text",
) -> DataFrame:
    """Streaming quality filter: keep documents whose heuristic quality
    score clears ``min_quality``; adds ``quality_score``. The score is
    the batch operator's exact expression (textstats.quality_score_expr
    — shared code, not a copy), stateless and shuffle-free."""
    return docs.withColumn(
        "quality_score", quality_score_expr(text_col)
    ).where(F.col("quality_score") >= F.lit(min_quality))
