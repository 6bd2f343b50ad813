"""Text expressions: tokenization, shingles, n-grams — Catalyst-only.

Built for the `documents` table (whitespace-separated text). Every helper
has an exact DuckDB-SQL twin used by the correctness oracles, so the
semantics here are deliberately simple and portable: split on single
spaces, no locale-dependent behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty strings filtered out)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def _safe_range(k: Column) -> Column:
    """sequence(1, k), empty when k < 1 (Spark's sequence(1, 0) would
    otherwise produce a *descending* [1, 0])."""
    return F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (distinct not applied)."""
    toks = tokens(text)
    return F.transform(
        _safe_range(F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def char_shingles(text: Column, n: int) -> Column:
    """Array of character n-grams (shingles) of the raw text."""
    return F.transform(
        _safe_range(F.length(text) - F.lit(n - 1)),
        lambda i: F.substring(text, i, n),
    )


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), " +", " "))
