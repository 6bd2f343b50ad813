"""Vector (array<double>) expressions for similarity search.

Pure Catalyst higher-order functions; element-sequential sums keep float
results bit-deterministic across partitionings and matching the DuckDB
oracle's ``list_dot_product`` evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column) -> Column:
    """Cast array<float> (or any numeric array) to array<double>."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))
