"""Bucketed-table support: co-located joins without shuffles.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈ orders)
is shuffling both sides on the key. Writing both tables bucketed on that
key with the same bucket count lets Spark plan a SortMergeJoin with NO
Exchange on either side — each bucket pair joins locally. This module
wraps the write/read contract; `tests/test_bucketing.py` asserts the
shuffle-free plan.

Local note: bucketing requires `saveAsTable` (bucket metadata lives in
the session catalog); plain `.parquet(path)` writes lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table.

    Sorted buckets additionally remove the per-task Sort from the
    merge join.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans this with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), key)
