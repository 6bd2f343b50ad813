"""Helpers for reading Catalyst's physical plans programmatically.

The engine treats plan shape as part of an operator's contract:
predicates/pruning must reach the scan, small sides must broadcast,
top-K must be TakeOrderedAndProject. These helpers power the regression
tests (tests/test_plans.py) and the PLANS.md report generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The full `EXPLAIN FORMATTED` text for a DataFrame's plan."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """The (possibly adaptive) executed physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()
