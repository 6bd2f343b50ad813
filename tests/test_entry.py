"""Driver-contract smoke tests: entry() and queries()/oracle_sql() shape."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"sure_outliers", "uncertain_points"}


def test_queries_oracle_keys_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # r6 retired the LAST unoracled row: a14 is re-registered over the
    # corrected deterministic HLL (linear-counting small range), so
    # every registered query now carries a DuckDB value oracle
    unoracled = set(qs) - set(oracles)
    assert unoracled == set()


def test_all_queries_run_sf0001(spark, sf_dir):
    """Every callable returns a DataFrame with a stable schema at the
    smoke scale factor."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
