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
    # the documented non-SQL-expressible set is the only unoracled part
    # (r5 retired x_decode_features — computed byte-mean DuckDB twin —
    # and x_ann_ivf_rpq_prod — shares the parity twin's oracle after
    # the prod ≡ parity row-set pin)
    unoracled = set(qs) - set(oracles)
    assert unoracled == {
        # native HLL sketch registers are engine-internal by design;
        # the oracled t10/t12 twins cover the deterministic variant
        "a14_approx_distinct",
    }


def test_all_queries_run_sf0001(spark, sf_dir):
    """Every callable returns a DataFrame with a stable schema at the
    smoke scale factor."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
