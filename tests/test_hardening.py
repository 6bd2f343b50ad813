"""Round-8 hardening regressions: SQL literal escaping, chi2 NULL
contract, streaming-state numeric-key contract, pre-1970 day floors."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.functions.sqlsafe import sql_str
from big_data_computing__spark.operators.stats import (
    chi2_independence,
    chi2_independence_sql,
    ks_drift_sql,
)
from big_data_computing__spark.operators.windows import (
    _floor_div_sql,
    event_day,
)
from big_data_computing__spark.streaming.frequent_stream import (
    AucState,
    KSDriftState,
)


def test_sql_str_escapes_quotes():
    assert sql_str("plain") == "'plain'"
    assert sql_str("o'brien") == "'o''brien'"
    assert sql_str("''") == "''''''"


def test_quoted_label_sql_parses_in_duckdb():
    """A base value containing a quote must yield well-formed SQL in
    the generated twins (previously broke the parser or worse)."""
    sql = ks_drift_sql(
        "SELECT * FROM (VALUES (1.0, 'o''brien'), (2.0, 'x'), "
        "(3.0, 'o''brien'), (4.0, 'x')) t(v, s)",
        "v",
        "s",
        "o'brien",
    )
    row = duckdb.connect().execute(sql).fetchone()
    assert row[0] == 2 and row[1] == 2  # n_base, n_comp


def test_chi2_null_categories_excluded(spark):
    """NULL category rows are excluded at entry in BOTH engines — a
    NULL key can't match the margins cross-product equi-join, so an
    unfiltered NULL would inflate chi2 (ADVICE r7)."""
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
            (None, "x"), ("a", None)]
    df = spark.createDataFrame(rows, "ca string, cb string")
    got = chi2_independence(df, "ca", "cb").collect()[0]
    assert got["n"] == 4  # the two NULL rows dropped
    clean = spark.createDataFrame(rows[:4], "ca string, cb string")
    want = chi2_independence(clean, "ca", "cb").collect()[0]
    assert tuple(got) == tuple(want)

    sql = chi2_independence_sql(
        "SELECT * FROM (VALUES ('a','x'), ('a','y'), ('b','x'), "
        "('b','y'), (NULL,'x'), ('a',NULL)) t(ca, cb)",
        "ca",
        "cb",
    )
    orow = duckdb.connect().execute(sql).fetchone()
    assert tuple(got) == tuple(orow)


def test_state_rejects_decimal_scores(spark):
    """Decimal (or string) keyed columns would collapse/reorder
    distinct keys through the float() fold — rejected loudly."""
    dec = spark.range(4).select(
        F.col("id").cast("decimal(38,18)").alias("score"),
        (F.col("id") % 2 == 0).alias("passes"),
        F.col("id").cast("double").alias("value"),
        F.lit("purchase").alias("event_type"),
    )
    with pytest.raises(TypeError, match="float-"):
        AucState("score", "passes").update(dec, 0)
    with pytest.raises(TypeError, match="float-"):
        KSDriftState("score", "event_type", "purchase").update(dec, 0)
    # numeric columns still fold fine
    st = AucState("value", "passes")
    st.update(dec, 0)
    assert sum(p + n for p, n in st.counts.values()) == 4


def test_event_day_floors_pre_epoch(spark):
    """Day index uses FLOOR division for all sign ranges (the double
    division truncated toward zero, diverging pre-1970)."""
    df = spark.createDataFrame(
        [(-1,), (0,), (-86_400_000_000,), (-86_400_000_001,),
         (86_400_000_000,)],
        "ts long",
    )
    got = [r[0] for r in df.select(event_day(df, "ts")).collect()]
    assert got == [-1, 0, -1, -2, 1]
    # DuckDB's raw integer // TRUNCATES toward zero (probed: -1 // d
    # = 0), so the SQL twins use the pmod-subtracted floor helper —
    # assert the two engines' conventions agree through it.
    expr = _floor_div_sql("us", 86_400_000_000)
    want = duckdb.connect().execute(
        f"SELECT {expr} FROM (VALUES (-1), (0), "
        "(-86400000000), (-86400000001), (86400000000)) t(us) "
    ).fetchall()
    assert got == [w[0] for w in want]


# ---------------------------------------------------------------------------
# join_strategy_from_stats / join_analyzed (relational.py, r8)
# ---------------------------------------------------------------------------


def _mk_table(spark, df, path, key):
    from big_data_computing__spark.sources import layout as L

    t = L.ZTable.create(
        df.withColumn("x", F.col(key).cast("double"))
        .withColumn("y", F.lit(0.0)),
        str(path),
        n_files=4,
    )
    return t


def test_join_gate_three_regimes(spark, tmp_path):
    """The stats gate picks broadcast for a manifest-small build side,
    salted for a histogram-skewed probe side, plain otherwise — all at
    zero data read — and every strategy returns identical rows."""
    from big_data_computing__spark.operators.relational import (
        join_analyzed,
        join_strategy_from_stats,
    )

    n = 20_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit(0))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    uniform = spark.range(n).select(
        (F.col("id") % 100).cast("long").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"),
    )
    t_skew = _mk_table(spark, skewed, tmp_path / "skew", "k")
    t_unif = _mk_table(spark, uniform, tmp_path / "unif", "k")
    t_dim = _mk_table(spark, dim, tmp_path / "dim", "k")
    t_skew.analyze_histograms(spark, ["k"], bins=8)
    t_unif.analyze_histograms(spark, ["k"], bins=8)

    # tiny build side -> broadcast regardless of probe shape
    d = join_strategy_from_stats(t_skew.snapshot(), t_dim.snapshot(), "k")
    assert d["strategy"] == "broadcast" and d["small_rows"] == 100

    # big build side + skewed probe -> salted (the volume floor
    # scaled to the fixture: a skewed RATIO only straggles when the
    # hot volume is absolutely large — A/B-calibrated default 30M)
    d = join_strategy_from_stats(
        t_skew.snapshot(), t_unif.snapshot(), "k",
        broadcast_max_rows=10, salt_min_hot_rows=10_000,
    )
    assert d["strategy"] == "salted"
    assert d["skew_factor"] >= 4.0  # 80% of rows in one bin of 8
    assert d["hot_bin_rows"] >= 10_000

    # same skew ratio under the volume floor -> plain (AQE-trusting)
    d = join_strategy_from_stats(
        t_skew.snapshot(), t_unif.snapshot(), "k", broadcast_max_rows=10
    )
    assert d["strategy"] == "plain"

    # big build side + uniform probe -> plain
    d = join_strategy_from_stats(
        t_unif.snapshot(), t_skew.snapshot(), "k", broadcast_max_rows=10
    )
    assert d["strategy"] == "plain"
    assert d["skew_factor"] < 4.0

    # missing histograms raise instead of silently guessing
    import pytest as _pytest

    with _pytest.raises(ValueError, match="analyze_histograms"):
        join_strategy_from_stats(
            t_dim.snapshot(), t_unif.snapshot(), "k", broadcast_max_rows=10
        )

    # executed results are identical across all three strategies
    want = sorted(
        map(
            tuple,
            t_skew.read(spark)
            .join(t_dim.read(spark), "k")
            .select("k", "v", "name")
            .collect(),
        )
    )
    for kwargs in (
        {},  # broadcast
        {"broadcast_max_rows": 10, "salt_min_hot_rows": 10_000},  # salted
        {"broadcast_max_rows": 10, "skew_factor_threshold": 99.0},  # plain
    ):
        dec, df = join_analyzed(spark, t_skew, t_dim, "k", **kwargs)
        got = sorted(map(tuple, df.select("k", "v", "name").collect()))
        assert got == want, dec
