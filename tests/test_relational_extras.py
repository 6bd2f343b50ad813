"""Pivot and ntile operators (operators/relational.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators.relational import (
    ntile_quartiles,
    pivot_event_values,
)

US_DAY = 86_400_000_000  # long ts = micros-since-epoch (engine unit)


def test_pivot_event_values_hand_computed(spark):
    rows = [
        # day 0: two clicks, one view
        (1, 0 * US_DAY + 1000, 7, "click", 1.5, "{}"),
        (2, 0 * US_DAY + 2000, 7, "click", 2.25, "{}"),
        (3, 0 * US_DAY + 3000, 8, "view", 1.0, "{}"),
        # day 2: one purchase; no clicks -> null cell
        (4, 2 * US_DAY + 1000, 9, "purchase", 10.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.day_idx: r for r in pivot_event_values(ev).collect()}
    assert set(out) == {0, 2}
    assert out[0].click == 3.75
    assert out[0].view == 1.0
    assert out[0].purchase is None
    assert out[2].purchase == 10.0
    assert out[2].click is None


def test_ntile_quartiles_exact_buckets(spark):
    # 8 orders in one priority: quartiles of 2 by price
    rows = [
        (i, 100 + i, "O", float(10 * i), "2024-01-01", "1-URGENT")
        for i in range(1, 9)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    out = {
        r.quartile: r for r in ntile_quartiles(orders, n=4).collect()
    }
    assert [out[q].n_orders for q in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert out[1].min_price == 10.0 and out[1].max_price == 20.0
    assert out[4].min_price == 70.0 and out[4].max_price == 80.0


def test_ntile_is_deterministic_on_ties(spark):
    # identical prices: tie-break by o_orderkey makes assignment stable
    rows = [
        (i, 1, "O", 50.0, "2024-01-01", "1-URGENT") for i in range(1, 9)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    a = sorted(map(tuple, ntile_quartiles(orders, n=4).collect()))
    b = sorted(map(tuple, ntile_quartiles(orders, n=4).collect()))
    assert a == b
    assert [r[2] for r in a] == [2, 2, 2, 2]


def test_global_rank_matches_sorted_position(spark, sf_dir):
    """global_rank (range partitions + offset cumsum) must equal the
    position in the globally sorted order, for several partition
    counts including ones that force uneven splits."""
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.relational import global_rank
    from big_data_computing__spark.sources.readers import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    want = [
        r["c_custkey"]
        for r in cust.orderBy("c_acctbal", "c_custkey").collect()
    ]
    for nparts in (1, 7, 32):
        got = {
            r["rank"]: r["c_custkey"]
            for r in global_rank(
                cust, "c_acctbal", "c_custkey", n_partitions=nparts
            ).collect()
        }
        assert len(got) == len(want)
        assert [got[i + 1] for i in range(len(want))] == want, nparts


def test_global_dense_rank_matches_distinct_rank_join(spark):
    """global_dense_rank ≡ the distinct → global_rank → join-back
    composition it replaces, on data with heavy duplicate keys across
    range-partition boundaries."""
    from big_data_computing__spark.operators.relational import (
        global_dense_rank,
        global_rank,
    )

    rows = [(i % 7, (i * 3) % 5, i) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long, id long")
    via_join = {
        (r["a"], r["b"]): r["r"]
        for r in df.select("a", "b")
        .distinct()
        .transform(lambda d: global_rank(d, "a", "b", rank_col="r"))
        .collect()
    }
    got = {
        (r["id"]): (r["a"], r["b"], r["rank"])
        for r in global_dense_rank(df, "a", "b").collect()
    }
    assert len(got) == 500
    for _id, (a, b, rk) in got.items():
        assert rk == via_join[(a, b)], (_id, a, b)


def test_key_skew_report_hand_fixture(spark):
    from big_data_computing__spark.operators.relational import (
        key_skew_report,
    )

    # 100 rows: key 'a' 60, 'b' 30, eight singletons — total=98? no:
    # 60+30+8 = 98 rows, 10 keys
    rows = (
        [("a",)] * 60 + [("b",)] * 30 + [(c,) for c in "cdefghij"]
    )
    df = spark.createDataFrame(rows, ["k"])
    got = {r["key"]: r for r in key_skew_report(df, "k", n=3).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a["rk"], a["cnt"]) == (1, 60)
    assert a["share_milli"] == 1000 * 60 // 98
    assert a["x_mean_milli"] == 1000 * 60 * 10 // 98  # ~6.1x the mean
    assert a["cum_share_milli"] == 1000 * 60 // 98
    b = got["b"]
    assert b["cum_share_milli"] == 1000 * 90 // 98
    c = got["c"]
    assert (c["rk"], c["cnt"]) == (3, 1)


def test_global_bucket_rank_equals_sql_rank(spark, sf_dir):
    """global_bucket_rank == SQL RANK() (competition rank: ties share,
    gaps after groups) under the two-pass idiom, pinned against the
    single-partition window form on a column with heavy ties."""
    from pyspark.sql import Window

    from big_data_computing__spark.operators.relational import (
        global_bucket_rank,
    )
    from big_data_computing__spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["rk"]
        for r in global_bucket_rank(
            li, "l_quantity", rank_col="rk"
        ).collect()
    }
    w = Window.orderBy("l_quantity")
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["rk"]
        for r in li.select(
            "l_orderkey", "l_linenumber", F.rank().over(w).alias("rk")
        ).collect()
    }
    assert got == want


def test_bloom_semi_join_identity_selectivity_and_plan(spark, sf_dir):
    """The runtime Bloom pre-filter must (1) never change the result
    vs the plain semi join, (2) actually drop the large majority of
    non-matching fact rows before the shuffle (measured fp-rate bound
    at the default sizing), and (3) evaluate as a pure codegen filter
    — no Python in the plan."""
    from collections import Counter

    from big_data_computing__spark.operators.relational import (
        bloom_semi_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact = li.withColumnRenamed("l_orderkey", "o_orderkey")
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 450000
    )

    out = bloom_semi_join(fact, dim, "o_orderkey")
    plain = fact.join(
        dim.select("o_orderkey").distinct(), "o_orderkey", "semi"
    )

    def ms(df):
        return Counter(
            (r["o_orderkey"], r["l_linenumber"]) for r in
            df.select("o_orderkey", "l_linenumber").collect()
        )

    assert ms(out) == ms(plain)

    # survivor measurement: rebuild just the pre-filter by running the
    # operator against an empty-ish final join — instead, probe the
    # physical plan: the filter must sit on the fact side and contain
    # the xxhash64 probes, and nothing Python-evaluated exists
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

    # false-positive rate at the default sizing: survivors of the
    # bloom ALONE must be the true matches plus a tiny fp tail
    from big_data_computing__spark.operators.relational import (
        bloom_member_pred,
    )

    pred = bloom_member_pred(dim, "o_orderkey")
    n_fact = fact.count()
    n_true = plain.count()
    n_bloom = fact.where(pred).count()
    assert n_true < n_fact // 5, "fixture must keep the filter selective"
    assert n_true <= n_bloom, "bloom must never drop a true member"
    fp = (n_bloom - n_true) / max(1, n_fact - n_true)
    assert fp < 0.01, (n_bloom, n_true, n_fact, fp)


def test_global_kth_value_exact_on_hand_data(spark):
    """Quickselect equals sorted()[k-1] for every k on a fixture with
    duplicates, negatives, and a wide gap (multi-round narrowing)."""
    from big_data_computing__spark.operators.relational import (
        global_kth_value,
    )

    vals = [5, -3, 7, 7, 7, 0, 1_000_000, -3, 42, 9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ordered = sorted(vals)
    for k in (1, 2, 5, 6, len(vals)):
        got, rounds = global_kth_value(df, "v", k)
        assert got == ordered[k - 1], (k, got, rounds)
        assert rounds >= 1
    import pytest

    with pytest.raises(ValueError):
        global_kth_value(df, "v", 0)
    with pytest.raises(ValueError):
        global_kth_value(df, "v", len(vals) + 1)


def test_exact_median_quickselect_matches_order_statistic(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.relational import (
        exact_median_quickselect,
    )
    from big_data_computing__spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    got = exact_median_quickselect(li, "c").collect()[0]
    vals = sorted(r["c"] for r in li.collect())
    k = (len(vals) + 1) // 2
    assert got["n_rows"] == len(vals)
    assert got["k"] == k
    assert got["median"] == vals[k - 1]


def test_global_weighted_kth_hand_data(spark):
    """Weighted quickselect equals the brute cumulative-weight scan
    for every k; rejects non-positive weights and out-of-range k."""
    import pytest

    from big_data_computing__spark.operators.relational import (
        global_weighted_kth,
    )

    rows = [(5, 3), (-2, 1), (9, 4), (5, 2), (100, 1)]
    df = spark.createDataFrame(rows, "v long, w long")
    expanded = sorted(
        v for v, w in rows for _ in range(w)
    )  # total weight 11
    for k in (1, 3, 4, 6, 10, 11):
        got, _ = global_weighted_kth(df, "v", "w", k)
        assert got == expanded[k - 1], (k, got)
    with pytest.raises(ValueError, match="outside"):
        global_weighted_kth(df, "v", "w", 12)
    bad = spark.createDataFrame([(1, 0)], "v long, w long")
    with pytest.raises(ValueError, match="positive"):
        global_weighted_kth(bad, "v", "w", 1)
