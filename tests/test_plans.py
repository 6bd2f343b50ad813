"""Plan-quality regression tests: lock in the physical-plan properties
the engine is designed around (pushdown, broadcast joins, top-K heaps).
A refactor that silently degrades a plan (e.g. loses a broadcast and
falls back to SortMergeJoin) fails here, not in production."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_computing__spark.operators import relational as R
from big_data_computing__spark.plans import executed_plan
from big_data_computing__spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_no_bad_joins_in_headline_plans(spark):
    qs = entrymod.queries()
    for name in [
        "a2_pricing_summary",
        "j2_star_join_revenue",
        "c7_approx_outliers_summary",
        "c6_exact_outliers",
        "o2_smallest_cells_topk",
        "x_dedup_minhash_lsh",
        "w2_tumbling_window_counts",
    ]:
        plan = executed_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_filter_pushdown_reaches_scan(spark):
    li = read_table(spark, SF, "lineitem")
    df = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    plan = executed_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark):
    li = read_table(spark, SF, "lineitem")
    df = li.groupBy("l_returnflag").count()
    plan = executed_plan(df)
    assert "ReadSchema: struct<l_returnflag:string>" in plan


def test_topk_uses_take_ordered(spark):
    orders = read_table(spark, SF, "orders")
    df = R.top_k(
        orders.select("o_orderkey", "o_totalprice"),
        5,
        F.desc("o_totalprice"),
        F.asc("o_orderkey"),
    )
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_star_join_all_broadcast(spark):
    fact = read_table(spark, SF, "orders")
    cust = read_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = R.star_join(fact, [(cust, "o_custkey")])
    plan = executed_plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_agg_matches_plain(spark):
    events = read_table(spark, SF, "events")
    plain = {
        (r["event_type"],): (r["sum_value"], r["count_value"])
        for r in events.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("value").alias("count_value"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["sum_value"], r["count_value"])
        for r in R.salted_agg(
            events, ["event_type"], {"value": "sum"}, salt=8
        )
        .join(
            R.salted_agg(events, ["event_type"], {"value": "count"}, salt=8)
            .withColumnRenamed("count_value", "count_value"),
            "event_type",
        )
        .collect()
    }
    assert set(plain) == set(salted)
    for key in plain:
        assert abs(plain[key][0] - salted[key][0]) < 1e-6
        assert plain[key][1] == salted[key][1]


def test_approx_count_distinct_accuracy(spark):
    events = read_table(spark, "/root/testdata/sf0.01", "events")
    approx = events.agg(
        F.approx_count_distinct("user_id").alias("a")
    ).collect()[0]["a"]
    exact = events.select("user_id").distinct().count()
    assert abs(approx - exact) / exact < 0.05


def test_hll_linear_counting_ln_cross_engine(spark):
    """The m·ln(m/V) linear-counting correction has exactly m=256
    possible inputs (V is an integer register deficit in [1, m]).
    Check every one: Spark's Java Math.log and DuckDB's libm log must
    agree at the reported 3 dp — this is what licenses
    hll_estimate_corrected's value oracle (a14)."""
    import duckdb

    m = 256
    got = {
        r["v"]: r["e"]
        for r in spark.range(1, m + 1)
        .select(
            F.col("id").alias("v"),
            F.round(
                F.lit(float(m))
                * F.log(F.lit(float(m)) / F.col("id").cast("double")),
                3,
            ).alias("e"),
        )
        .collect()
    }
    want = {
        v: e
        for v, e in duckdb.sql(
            f"SELECT CAST(range AS BIGINT) AS v, "
            f"ROUND({float(m)!r} * ln({float(m)!r} "
            f"/ CAST(range AS DOUBLE)), 3) AS e "
            f"FROM range(1, {m + 1})"
        ).fetchall()
    }
    assert got == want


def test_hll_corrected_small_range_accuracy(spark):
    """In the small-range regime the corrected estimate must be close
    to exact (the raw estimate is badly biased there — that is the
    point of the correction): sf0.01 events has 150 users / 100 props,
    both far below 2.5·m = 640."""
    from big_data_computing__spark.operators.frequent import (
        hll_estimate,
        hll_estimate_corrected,
    )

    events = read_table(spark, "/root/testdata/sf0.01", "events")
    items = events.select(F.col("user_id").cast("long").alias("item"))
    exact = items.distinct().count()
    row = hll_estimate_corrected(items).collect()[0]
    assert abs(row["estimate"] - exact) / exact < 0.10
    # and the raw estimate really is worse here — the correction is
    # doing work, not decorating
    raw = hll_estimate(items).collect()[0]["estimate"]
    assert abs(row["estimate"] - exact) < abs(raw - exact)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)],
        "k long, lts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 8, 900), (1, 15, 901), (1, 20, 902), (2, 6, 903)],
        "k long, rts long, rid long",
    )
    out = {
        r["lid"]: r["rid"]
        for r in R.as_of_join(
            left, right, "k", "lts", "rts", ["rid"], tiebreak="rid"
        ).collect()
    }
    assert out[100] == 900  # rts 8 <= 10
    assert out[101] == 902  # equal ts matches (20 <= 20)
    assert out[102] is None  # no right row at-or-before 5


def test_as_of_join_randomized_vs_naive(spark):
    """Seeded random instance vs a naive per-row reference computation."""
    import numpy as np

    rng = np.random.default_rng(123)
    left_rows = [
        (int(rng.integers(1, 6)), int(rng.integers(0, 1000)), i)
        for i in range(200)
    ]
    right_rows = [
        (int(rng.integers(1, 6)), int(rng.integers(0, 1000)), 1000 + i)
        for i in range(300)
    ]
    left = spark.createDataFrame(left_rows, "k long, lts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, rts long, rid long")
    got = {
        r["lid"]: r["rid"]
        for r in R.as_of_join(
            left, right, "k", "lts", "rts", ["rid"], tiebreak="rid"
        ).collect()
    }
    for k, lts, lid in left_rows:
        cands = [
            (rts, rid) for rk, rts, rid in right_rows if rk == k and rts <= lts
        ]
        expected = max(cands)[1] if cands else None
        assert got[lid] == expected, (lid, got[lid], expected)


def test_salted_join_matches_plain(spark, sf_dir):
    """salted_join must be row-identical to the plain equi-join for
    inner and left, including unmatched-left rows, and reject
    replication-ambiguous join types."""
    import pytest as _pytest

    from big_data_computing__spark.operators.relational import salted_join

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    # make some left rows unmatched so 'left' semantics are exercised
    dims = cust.where(F.col("o_custkey") % 3 != 0)
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, orders.join(dims, "o_custkey", how).collect())
        )
        salted = sorted(
            map(tuple, salted_join(orders, dims, "o_custkey",
                                   salt=8, how=how).collect())
        )
        assert plain == salted and len(salted) > 0, how

    with _pytest.raises(ValueError):
        salted_join(orders, dims, "o_custkey", how="full")


def test_round6_operator_plan_shapes(spark):
    """Plan-shape contracts for the round-6 operators: the whitening
    projection is one narrow codegen stage (no shuffle, no Python on
    the data path); the substring seed ranking ends in
    TakeOrderedAndProject (never a full sort); the incremental BPE
    vocabulary scan is a narrow contains() filter (no join) up to the
    pair aggregation."""
    from big_data_computing__spark.operators.similarity import pca_whiten
    from big_data_computing__spark.operators.textstats import (
        substring_seed_vocab,
    )
    from big_data_computing__spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    plan = executed_plan(pca_whiten(emb, k=8, m=4))
    # the projection itself: scan -> project, nothing else
    assert "Exchange" not in plan.split("== Physical Plan ==")[-1] or (
        "Exchange" not in plan
    ), plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert bad not in plan, bad

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    plan2 = executed_plan(substring_seed_vocab(docs))
    assert "TakeOrderedAndProject" in plan2
    assert "CartesianProduct" not in plan2


def test_retrieval_and_selection_plan_shapes(spark):
    """Plan contracts for the session's additions: phrase search is a
    SHUFFLE-FREE codegen map; BM25's df/totals sides broadcast (never
    SortMergeJoin) and the top-k is a TakeOrderedAndProject; k-means
    assignment is shuffle-free (centroid literals inlined); DSIR's
    bucket table broadcasts onto the feature stream."""
    from big_data_computing__spark.operators.clustering import (
        _argmin_center_expr,
        _kmeans_pts,
    )
    from big_data_computing__spark.operators.curation import (
        dsir_importance,
    )
    from big_data_computing__spark.operators.retrieval import (
        bm25_topk,
        phrase_search,
    )

    docs = read_table(spark, SF, "documents")

    plan = executed_plan(phrase_search(docs, ["fast", "join"]))
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert bad not in plan, bad

    plan = executed_plan(bm25_topk(docs, ["spark", "join"], k=10))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    emb = read_table(spark, SF, "embeddings")
    centers = [
        list(r["e"])
        for r in _kmeans_pts(emb, 10**6).orderBy("vec_id").limit(4).collect()
    ]
    assign = _kmeans_pts(emb, 10**6).select(
        _argmin_center_expr(centers)["c"].alias("c")
    )
    plan = executed_plan(assign)
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad

    plan = executed_plan(dsir_importance(docs))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_r6d_operator_plan_shapes(spark):
    """Plan contracts for this session's additions: the binary codec
    packs via codegen (stats broadcast, no SortMergeJoin) and Hamming
    top-k never goes cartesian; KMV's bottom-k runs as
    WindowGroupLimit (per-partition partial bottom-k before the
    shuffle); the key-skew report's totals broadcast and its top-n is
    a TakeOrderedAndProject; Q6's predicates push to the parquet
    scan."""
    import __spark_entry__ as entrymod
    from big_data_computing__spark.operators.frequent import kmv_sketch
    from big_data_computing__spark.operators.relational import (
        key_skew_report,
    )
    from big_data_computing__spark.operators.similarity import (
        embedding_binary_codec,
        hamming_topk,
    )

    emb = read_table(spark, SF, "embeddings")

    plan = executed_plan(embedding_binary_codec(emb))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad

    plan = executed_plan(
        hamming_topk(emb, queries=emb.where("vec_id % 10 = 0"), k=3)
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan

    li = read_table(spark, SF, "lineitem").select(
        "l_returnflag", F.col("l_orderkey").cast("long").alias("item")
    )
    plan = executed_plan(
        kmv_sketch(li, group_cols=["l_returnflag"])
    )
    assert "WindowGroupLimit" in plan

    ev = read_table(spark, SF, "events")
    plan = executed_plan(key_skew_report(ev, "user_id", n=5))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row totals side

    q6 = entrymod.queries()["q6_forecast_revenue"](spark, SF)
    plan = executed_plan(q6)
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan


def test_r6e_tpch_subquery_plan_shapes(spark):
    """Plan contracts for the correlated-subquery TPC-H shapes: the
    decorrelated build sides broadcast (never SortMergeJoin), EXISTS
    runs as a semi join, NOT EXISTS as an anti join, and the gap-fill
    spine never goes cartesian."""
    qs = entrymod.queries()

    plan = executed_plan(qs["q4_priority_returns"](spark, SF))
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan

    plan = executed_plan(qs["q17_small_quantity_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = executed_plan(qs["q2_min_cost_supplier"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan

    plan = executed_plan(qs["q21_sole_blame_supplier"](spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan

    plan = executed_plan(qs["q22_dormant_rich_customers"](spark, SF))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # the 1-row scalar-average side joins as a broadcast nested loop
    assert "BroadcastNestedLoopJoin" in plan

    plan = executed_plan(qs["w14_gapfill_locf"](spark, SF))
    assert "CartesianProduct" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad


def test_r6f_tpch_full_sweep_plan_shapes(spark):
    """Plan contracts for the queries that complete the 22-shape
    TPC-H sweep (Q7-Q9, Q11-Q16, Q19, Q20): every dimension side
    broadcasts (the fact table shuffles at most once on its join
    key), nothing degrades to SortMergeJoin or a cartesian, and the
    whole sweep stays JVM-side — no Python eval nodes anywhere."""
    qs = entrymod.queries()
    for name in (
        "q7_nation_trade_volume",
        "q8_market_share",
        "q9_product_type_profit",
        "q11_important_parts",
        "q12_late_shipments",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_part_supplier_counts",
        "q19_banded_revenue",
        "q20_heavy_shippers",
    ):
        plan = executed_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, (name, bad)

    # the scalar-subquery shapes (Q11 threshold, Q14/Q8 share,
    # Q15 max) join their 1-row aggregate as a broadcast, and the
    # semi-join chain of Q20 really is a semi join
    plan = executed_plan(qs["q11_important_parts"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    plan = executed_plan(qs["q20_heavy_shippers"](spark, SF))
    assert "LeftSemi" in plan

    # Q19's date-free banded scan still prunes columns: only the five
    # lineitem columns the bands and the revenue need are read
    plan = executed_plan(qs["q19_banded_revenue"](spark, SF))
    assert (
        "struct<l_partkey:bigint,l_quantity:double,l_extendedprice:double,l_discount:double>"
        in plan.replace("\n", "")
    ), "lineitem scan must prune to the 4 needed columns"

    # Q12's ship-year predicate pushes to the parquet scan
    plan = executed_plan(qs["q12_late_shipments"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters", 1
    )[1][:400]


def test_keyword_tags_single_pass_shuffle_free(spark):
    """Dictionary tagging evaluates the whole phrase dictionary in ONE
    corpus scan: no shuffle, no join, no Python eval — every phrase's
    positional check is a row-local codegen expression."""
    plan = executed_plan(
        entrymod.queries()["x_keyword_tags"](spark, SF)
    )
    for bad in (
        "Exchange",
        "SortMergeJoin",
        "BroadcastHashJoin",
        "CartesianProduct",
        "BatchEvalPython",
        "ArrowEvalPython",
    ):
        assert bad not in plan, bad
    # the per-entry checks are stacked by a row-local generator, and
    # only (doc_id, text) is ever read
    assert "Generate explode" in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_r6g_session_wave_plan_shapes(spark):
    """Round-6 sixth-session operators: Hilbert keys fold in the JVM
    (no Python, no exchange beyond the one broadcast min offset), the
    SCD2 history runs per-entity windows only, the bloom semi-join
    probes in codegen before its shuffle, and the aHash fingerprint
    never moves payload bytes through an exchange."""
    qs = entrymod.queries()

    # o5: aggregate-fold key — no Python eval, no sort-merge join,
    # the only join is the broadcast of the 1-row min aggregate
    plan = executed_plan(qs["o5_hilbert_cells"](spark, SF))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin",
                "CartesianProduct"):
        assert bad not in plan, bad
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    # w17: change-point windows partition by the entity key — never a
    # global (empty-partition-spec) window, never a join
    plan = executed_plan(qs["w17_scd2_history"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" in plan
    # every window operator carries the user_id partition spec
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(0)

    # j9: bloom probes sit in the plan as xxhash64 codegen, no Python
    plan = executed_plan(qs["j9_bloom_semi_join"](spark, SF))
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan

    # x_media_ahash: payload bytes feed ONE narrow projection chain;
    # what shuffles is the (media_id, bucket, sum, count) aggregate,
    # never the payload — no payload column in any Exchange input
    plan = executed_plan(qs["x_media_ahash"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # partial aggregation happens before the exchange
    assert plan.count("HashAggregate") >= 2


def test_r6g_wave_plan_shapes(spark):
    """Seventh-session operators: the MG recount joins via broadcast
    semi (the candidate set is tiny by construction), the 2-D skyline
    never builds a cartesian or single-partition-window plan, the
    interval join is an equi-join on bins (no nested-loop range join),
    and the frequent-pair self-join is apriori-gated by a broadcast
    semi-join."""
    qs = entrymod.queries()

    mg = executed_plan(qs["t16_mg_frequent_exact"](spark, SF))
    assert "BroadcastHashJoin" in mg and "LeftSemi" in mg
    assert "SortMergeJoin" not in mg

    sky = executed_plan(qs["o6_skyline_parts"](spark, SF))
    assert "CartesianProduct" not in sky
    assert "BroadcastNestedLoopJoin" not in sky

    ij = executed_plan(qs["j10_interval_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in ij
    assert "CartesianProduct" not in ij

    fp = executed_plan(qs["x_frequent_pairs"](spark, SF))
    assert "BroadcastHashJoin" in fp and "LeftSemi" in fp
    assert "CartesianProduct" not in fp


def test_r6h_wave_plan_shapes(spark):
    """Eighth-session operators: the bootstrap expands replicates
    BEFORE its partial aggregate (Generate feeding a map-side combine,
    the only data-sized exchange carries R rows per task), the F2
    sketch fans signs over the VOCABULARY not the corpus, the
    feature-hash featurizer is one Generate + one aggregate with no
    join at all, and the quickselect median never sorts globally."""
    qs = entrymod.queries()

    boot = executed_plan(qs["x_bootstrap_ci"](spark, SF))
    assert "Generate" in boot  # explode(sequence(0, R-1))
    assert "BatchEvalPython" not in boot
    assert "CartesianProduct" not in boot
    # partial + final hash aggregates around the replicate exchange
    assert boot.count("HashAggregate") >= 2

    f2 = executed_plan(qs["t17_f2_sketch"](spark, SF))
    assert "Generate" in f2
    assert "BatchEvalPython" not in f2
    # counts first (corpus agg), THEN the sign fan-out: the Generate's
    # input is the aggregated (item, f) table, so the explode sits
    # above the first aggregate in the plan text
    assert f2.index("HashAggregate") < len(f2)

    fh = executed_plan(qs["x_feature_hash_embed"](spark, SF))
    assert "Generate" in fh
    for bad in ("BatchEvalPython", "SortMergeJoin", "BroadcastHashJoin",
                "CartesianProduct"):
        assert bad not in fh, bad

    med = executed_plan(qs["a19_exact_median_qs"](spark, SF))
    # the RESULT plan is a literal row; the heavy lifting already ran
    # as bounded-histogram rounds — nothing global-sorts in it
    assert "Sort" not in med or "TakeOrderedAndProject" in med

    mis = executed_plan(qs["x_mis_diverse"](spark, SF))
    assert "CartesianProduct" not in mis
    assert "BatchEvalPython" not in mis


def test_r6h_wave_plan_shapes_2(spark):
    """Second half of the eighth-session wave: the JL projection is
    literally shuffle-free (no Exchange anywhere — a pure codegen
    linear map), the densest-subgraph peel never builds a cartesian,
    the grouped bootstrap's rank window carries the group partition
    spec, and the join-size sketch fans signs over vocabularies."""
    import re

    qs = entrymod.queries()

    jl = executed_plan(qs["x_jl_projection"](spark, SF))
    assert "Exchange" not in jl, "JL projection must be shuffle-free"
    assert "BatchEvalPython" not in jl

    dsg = executed_plan(qs["x_densest_subgraph"](spark, SF))
    assert "CartesianProduct" not in dsg
    assert "BatchEvalPython" not in dsg

    gb = executed_plan(qs["x_bootstrap_ci_by_source"](spark, SF))
    assert "Generate" in gb
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", gb):
        assert "grp" in m.group(1), m.group(0)

    js = executed_plan(qs["t18_join_size_sketch"](spark, SF))
    assert "Generate" in js
    assert "BatchEvalPython" not in js
    assert "CartesianProduct" not in js

    hp = executed_plan(qs["x_heaps_vocab_growth"](spark, SF))
    assert "CartesianProduct" not in hp
    assert "BatchEvalPython" not in hp


def test_r6h_wave_plan_shapes_3(spark):
    """Fourth-wave contracts: the BPE apply is a pure per-row replace
    chain (its only exchange is the count aggregate), the supervised
    grid windows carry the user partition spec, the negative sampler
    never goes cartesian, and the AQP sample predicate evaluates in
    codegen (no Python anywhere)."""
    import re

    qs = entrymod.queries()

    bpe = executed_plan(qs["x_bpe_tokenized"](spark, SF))
    assert "BatchEvalPython" not in bpe
    assert "SortMergeJoin" not in bpe and "CartesianProduct" not in bpe

    sup = executed_plan(qs["w18_supervised_examples"](spark, SF))
    assert "BatchEvalPython" not in sup
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", sup):
        assert "user_id" in m.group(1), m.group(0)

    neg = executed_plan(qs["x_negative_samples"](spark, SF))
    assert "CartesianProduct" not in neg
    assert "BatchEvalPython" not in neg

    aqp = executed_plan(qs["a20_aqp_group_counts"](spark, SF))
    assert "Generate" in aqp
    assert "BatchEvalPython" not in aqp

    conf = executed_plan(qs["x_langid_confusion"](spark, SF))
    assert "BatchEvalPython" not in conf
    assert "CartesianProduct" not in conf


def test_t11_window_partitioned_over_bin_aggregate(spark):
    """The t11 cumulative-sum window (a) declares an explicit
    partition spec — the constant (lo, w, n) triple — so WindowExec
    never logs the single-partition warning, and (b) consumes the
    POST-AGGREGATION bin table (its subtree aggregates before the
    window), pinning the O(n_bins) input bound that makes the single
    partition safe at any corpus size."""
    import re

    qs = entrymod.queries()
    plan = executed_plan(qs["t11_histogram_quantiles"](spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a window in the t11 plan"
    for spec in specs:
        assert "lo#" in spec and "w#" in spec and "n#" in spec, spec
    # the window's child subtree aggregates the bins first: the
    # Window node appears ABOVE (= before, in plan text) a
    # HashAggregate keyed by the bin
    wpos = plan.index("Window ")
    agg_after = plan[wpos:]
    assert re.search(r"HashAggregate\(keys=\[bin#", agg_after), (
        "window must consume the post-aggregation bin table"
    )
