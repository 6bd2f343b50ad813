"""Frequent-items operators: hand fixtures, guarantees, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators import frequent as FR
from big_data_computing__spark.sources.readers import event_stream_table


@pytest.fixture(scope="module")
def stream(spark):
    # 20 items: item 1 appears 10 times, item 2 five times, rest singletons
    items = [1] * 10 + [2] * 5 + [3, 4, 5, 6, 7]
    rows = [(i + 1, item) for i, item in enumerate(items)]
    return spark.createDataFrame(rows, "seq long, item long")


def test_true_frequent(spark, stream):
    rows = FR.true_frequent_items(stream, phi=0.25).collect()
    got = {(r["item"], r["cnt"]) for r in rows}
    assert got == {(1, 10), (2, 5)}


def test_true_frequent_threshold_inclusive(spark, stream):
    # count >= phi*total (reference uses >=, big_data_computing_3.py:12)
    rows = FR.true_frequent_items(stream, phi=0.5).collect()
    assert {(r["item"], r["cnt"]) for r in rows} == {(1, 10)}


def test_reservoir_fills_first_m(spark, stream):
    # m=20 >= stream length → reservoir is exactly the stream items
    sample = FR.reservoir_sample(stream, m=20, seed=0).collect()
    assert len(sample) == 20
    slots = {r["slot"] for r in sample}
    assert slots == set(range(20))


def test_reservoir_deterministic(spark, stream):
    a = sorted(
        (r["slot"], r["item"])
        for r in FR.reservoir_sample(stream, m=3, seed=5).collect()
    )
    b = sorted(
        (r["slot"], r["item"])
        for r in FR.reservoir_sample(stream, m=3, seed=5).collect()
    )
    assert a == b
    assert len(a) <= 3


def test_reservoir_report_flags(spark, stream):
    rows = FR.reservoir_report(stream, phi=0.25, seed=1).collect()
    flags = {r["item"]: r["flag"] for r in rows}
    for item, flag in flags.items():
        assert flag == ("+" if item in (1, 2) else "-")


def test_sticky_counts_frequent_item_caught(spark, stream):
    # r large → everything admitted at first occurrence → exact counts
    rows = FR.sticky_counts(stream, n=20, r=1e9, seed=0).collect()
    got = {(r["item"], r["est_cnt"]) for r in rows}
    assert (1, 10) in got and (2, 5) in got
    assert len(got) == 7


def test_sticky_underestimates(spark, stream):
    # est count can never exceed the true count
    est = {
        r["item"]: r["est_cnt"]
        for r in FR.sticky_counts(stream, n=20, r=5.0, seed=3).collect()
    }
    true = {
        r["item"]: r["cnt"] for r in FR.item_counts(stream).collect()
    }
    for item, c in est.items():
        assert c <= true[item]


def test_sticky_report_epsilon_guarantee(spark, sf_dir):
    """Every true-frequent item must appear in the sticky report when the
    (phi, epsilon, delta) guarantee holds — the reference's printed
    invariant is that '+' rows cover the truth set w.h.p."""
    stream = event_stream_table(spark, sf_dir).cache()
    n = stream.count()
    phi, eps, delta = 0.02, 0.008, 0.1
    truth = {
        r["item"] for r in FR.true_frequent_items(stream, phi).collect()
    }
    report = FR.sticky_report(stream, n, phi, eps, delta, seed=0).collect()
    reported = {r["item"] for r in report}
    assert truth <= reported
    plus = {r["item"] for r in report if r["flag"] == "+"}
    assert plus == truth & reported
    stream.unpersist()


def test_samplers_partitioning_invariant(spark, sf_dir):
    """The counter-based PRNG makes sampler output a pure function of the
    data — identical under any physical partitioning (the stateful-RNG
    reference can't guarantee this even for two runs on the same layout).
    """
    base = event_stream_table(spark, sf_dir)
    phi, seed = 0.02, 11
    m = FR.reservoir_size(phi)
    variants = [base.repartition(1), base.repartition(37, "item")]
    expected = sorted(
        (r["slot"], r["item"])
        for r in FR.reservoir_sample(base, m, seed).collect()
    )
    for v in variants:
        got = sorted(
            (r["slot"], r["item"])
            for r in FR.reservoir_sample(v, m, seed).collect()
        )
        assert got == expected
    n = base.count()
    exp_sticky = sorted(
        (r["item"], r["est_cnt"])
        for r in FR.sticky_counts(base, n, 50.0, seed).collect()
    )
    for v in variants:
        got = sorted(
            (r["item"], r["est_cnt"])
            for r in FR.sticky_counts(v, n, 50.0, seed).collect()
        )
        assert got == exp_sticky


def test_cms_one_sided_error_and_merge(spark, sf_dir):
    """Count-min: estimate >= true count for EVERY item (one-sided
    error), the sketch is bounded at depth*width rows, and sketches of
    disjoint halves merged by adding counters equal the whole-stream
    sketch (the mergeable-summary property)."""
    stream = event_stream_table(spark, sf_dir).cache()
    rep = FR.cms_frequent_report(stream, phi=0.004).collect()
    assert len(rep) > 0
    for r in rep:
        assert r["cms_estimate"] >= r["cnt"], r

    sk = FR.cms_sketch(stream)
    assert sk.count() <= FR.CMS_DEPTH * FR.CMS_WIDTH

    half = stream.count() // 2
    lo = stream.where(F.col("seq") <= half)
    hi = stream.where(F.col("seq") > half)
    merged = {
        (r["row"], r["bucket"]): r["s"]
        for r in FR.cms_sketch(lo)
        .unionByName(FR.cms_sketch(hi))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"] for r in sk.collect()
    }
    assert merged == whole
    stream.unpersist()


def test_hll_accuracy_and_merge(spark, sf_dir):
    """Deterministic HLL: raw estimate within the sketch's error band
    of the exact distinct count (3σ ≈ 20% at 256 registers) on a
    stream with cardinality ≥ 2.5·m (the raw formula's valid regime —
    below it linear counting would be needed, which the operator
    deliberately omits; see hll_estimate docstring), and shard
    registers merged by element-wise MAX equal the whole-stream
    registers (the mergeable-summary property)."""
    big = spark.range(5000).select(
        F.col("id").alias("seq"), F.col("id").alias("item")
    )
    est = FR.hll_estimate(big).collect()[0]["estimate"]
    assert abs(est - 5000) / 5000 < 0.20, est

    stream = event_stream_table(spark, sf_dir).cache()

    half = stream.count() // 2
    lo = stream.where(F.col("seq") <= half)
    hi = stream.where(F.col("seq") > half)
    merged = {
        (r["bucket"], r["mm"])
        for r in FR.hll_registers(lo)
        .unionByName(FR.hll_registers(hi))
        .groupBy("bucket")
        .agg(F.max("m").alias("mm"))
        .collect()
    }
    whole = {
        (r["bucket"], r["m"]) for r in FR.hll_registers(stream).collect()
    }
    assert merged == whole
    stream.unpersist()


def test_sketches_run_as_streaming_aggregations(spark, sf_dir, tmp_path):
    """cms_sketch and hll_registers are valid STREAMING aggregations
    as-is (their state is the sketch itself: ≤ depth·width / 2^p
    keys) — replaying the fixture through a file stream in complete
    mode must reproduce the batch sketch exactly."""
    stream_df = event_stream_table(spark, sf_dir)
    data = str(tmp_path / "sketch_events")
    stream_df.write.parquet(data)
    src = spark.readStream.schema(stream_df.schema).parquet(data)

    for name, build, keyfn in (
        ("cms_c", FR.cms_sketch,
         lambda r: ((r["row"], r["bucket"]), r["cnt"])),
        ("hll_c", FR.hll_registers,
         lambda r: (r["bucket"], r["m"])),
    ):
        q = (
            build(src)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {keyfn(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        want = {keyfn(r) for r in build(stream_df).collect()}
        assert got == want and len(got) > 0, name


# ---------------------------------------------------------------------------
# Weighted reservoir (Efraimidis–Spirakis A-Res / A-ExpJ)
# ---------------------------------------------------------------------------


def _ares_keys_py(items, weights, seed):
    """Pure-python replica of weighted_reservoir_keys' arithmetic:
    u = md5-hash60("wres-{seed}-{item}") / 2^60, key = ln(u)/w."""
    import hashlib
    import math

    out = {}
    for it, w in zip(items, weights):
        s = f"wres-{seed}-{it}".encode()
        u = int(hashlib.md5(s).hexdigest()[:15], 16) / float(2**60)
        out[it] = math.log(u) / float(w)
    return out


def test_weighted_reservoir_matches_sequential_reference(spark):
    """The distributed top-m selection must equal a sequential A-ExpJ
    pass fed the same per-item keys (A-ExpJ keeps the m largest keys —
    the jump trick only skips draws, never changes the selection)."""
    items = list(range(1, 41))
    weights = [(i % 7) + 1 for i in items]
    m, seed = 8, 42
    df = spark.createDataFrame(
        list(zip(items, weights)), "item long, w long"
    )
    got = [
        (r["rank"], r["item"], r["w"])
        for r in FR.weighted_reservoir_sample(df, m, seed=seed).collect()
    ]
    keys = _ares_keys_py(items, weights, seed)
    want_items = sorted(items, key=lambda i: (-keys[i], i))[:m]
    want = [(rk + 1, i, weights[i - 1]) for rk, i in enumerate(want_items)]
    assert got == want


def test_weighted_reservoir_m1_inclusion_proportional_to_weight():
    """For m=1 the A-Res inclusion law is exactly P(i) = w_i/Σw; check
    the key arithmetic empirically over many counter-based seeds (no
    Spark needed — the selection is a pure function of the keys)."""
    items = list(range(1, 7))
    weights = [1, 1, 2, 2, 4, 4]
    total = float(sum(weights))
    trials = 4000
    wins = {i: 0 for i in items}
    for seed in range(trials):
        keys = _ares_keys_py(items, weights, seed)
        wins[max(items, key=lambda i: keys[i])] += 1
    for i, w in zip(items, weights):
        p = w / total
        sd = (p * (1 - p) / trials) ** 0.5
        assert abs(wins[i] / trials - p) < 4 * sd, (i, wins[i] / trials, p)


def test_weighted_reservoir_uniform_weights_reduce_to_uniform():
    """w ≡ const: every item's m=1 win rate approaches 1/n — the
    degenerate case that must match the unweighted reservoir law."""
    items = list(range(1, 9))
    trials = 4000
    wins = {i: 0 for i in items}
    for seed in range(trials):
        keys = _ares_keys_py(items, [5] * len(items), seed)
        wins[max(items, key=lambda i: keys[i])] += 1
    p = 1 / len(items)
    sd = (p * (1 - p) / trials) ** 0.5
    for i in items:
        assert abs(wins[i] / trials - p) < 4 * sd, (i, wins[i] / trials)


def test_weighted_reservoir_stratified_structure(spark):
    """Each stratum gets an independent top-min(m, n_s) sample; ranks
    are dense from 1; items stay in their own stratum; and the sample
    inside each stratum equals the unstratified operator run on that
    stratum alone (draw independence)."""
    rows = [
        (s, s * 100 + i, (i % 5) + 1)
        for s in (1, 2, 3)
        for i in range(1, (8, 3, 12)[s - 1] + 1)
    ]
    df = spark.createDataFrame(rows, "stratum long, item long, w long")
    m, seed = 5, 42
    got = FR.weighted_reservoir_stratified(df, m, seed=seed).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], []).append(
            (r["rank"], r["item"], r["w"])
        )
    sizes = {1: 8, 2: 3, 3: 12}
    for s, entries in by_stratum.items():
        entries.sort()
        assert [e[0] for e in entries] == list(
            range(1, min(m, sizes[s]) + 1)
        )
        assert all(e[1] // 100 == s for e in entries)
        solo = [
            (r["rank"], r["item"], r["w"])
            for r in FR.weighted_reservoir_sample(
                df.where(F.col("stratum") == s).select("item", "w"),
                m,
                seed=seed,
            ).collect()
        ]
        assert entries == sorted(solo), s
    assert set(by_stratum) == {1, 2, 3}


def test_histogram_quantiles_error_bound_and_merge(spark, sf_dir):
    """The sketch's two contracts: (1) every estimate is within one bin
    width of the exact percentile; (2) with agreed bounds, sketching two
    halves and merging (adding counters) equals sketching the whole —
    here asserted via the stronger end-result property that the
    fixed-bounds estimate is independent of how rows are split."""
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.frequent import (
        histogram_quantiles,
    )
    from big_data_computing__spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    est = {
        r["q"]: r["est"]
        for r in histogram_quantiles(li, "l_extendedprice").collect()
    }
    lo, hi, n = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"), F.count("*")
    ).collect()[0]
    width = ((hi - lo) * 100 + 64) // 64 / 100 + 0.01
    exact = li.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {q})").alias(str(q))
            for q in (0.25, 0.5, 0.75, 0.95)
        ]
    ).collect()[0]
    for q in (0.25, 0.5, 0.75, 0.95):
        assert abs(est[q] - exact[str(q)]) <= width, (q, est[q], exact[str(q)])

    # split-independence under fixed bounds (mergeability in effect)
    bounds = (int(lo * 100), int(hi * 100))
    whole = sorted(
        (r["q"], r["est"])
        for r in histogram_quantiles(
            li, "l_extendedprice", bounds=bounds
        ).collect()
    )
    # a biased split: cheap rows first half, expensive second — any
    # split-sensitivity in the binning would show here
    again = sorted(
        (r["q"], r["est"])
        for r in histogram_quantiles(
            li.orderBy("l_extendedprice"), "l_extendedprice", bounds=bounds
        ).collect()
    )
    assert whole == again


def test_histogram_bins_run_as_streaming_aggregation(
    spark, sf_dir, tmp_path
):
    """histogram_bins joins the CMS/HLL contract: replaying lineitem
    through a file stream in complete mode reproduces the batch bin
    counters exactly."""
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.frequent import histogram_bins
    from big_data_computing__spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    lo, hi = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).collect()[0]
    bounds = (int(lo * 100), int(hi * 100))

    data = str(tmp_path / "hist_rows")
    li.write.parquet(data)
    src = spark.readStream.schema(li.schema).parquet(data)
    q = (
        histogram_bins(src, "l_extendedprice", bounds)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hist_c")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bin"], r["cnt"])
        for r in spark.sql("SELECT * FROM hist_c").collect()
    }
    want = {
        (r["bin"], r["cnt"])
        for r in histogram_bins(li, "l_extendedprice", bounds).collect()
    }
    assert got == want and len(got) > 1


def test_hll_by_group_matches_per_group_global(spark, sf_dir):
    """Groups share nothing: the per-group sketch must equal the global
    sketch run on that group's rows alone, and in the valid regime
    (cardinality above the 2.5*m small-range threshold) the estimate
    must land near the true distinct count."""
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.frequent import (
        hll_estimate,
        hll_estimate_by,
    )
    from big_data_computing__spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_orderkey").cast("long").alias("item")
    )
    by = {
        r["l_returnflag"]: (r["z_scaled"], r["estimate"])
        for r in hll_estimate_by(li, "l_returnflag").collect()
    }
    assert len(by) > 1
    for flag, (z, est) in sorted(by.items()):
        alone = hll_estimate(
            li.where(F.col("l_returnflag") == flag)
        ).collect()[0]
        assert (alone["z_scaled"], alone["estimate"]) == (z, est), flag
        truth = (
            li.where(F.col("l_returnflag") == flag)
            .select("item")
            .distinct()
            .count()
        )
        if truth > 2.5 * 256:  # raw-estimator validity regime
            assert abs(est - truth) / truth < 0.2, (flag, est, truth)


# -- KMV bottom-k distinct sketch --


def test_kmv_exact_regime_and_merge(spark):
    from big_data_computing__spark.operators.frequent import (
        KMV_K,
        kmv_estimate,
        kmv_sketch,
    )

    # 40 distinct items < k=64: sketch not full, estimate is EXACT
    df = spark.createDataFrame(
        [(i % 40,) for i in range(400)], ["item"]
    )
    row = kmv_estimate(df).collect()[0]
    assert row["n_sketch"] == 40
    assert row["estimate"] == 40

    # merge property: bottom-k of the union of two shard sketches ==
    # sketch of the union
    big = spark.createDataFrame([(i,) for i in range(5000)], ["item"])
    s_all = {
        (r["pos"], r["hv"]) for r in kmv_sketch(big).collect()
    }
    sh1 = kmv_sketch(big.where("item % 2 = 0")).select("hv")
    sh2 = kmv_sketch(big.where("item % 2 = 1")).select("hv")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy(F.asc("hv"))
    merged = {
        (r["pos"], r["hv"])
        for r in sh1.union(sh2)
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= KMV_K)
        .collect()
    }
    assert merged == s_all


def test_kmv_estimate_accuracy(spark):
    from big_data_computing__spark.operators.frequent import kmv_estimate

    # 5000 distinct under k=64 → stderr ~ 1/sqrt(62) ≈ 13%; assert 3σ
    big = spark.createDataFrame([(i,) for i in range(5000)], ["item"])
    est = kmv_estimate(big).collect()[0]["estimate"]
    assert abs(est - 5000) < 5000 * 0.40


def test_kmv_jaccard_exact_when_union_fits(spark):
    from big_data_computing__spark.operators.frequent import kmv_jaccard

    # |A ∪ B| = 30 ≤ k → the sketch IS the union; jaccard exact
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 30)]
    df = spark.createDataFrame(rows, ["label", "item"])
    r = kmv_jaccard(df, "label", "a", "b").collect()[0]
    assert r["n_union_sketch"] == 30
    assert r["n_overlap"] == 10
    assert r["jaccard_milli"] == 1000 * 10 // 30


def test_kmv_pairwise_matches_single_pair_operator(spark):
    from big_data_computing__spark.operators.frequent import (
        kmv_jaccard,
        kmv_pairwise_jaccard,
    )

    rows = (
        [("a", i) for i in range(30)]
        + [("b", i) for i in range(20, 50)]
        + [("c", i) for i in range(45, 60)]
    )
    df = spark.createDataFrame(rows, ["label", "item"])
    mat = {
        (r["label_a"], r["label_b"]): (
            r["n_union_sketch"],
            r["n_overlap"],
            r["jaccard_milli"],
        )
        for r in kmv_pairwise_jaccard(df, "label").collect()
    }
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    for la, lb in mat:
        single = kmv_jaccard(df, "label", la, lb).collect()[0]
        assert mat[(la, lb)] == (
            single["n_union_sketch"],
            single["n_overlap"],
            single["jaccard_milli"],
        )
    # unions fit under k here, so the values are EXACT set algebra
    assert mat[("a", "b")] == (50, 10, 200)
    assert mat[("a", "c")] == (45, 0, 0)


# ---------------------------------------------------------------------------
# Misra-Gries two-pass exact frequent items
# ---------------------------------------------------------------------------


def test_mg_summary_bounded_per_partition(spark, sf_dir):
    stream = event_stream_table(spark, sf_dir).repartition(8)
    k = 16
    summ = FR.mg_partition_summaries(stream, k)
    # global bound: at most n_partitions * (k-1) summary rows
    assert summ.count() <= 8 * (k - 1)
    # every lb is a valid lower bound on the exact count
    exact = {r["item"]: r["cnt"] for r in FR.item_counts(stream).collect()}
    merged = (
        summ.groupBy("item").agg(F.sum("lb").alias("lb")).collect()
    )
    for r in merged:
        assert 0 < r["lb"] <= exact[r["item"]]


def test_mg_candidates_cover_true_frequent(spark, sf_dir):
    stream = event_stream_table(spark, sf_dir).repartition(8)
    phi = 0.004
    k = 251  # ceil(1/phi)+1
    cands = {
        r["item"]
        for r in FR.mg_partition_summaries(stream, k)
        .select("item")
        .distinct()
        .collect()
    }
    truth = {r["item"] for r in FR.true_frequent_items(stream, phi).collect()}
    assert truth <= cands


def test_mg_frequent_exact_parity(spark, sf_dir):
    stream = event_stream_table(spark, sf_dir).repartition(8)
    for phi in (0.004, 0.008):
        got = {
            (r["item"], r["cnt"])
            for r in FR.mg_frequent_exact(stream, phi).collect()
        }
        want = {
            (r["item"], r["cnt"])
            for r in FR.true_frequent_items(stream, phi).collect()
        }
        assert got == want and got


def test_mg_frequent_exact_boundary_item(spark):
    # item 2 sits EXACTLY at phi*n (5 = 0.25*20): inclusive >= must keep
    # it, and the MG candidate pass must not have pruned it
    items = [1] * 10 + [2] * 5 + [3, 4, 5, 6, 7]
    rows = [(i + 1, item) for i, item in enumerate(items)]
    st = spark.createDataFrame(rows, "seq long, item long").repartition(4)
    got = {(r["item"], r["cnt"]) for r in FR.mg_frequent_exact(st, 0.25).collect()}
    assert got == {(1, 10), (2, 5)}


def test_mg_partitioning_invariant(spark, sf_dir):
    stream = event_stream_table(spark, sf_dir)
    a = {
        (r["item"], r["cnt"])
        for r in FR.mg_frequent_exact(stream.repartition(2), 0.004).collect()
    }
    b = {
        (r["item"], r["cnt"])
        for r in FR.mg_frequent_exact(stream.repartition(16), 0.004).collect()
    }
    assert a == b


def test_mg_summary_state_prefix_guarantees_and_replay(spark, sf_dir):
    """Direct-update run of the streaming MG state: after every batch
    prefix the state is bounded at k-1 counters, every lb is a valid
    lower bound with undercount <= n/k, every item with count > n/k is
    a candidate, and a replayed batch id is a strict no-op."""
    from big_data_computing__spark.streaming.frequent_stream import (
        MgSummaryState,
    )

    stream = event_stream_table(spark, sf_dir)
    n_total = stream.count()
    k = 64
    state = MgSummaryState(k)
    cut1, cut2 = n_total // 3, 2 * n_total // 3
    slices = [
        stream.where(F.col("seq") <= cut1),
        stream.where((F.col("seq") > cut1) & (F.col("seq") <= cut2)),
        stream.where(F.col("seq") > cut2),
    ]
    arrived = None
    for bid, sl in enumerate(slices):
        summ = FR.mg_partition_summaries(sl.repartition(4), k).collect()
        state.fold(summ, n_rows=sl.count(), batch_id=bid)
        arrived = sl if arrived is None else arrived.union(sl)

        assert len(state.counters) <= k - 1
        exact = {
            r["item"]: r["cnt"]
            for r in FR.item_counts(arrived).collect()
        }
        n = state.n
        assert n == arrived.count()
        for item, lb in state.counters.items():
            assert 0 < lb <= exact[item]
            assert exact[item] - lb <= n // k + 1
        heavy = {i for i, c in exact.items() if c > n / k}
        assert heavy <= state.candidates()

    # replay: same batch id, arbitrary rows -> strict no-op
    before = (dict(state.counters), state.n)
    state.fold([{"item": 999999, "lb": 10**9}], n_rows=10**9, batch_id=0)
    assert (dict(state.counters), state.n) == before


def test_histogram_quantiles_by_matches_per_group_global(spark, sf_dir):
    """Per-group summary equals running the GLOBAL summary on each
    group alone (bounds and widths are per-group by construction)."""
    from big_data_computing__spark.operators.frequent import (
        histogram_quantiles,
        histogram_quantiles_by,
    )
    from big_data_computing__spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events")
    by = {
        (r["event_type"], r["q"]): r["est"]
        for r in histogram_quantiles_by(
            ev, "value", "event_type"
        ).collect()
    }
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    assert len(types) >= 2
    for t in types:
        solo = {
            r["q"]: r["est"]
            for r in histogram_quantiles(
                ev.where(F.col("event_type") == t), "value"
            ).collect()
        }
        for q, est in solo.items():
            assert by[(t, q)] == est, (t, q)
