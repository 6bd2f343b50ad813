"""Poisson bootstrap CI + AMS F2 sketch (operators/stats.py).

The bootstrap and the sketch are both pure functions of md5 draws, so
the tests pin them three ways: a pure-python re-derivation on a hand
fixture (independent of Spark), a DuckDB twin run on the sf0.001
corpus (the oracle contract), and the streaming fold's bit-parity with
the batch counters (linearity)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.stats import (
    POISSON1_T60,
    _ci_ranks,
    f2_estimate_from_counters,
    f2_sketch,
    f2_sketch_sql,
    poisson_bootstrap_ci,
    poisson_bootstrap_ci_sql,
)
from big_data_computing__spark.sources.readers import read_table


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _pweight(key: str) -> int:
    h = _h60(key)
    return sum(1 for t in POISSON1_T60 if h >= t)


@pytest.fixture(scope="module")
def small(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(12)]
    return spark.createDataFrame(rows, "id long, v long")


def test_bootstrap_matches_pure_python(spark, small):
    """End-to-end pin: replicate means, order statistics, and the
    point estimate re-derived with hashlib alone."""
    R, alpha, seed = 16, 200, 7
    rows = [(i, (i * 37) % 100 + 1) for i in range(12)]
    means = []
    for r in range(R):
        s = n = 0
        for i, v in rows:
            w = _pweight(f"boot-{seed}-{i}-{r}")
            s += w * v
            n += w
        if n > 0:
            means.append((1000 * s // n, r))
    means.sort()
    lo_rk, hi_rk = _ci_ranks(R, alpha)
    want_lo = means[lo_rk - 1][0]
    want_hi = means[hi_rk - 1][0]
    want_point = 1000 * sum(v for _, v in rows) // len(rows)

    got = poisson_bootstrap_ci(
        small, "v", "id", n_replicates=R, alpha_permille=alpha, seed=seed
    ).collect()[0]
    assert got["n_rows"] == 12
    assert got["point_milli"] == want_point
    assert got["lo_milli"] == want_lo
    assert got["hi_milli"] == want_hi
    assert got["lo_milli"] <= got["hi_milli"]


def test_bootstrap_duckdb_parity(spark, sf_dir):
    import duckdb

    docs = read_table(spark, sf_dir, "documents")
    got = poisson_bootstrap_ci(
        docs, "n_chars", "doc_id", n_replicates=50
    ).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        poisson_bootstrap_ci_sql(
            "SELECT * FROM documents", "n_chars", "doc_id", n_replicates=50
        )
    ).fetchall()[0]
    assert tuple(got) == want


def test_ci_ranks_symmetric_and_clamped():
    assert _ci_ranks(200, 50) == (5, 196)
    assert _ci_ranks(100, 50) == (3, 98)
    # tiny R: lower rank clamps to 1, upper mirrors to R
    assert _ci_ranks(4, 50) == (1, 4)


def test_f2_matches_pure_python(spark):
    """Counters, group means, and the lower-median estimate re-derived
    with hashlib on a skewed hand fixture; exact_f2 = Σf² checked."""
    items = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    )
    S, G, seed = 16, 4, 0
    counts = {x: items.count(x) for x in set(items)}
    counters = []
    for s in range(S):
        c = 0
        for it, f in counts.items():
            sign = 1 - 2 * (_h60(f"f2-{seed}-{s}-{it}") % 2)
            c += sign * f
        counters.append((s, c))
    want_est = f2_estimate_from_counters(counters, G)
    want_exact = sum(f * f for f in counts.values())

    got = f2_sketch(df, "item", n_counters=S, n_groups=G).collect()[0]
    assert got["n_items"] == 4
    assert got["exact_f2"] == want_exact
    assert got["estimate"] == want_est


def test_f2_duckdb_parity(spark, sf_dir):
    import duckdb

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("item")
    )
    got = f2_sketch(toks, "item").collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        f2_sketch_sql(
            "SELECT unnest(string_split(text, ' ')) AS item "
            "FROM documents",
            "item",
        )
    ).fetchall()[0]
    assert tuple(got) == want


def test_f2_rejects_indivisible_groups(spark, small):
    with pytest.raises(ValueError):
        f2_sketch(small, "v", n_counters=10, n_groups=4)
    with pytest.raises(ValueError):
        f2_sketch_sql("SELECT 1 AS item", n_counters=10, n_groups=4)


def test_f2_stream_state_equals_batch(spark):
    """F2State folded over three batches equals the batch counters
    bit-for-bit (linearity), the estimate agrees, and a replayed
    batch id is a strict no-op."""
    from big_data_computing__spark.operators.stats import f2_counters
    from big_data_computing__spark.streaming.frequent_stream import (
        F2State,
    )

    items = [("tok%d" % (i % 7),) for i in range(40)]
    full = spark.createDataFrame(items, "item string")
    batches = [
        spark.createDataFrame(items[i : i + 14], "item string")
        for i in range(0, 40, 14)
    ]
    st = F2State(n_counters=16, n_groups=4)
    for bid, b in enumerate(batches):
        st.update(b, bid)

    want = {
        r["s"]: r["c"]
        for r in f2_counters(full, "item", 16).collect()
    }
    assert st.counters == [want.get(s, 0) for s in range(16)]

    batch_est = f2_sketch(
        full, "item", n_counters=16, n_groups=4
    ).collect()[0]["estimate"]
    assert st.estimate() == batch_est

    before = list(st.counters)
    st.update(batches[0], 0)  # replay
    assert st.counters == before


def test_f2_join_size_pinned_and_exact(spark):
    """AMS join-size estimate re-derived with hashlib; exact side is
    the literal Σ fA·fB on a hand fixture with shared + disjoint
    items."""
    from big_data_computing__spark.operators.stats import (
        f2_join_size,
        f2_join_size_sql,
    )

    a_items = ["x"] * 4 + ["y"] * 2 + ["only_a"]
    b_items = ["x"] * 3 + ["y"] * 5 + ["only_b"] * 2
    da = spark.createDataFrame([(i,) for i in a_items], "item string")
    db = spark.createDataFrame([(i,) for i in b_items], "item string")
    S, G = 16, 4
    fa = {i: a_items.count(i) for i in set(a_items)}
    fb = {i: b_items.count(i) for i in set(b_items)}
    want_exact = sum(fa[i] * fb.get(i, 0) for i in fa)

    def counters(freqs):
        out = []
        for s in range(S):
            c = 0
            for it, f in freqs.items():
                sign = 1 - 2 * (_h60(f"f2-0-{s}-{it}") % 2)
                c += sign * f
            out.append(c)
        return out

    ca, cb = counters(fa), counters(fb)
    gsum = {}
    for s in range(S):
        gsum[s % G] = gsum.get(s % G, 0) + ca[s] * cb[s]
    gmeans = sorted((v // (S // G), g) for g, v in gsum.items())
    want_est = gmeans[(G + 1) // 2 - 1][0]

    got = f2_join_size(da, db, n_counters=S, n_groups=G).collect()[0]
    assert got["exact_join_size"] == want_exact
    assert got["estimate"] == want_est

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ta AS SELECT * FROM (VALUES "
        + ",".join(f"('{i}')" for i in a_items)
        + ") t(item)"
    )
    con.execute(
        "CREATE TABLE tb AS SELECT * FROM (VALUES "
        + ",".join(f"('{i}')" for i in b_items)
        + ") t(item)"
    )
    want = con.execute(
        f2_join_size_sql(
            "SELECT item FROM ta",
            "SELECT item FROM tb",
            "item",
            n_counters=S,
            n_groups=G,
        )
    ).fetchall()[0]
    assert (got["n_counters"], got["estimate"], got["exact_join_size"]) == want


def test_heaps_vocab_growth_hand_corpus(spark):
    """Cumulative vocabulary over prefixes computed by hand: steps
    split 4 docs into 2 prefixes; the second prefix only adds genuinely
    new tokens."""
    from big_data_computing__spark.operators.textstats import (
        heaps_vocab_growth,
    )

    rows = [
        (1, "a b"),
        (2, "b c"),
        (3, "c d"),
        (4, "a e f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["step"]: (r["n_docs"], r["vocab"])
        for r in heaps_vocab_growth(df, n_steps=2).collect()
    }
    # prefix 1 = docs 1-2: tokens {a,b,c}; prefix 2 adds {d,e,f}
    assert got == {1: (2, 3), 2: (4, 6)}


def test_heaps_vocab_growth_duckdb_parity(spark, sf_dir):
    import duckdb

    from big_data_computing__spark.operators.textstats import (
        heaps_vocab_growth,
        heaps_vocab_growth_sql,
    )

    docs = read_table(spark, sf_dir, "documents")
    got = sorted(tuple(r) for r in heaps_vocab_growth(docs).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(heaps_vocab_growth_sql()).fetchall()
    )
    assert got == want and len(got) == 10
    # the curve is monotone and ends at the full corpus vocabulary
    vocab = [v for _, _, v in got]
    assert vocab == sorted(vocab)


def test_bootstrap_stream_state_equals_batch(spark):
    """BootstrapState over three batches equals the batch CI exactly
    (weights depend only on (seed, id, rep)); replay is a no-op."""
    from big_data_computing__spark.operators.stats import (
        poisson_bootstrap_ci,
    )
    from big_data_computing__spark.streaming.frequent_stream import (
        BootstrapState,
    )

    rows = [(i, (i * 13) % 50 + 1) for i in range(30)]
    full = spark.createDataFrame(rows, "id long, v long")
    batches = [
        spark.createDataFrame(rows[i : i + 10], "id long, v long")
        for i in range(0, 30, 10)
    ]
    st = BootstrapState("v", "id", n_replicates=32)
    for bid, b in enumerate(batches):
        st.update(b, bid)
    want = poisson_bootstrap_ci(
        full, "v", "id", n_replicates=32
    ).collect()[0]
    point, lo, hi = st.estimate()
    assert (point, lo, hi) == (
        want["point_milli"],
        want["lo_milli"],
        want["hi_milli"],
    )
    assert st.n_rows == want["n_rows"]
    before = (list(st.s), list(st.n), st.n_rows, st.sum_v)
    st.update(batches[1], 1)
    assert before == (list(st.s), list(st.n), st.n_rows, st.sum_v)


def test_bootstrap_by_group_consistent_with_global(spark):
    """Per-group CI on a single-group input equals the global CI; on
    two groups each group's output matches running the operator on
    that group alone (group draws are independent by construction:
    the weight key is (seed, id, rep), not the group)."""
    from big_data_computing__spark.operators.stats import (
        poisson_bootstrap_ci,
        poisson_bootstrap_ci_by,
    )

    rows = [(i, (i * 7) % 40 + 1, "g%d" % (i % 2)) for i in range(24)]
    df = spark.createDataFrame(rows, "id long, v long, grp string")
    by = {
        r["grp"]: (
            r["n_rows"], r["point_milli"], r["lo_milli"], r["hi_milli"]
        )
        for r in poisson_bootstrap_ci_by(
            df, "v", "id", "grp", n_replicates=32
        ).collect()
    }
    assert set(by) == {"g0", "g1"}
    for g in ("g0", "g1"):
        solo = poisson_bootstrap_ci(
            df.where(F.col("grp") == g), "v", "id", n_replicates=32
        ).collect()[0]
        assert by[g] == (
            solo["n_rows"],
            solo["point_milli"],
            solo["lo_milli"],
            solo["hi_milli"],
        )


def test_aqp_group_counts_properties(spark, sf_dir):
    """HT estimates bracket the exact counts within the reported CI
    for most groups, the estimator is exactly count·1000//p on the
    deterministic sample, and sampling is reproducible."""
    from big_data_computing__spark.operators.stats import (
        aqp_group_count_ci,
    )

    ev = read_table(spark, sf_dir, "events")
    out = {
        r["event_type"]: r
        for r in aqp_group_count_ci(
            ev, "event_type", "event_id", p_milli=200
        ).collect()
    }
    assert out
    n_cover = 0
    for g, r in out.items():
        assert r["exact_count"] > 0
        if r["lo_count"] is not None:
            assert r["lo_count"] <= r["est_count"] <= r["hi_count"]
            if r["lo_count"] <= r["exact_count"] <= r["hi_count"]:
                n_cover += 1
    # a 95% CI over a 20% sample should cover the truth for most
    # groups (5 groups; allow one miss)
    assert n_cover >= len(out) - 1

    again = {
        r["event_type"]: tuple(r)
        for r in aqp_group_count_ci(
            ev, "event_type", "event_id", p_milli=200
        ).collect()
    }
    assert {g: tuple(r) for g, r in out.items()} == again


# ---------------------------------------------------------------------------
# degenerate-prefix / tiny-group contracts (round-7 advice): small
# groups must never vanish, empty prefixes must be explicit, and the
# driver fold must use the engines' truncating division.
# ---------------------------------------------------------------------------


def test_bootstrap_by_group_keeps_one_row_groups(spark):
    from big_data_computing__spark.operators.stats import (
        poisson_bootstrap_ci_by,
        poisson_bootstrap_ci_by_sql,
    )

    # one group with plenty of rows, one group with a single row: at
    # R=200 the singleton draws w=0 in ~37% of replicates, shifting
    # ranks past the old fixed hi_rk — the group used to disappear
    rows = [(i, "big", 10 + (i % 3)) for i in range(60)]
    rows.append((999, "tiny", 7))
    df = spark.createDataFrame(rows, "id long, src string, v long")
    got = {
        r["src"]: r
        for r in poisson_bootstrap_ci_by(df, "v", "id", "src").collect()
    }
    assert set(got) == {"big", "tiny"}
    t = got["tiny"]
    assert t["n_rows"] == 1 and t["point_milli"] == 7000
    # the singleton's surviving replicate means are all exactly 7000
    assert t["lo_milli"] == 7000 and t["hi_milli"] == 7000

    # DuckDB twin agrees row-for-row
    import duckdb

    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = {
        r[0]: r
        for r in con.execute(
            poisson_bootstrap_ci_by_sql("SELECT * FROM t", "v", "id", "src")
        ).fetchall()
    }
    assert set(duck) == {"big", "tiny"}
    for k in got:
        s = got[k]
        assert (
            s["n_rows"], s["point_milli"], s["lo_milli"], s["hi_milli"]
        ) == tuple(duck[k][1:])


def test_bootstrap_from_sums_degenerate_prefixes():
    from big_data_computing__spark.operators.stats import (
        bootstrap_ci_from_sums,
    )

    with pytest.raises(ValueError, match="empty prefix"):
        bootstrap_ci_from_sums([], 0, 0, 200)
    # all replicates drew zero weight: point survives, CIs are null
    point, lo, hi = bootstrap_ci_from_sums(
        [(r, 0, 0) for r in range(200)], 3, 21, 200
    )
    assert (point, lo, hi) == (7000, None, None)
    # surviving < nominal hi_rk must not IndexError: 4 survivors
    sums = [(0, 10, 2), (1, 9, 2), (2, 11, 2), (3, 10, 2)]
    sums += [(r, 0, 0) for r in range(4, 200)]
    point, lo, hi = bootstrap_ci_from_sums(sums, 2, 10, 200)
    assert lo == 4500 and hi == 5500  # ranks 1 and 4 of the survivors


def test_bootstrap_trunc_division_matches_engines(spark):
    """Negative-valued metrics: Python // floors, Spark div and DuckDB
    // truncate toward zero — the fold must truncate."""
    from big_data_computing__spark.operators.stats import (
        bootstrap_ci_from_sums,
        bootstrap_replicate_sums,
        poisson_bootstrap_ci,
        poisson_bootstrap_ci_sql,
    )

    df = spark.createDataFrame(
        [(1, -1), (2, -2), (3, 4)], "id long, v long"
    )
    batch = poisson_bootstrap_ci(df, "v", "id").collect()[0]
    sums = [
        (r["rep"], int(r["s"]), int(r["n"]))
        for r in bootstrap_replicate_sums(df, "v", "id", 200).collect()
    ]
    point, lo, hi = bootstrap_ci_from_sums(sums, 3, 1, 200)
    assert point == batch["point_milli"] == 333  # trunc(1000/3), not 333.33 floored from negative
    assert lo == batch["lo_milli"] and hi == batch["hi_milli"]

    import duckdb

    con = duckdb.connect()
    con.register("t", df.toPandas())
    drow = con.execute(
        poisson_bootstrap_ci_sql("SELECT * FROM t", "v", "id")
    ).fetchall()[0]
    assert drow[1] == point and drow[2] == lo and drow[3] == hi


def test_bootstrap_empty_input_emits_no_row(spark):
    from big_data_computing__spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([], "id long, v long")
    assert poisson_bootstrap_ci(df, "v", "id").count() == 0


def test_ks_drift_exact_small_case(spark):
    """Hand-checkable KS: base = {1,2,3,4}, comp = {3,4,5,6} — the
    CDF gap peaks at value 2 (F_base=0.5, F_comp=0) => KS = 0.5."""
    from big_data_computing__spark.operators.stats import (
        ks_drift,
        ks_drift_sql,
    )

    rows = [(float(v), "a") for v in (1, 2, 3, 4)]
    rows += [(float(v), "b") for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = ks_drift(df, "value", "grp", "a").collect()[0]
    assert got["n_base"] == 4 and got["n_comp"] == 4
    assert got["ks_milli"] == 500
    assert got["at_value"] == 2.0

    import duckdb

    con = duckdb.connect()
    con.register("t", df.toPandas())
    drow = con.execute(
        ks_drift_sql("SELECT * FROM t", "value", "grp", "a")
    ).fetchall()[0]
    assert drow == (4, 4, 500, 2.0)


def test_ks_drift_identical_slices_is_zero(spark):
    from big_data_computing__spark.operators.stats import ks_drift

    rows = [(float(v), g) for v in range(10) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = ks_drift(df, "value", "grp", "a").collect()[0]
    assert got["ks_milli"] == 0


def test_ks_drift_stream_state_equals_batch(spark, sf_dir):
    """KSDriftState folded over micro-batch chunks of the events table
    equals the batch ks_drift over the union bit-for-bit after every
    prefix that has both slices; replayed batch ids are no-ops; empty
    slices raise."""
    from big_data_computing__spark.operators.stats import ks_drift
    from big_data_computing__spark.streaming.frequent_stream import (
        KSDriftState,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    rows = ev.orderBy("event_id").collect()
    chunks = [rows[i : i + 400] for i in range(0, len(rows), 400)]
    schema = "event_id long, event_type string, value double"
    st = KSDriftState("value", "event_type", "purchase")
    seen: list = []
    for bid, chunk in enumerate(chunks):
        st.update(spark.createDataFrame(chunk, schema), bid)
        seen.extend(chunk)
        prefix = spark.createDataFrame(seen, schema)
        want = ks_drift(
            prefix, "value", "event_type", "purchase"
        ).collect()[0]
        got = st.estimate()
        assert got == (
            want["n_base"],
            want["n_comp"],
            want["ks_milli"],
            want["at_value"],
        )
    before = dict(st.counts)
    st.update(spark.createDataFrame(chunks[0], schema), 0)  # replay
    assert st.counts == before

    empty = KSDriftState("value", "event_type", "purchase")
    with pytest.raises(ValueError, match="undefined"):
        empty.estimate()
