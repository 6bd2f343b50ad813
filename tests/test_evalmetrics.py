"""Exact evaluation metrics (operators/stats.py auc_*).

The Mann-Whitney AUC is pinned three ways, house style: brute-force
pair counting on a hand fixture (independent of the prefix-sum
machinery), closed-form extremes (perfect / inverted / uninformative
rankers), and the DuckDB twin on the sf0.001 corpus join used by the
registered x_auc_quality query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.curation import (
    gopher_quality_report,
    gopher_quality_report_sql,
)
from big_data_computing__spark.operators.regression import (
    ridge_quality_scores,
    ridge_quality_scores_sql,
)
from big_data_computing__spark.operators.stats import (
    auc_by,
    auc_by_sql,
    auc_report,
    auc_report_sql,
)
from big_data_computing__spark.sources.readers import read_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _brute_auc_micro(pairs: list[tuple[int, bool]]) -> tuple:
    """Pair-counting Mann-Whitney: wins + half-ties over pos×neg."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    u_x2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    return (
        len(pos),
        len(neg),
        (1_000_000 * u_x2) // (2 * len(pos) * len(neg)),
    )


@pytest.fixture(scope="module")
def hand(spark):
    # ties across and within classes, duplicate scores, negatives
    rows = [
        (0, 5, True),
        (1, 3, True),
        (2, 3, False),
        (3, 1, False),
        (4, 5, True),
        (5, -2, False),
        (6, 1, True),
        (7, 3, False),
        (8, 9, False),
    ]
    return spark.createDataFrame(rows, "id long, s long, y boolean")


def test_auc_matches_brute_force(spark, hand):
    got = auc_report(hand, "s", "y").collect()[0]
    rows = [(r.s, r.y) for r in hand.collect()]
    n_pos, n_neg, micro = _brute_auc_micro(rows)
    assert (got.n_pos, got.n_neg, got.auc_micro) == (n_pos, n_neg, micro)


def test_auc_extremes(spark):
    perfect = spark.createDataFrame(
        [(i, i, i >= 3) for i in range(6)], "id long, s long, y boolean"
    )
    assert auc_report(perfect, "s", "y").collect()[0].auc_micro == 1_000_000
    inverted = spark.createDataFrame(
        [(i, -i, i >= 3) for i in range(6)], "id long, s long, y boolean"
    )
    assert auc_report(inverted, "s", "y").collect()[0].auc_micro == 0
    # constant score: every pair is a tie -> exactly 1/2
    flat = spark.createDataFrame(
        [(i, 7, i % 2 == 0) for i in range(6)], "id long, s long, y boolean"
    )
    assert auc_report(flat, "s", "y").collect()[0].auc_micro == 500_000


def test_auc_by_matches_global_per_group(spark, hand):
    two = hand.withColumn("g", (hand.id % 2 == 0).cast("string"))
    per = {
        r.g: (r.n_pos, r.n_neg, r.auc_micro)
        for r in auc_by(two, "s", "y", "g").collect()
    }
    for gval in ("true", "false"):
        solo = auc_report(two.where(two.g == gval), "s", "y").collect()[0]
        assert per[gval] == (solo.n_pos, solo.n_neg, solo.auc_micro)


def test_auc_by_degenerate_group_is_null(spark):
    rows = [(0, 1, True, "a"), (1, 2, True, "a"), (2, 1, False, "b"),
            (3, 5, True, "b")]
    df = spark.createDataFrame(rows, "id long, s long, y boolean, g string")
    out = {r.g: r for r in auc_by(df, "s", "y", "g").collect()}
    assert out["a"].auc_micro is None  # no negatives: AUC undefined
    assert out["a"].n_pos == 2 and out["a"].n_neg == 0
    assert out["b"].auc_micro == 1_000_000


def test_auc_duckdb_parity(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    scores = ridge_quality_scores(docs).select("doc_id", "score")
    gate = gopher_quality_report(docs).select("doc_id", "passes")
    got = auc_report(scores.join(gate, "doc_id"), "score", "passes")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.execute(
        auc_report_sql(
            f"SELECT s.score, g.passes "
            f"FROM ({ridge_quality_scores_sql()}) s "
            f"JOIN ({gopher_quality_report_sql()}) g USING (doc_id)",
            "score",
            "passes",
        )
    ).fetchall()
    assert [tuple(r) for r in got.collect()] == want
    # grouped twin on the same join
    got_by = auc_by(
        docs.select("doc_id", "lang")
        .join(scores, "doc_id")
        .join(gate, "doc_id"),
        "score",
        "passes",
        "lang",
    )
    want_by = con.execute(
        auc_by_sql(
            f"SELECT d.lang, s.score, g.passes FROM documents d "
            f"JOIN ({ridge_quality_scores_sql()}) s USING (doc_id) "
            f"JOIN ({gopher_quality_report_sql()}) g USING (doc_id)",
            "score",
            "passes",
            "lang",
        )
        + " ORDER BY 1"
    ).fetchall()
    assert sorted(tuple(r) for r in got_by.collect()) == want_by


# ---------------------------------------------------------------------------
# retrieval_eval (operators/retrieval.py)
# ---------------------------------------------------------------------------

from big_data_computing__spark.operators.retrieval import (  # noqa: E402
    _disc_micro,
    retrieval_eval,
    retrieval_eval_sql,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, score double"
    )


def test_retrieval_eval_perfect(spark):
    truth = _mk(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 20, 0.7)])
    got = retrieval_eval(truth, truth, k=3).collect()[0]
    assert got.n_queries == 2 and got.total_hits == 3
    assert got.recall_milli == 1000
    assert got.mrr_micro == 1_000_000
    assert got.ndcg_micro == 1_000_000


def test_retrieval_eval_hand_computed(spark):
    # q1: truth {10,11}, result hits 11 at rank 2 only.
    # q2: truth {20}, result misses entirely.
    truth = _mk(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 20, 0.7)])
    res = _mk(spark, [(1, 99, 0.9), (1, 11, 0.5), (2, 98, 0.6)])
    got = retrieval_eval(res, truth, k=3).collect()[0]
    d = _disc_micro(3)
    assert got.n_queries == 2
    assert got.total_hits == 1
    assert got.recall_milli == (1000 * 1) // 3
    assert got.mrr_micro == (1_000_000 // 2) // 2
    # DCG: q1 = disc[2] (hit at rank 2), q2 = 0
    # IDCG: q1 = d1+d2 (2 truths), q2 = d1
    assert got.ndcg_micro == (1_000_000 * d[1]) // (d[0] + d[1] + d[0])


def test_retrieval_eval_query_universe_from_truth(spark):
    # a query present only in the result must NOT count
    truth = _mk(spark, [(1, 10, 0.9)])
    res = _mk(spark, [(1, 10, 0.9), (7, 70, 0.5)])
    got = retrieval_eval(res, truth, k=3).collect()[0]
    assert got.n_queries == 1 and got.recall_milli == 1000


def test_retrieval_eval_duckdb_parity(spark, sf_dir):
    from big_data_computing__spark.operators.similarity import (
        cosine_topk,
        cosine_topk_sql,
        hamming_topk,
        hamming_topk_sql,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 10 == 0)
    res = hamming_topk(emb, queries=q, k=3).select(
        "query_id", "vec_id", (-F.col("hamming")).alias("score")
    )
    got = retrieval_eval(res, cosine_topk(emb, queries=q, k=3), k=3)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.execute(
        retrieval_eval_sql(
            "SELECT query_id, vec_id, -hamming AS score FROM ("
            + hamming_topk_sql(64, 3, query_filter="qid % 10 = 0")
            + ")",
            cosine_topk_sql(3, query_filter="qid % 10 = 0"),
            3,
        )
    ).fetchall()
    assert [tuple(r) for r in got.collect()] == want


# ---------------------------------------------------------------------------
# ht_total (operators/stats.py) + conformal_coverage (regression.py)
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402

from big_data_computing__spark.operators.stats import (  # noqa: E402
    HT_SEED,
    ht_total,
)


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def test_ht_rate_one_is_exact(spark):
    rows = [(i, "s", float(i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, st string, v double")
    out = ht_total(df, "v", "st", "id", rates={"s": (1, 1)}).collect()[0]
    assert out.n_sampled == out.n_rows == 20
    assert out.est_cents == out.exact_cents
    assert out.err_milli == 0


def test_ht_matches_pure_python(spark):
    rates = {"a": (1, 2), "b": (1, 4)}
    rows = [(i, "a" if i % 2 else "b", float(i * 3 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, st string, v double")
    got = {r.stratum: r for r in ht_total(df, "v", "st", "id", rates=rates).collect()}
    for s, (num, den) in rates.items():
        thresh = (num << 60) // den
        sampled = [
            round(v * 100)
            for i, st, v in rows
            if st == s and _h60(f"{HT_SEED}:{i}") < thresh
        ]
        exact = sum(round(v * 100) for i, st, v in rows if st == s)
        est = (den * sum(sampled)) // num
        assert got[s].n_sampled == len(sampled)
        assert got[s].exact_cents == exact
        assert got[s].est_cents == est


def test_ht_unknown_stratum_excluded(spark):
    rows = [(1, "a", 5.0), (2, "zzz", 7.0)]
    df = spark.createDataFrame(rows, "id long, st string, v double")
    out = ht_total(df, "v", "st", "id", rates={"a": (1, 1)}).collect()
    assert [r.stratum for r in out] == ["a"]


def test_conformal_guarantee_and_parity(spark, sf_dir):
    from big_data_computing__spark.operators.regression import (
        conformal_coverage_report,
        conformal_coverage_report_sql,
    )

    docs = read_table(spark, sf_dir, "documents")
    got = conformal_coverage_report(docs).collect()[0]
    # distribution-free guarantee: coverage >= 1 - alpha up to
    # finite-sample noise; assert the audit is in the right regime
    # (a broken q-hat lands near 0 or at 1000-with-huge-q)
    assert 850 <= got.coverage_milli <= 1000
    assert got.n_cal + got.n_test == docs.count()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.execute(conformal_coverage_report_sql()).fetchall()[0]
    assert tuple(got) == tuple(want)


def test_conformal_clamps_tiny_calibration(spark):
    # < 1/alpha - 1 calibration rows: k = ceil((n+1)(1-a)) > n clamps
    rows = [
        (i, "w " * (i + 2) + "the quick brown fox jumps over it all")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from big_data_computing__spark.operators.regression import (
        conformal_coverage_report,
    )

    out = conformal_coverage_report(docs).collect()
    assert len(out) == 1  # one summary row, q-hat = max residual


# ---------------------------------------------------------------------------
# gini_by (stats.py) + kmv_set_ops (frequent.py)
# ---------------------------------------------------------------------------

from big_data_computing__spark.operators.frequent import (  # noqa: E402
    kmv_set_ops,
)
from big_data_computing__spark.operators.stats import gini_by  # noqa: E402


def test_gini_extremes(spark):
    rows = [(i, "eq", 5) for i in range(10)] + [
        (10 + i, "conc", 100 if i == 0 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r.g: r.gini_milli for r in gini_by(df, "v", "g", "id").collect()}
    assert got["eq"] == 0
    # one holder of all mass among n: G = (n-1)/n = 0.9
    assert got["conc"] == 900


def test_gini_matches_pure_python(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v long"
    )
    got = gini_by(df, "v", "g", "id").collect()[0]
    sv = sorted(vals)
    n, s = len(sv), sum(sv)
    want = (1000 * (2 * sum((i + 1) * w for i, w in enumerate(sv))
                    - (n + 1) * s)) // (n * s)
    assert got.gini_milli == want and got.n == n and got.total == s


def test_gini_drops_zero_total_and_negatives(spark):
    rows = [(0, "z", 0), (1, "z", 0), (2, "m", -5), (3, "m", 10)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r.g: r for r in gini_by(df, "v", "g", "id").collect()}
    assert "z" not in got          # zero mass: undefined, dropped
    assert got["m"].n == 1         # negative weight filtered out


def test_kmv_setops_exact_when_small(spark):
    # below k the sketches are the sets: algebra must be exact
    a_items = [f"a{i}" for i in range(30)]
    shared = [f"s{i}" for i in range(10)]
    b_items = [f"b{i}" for i in range(20)]
    rows = [("A", it) for it in a_items + shared] + [
        ("B", it) for it in b_items + shared
    ]
    df = spark.createDataFrame(rows, "label string, item string")
    got = kmv_set_ops(df, "label", "A", "B").collect()[0]
    assert (got.est_a, got.est_b, got.est_union, got.est_intersect) == (
        40, 30, 60, 10,
    )
    assert (got.est_diff_a, got.est_diff_b) == (30, 20)


def test_kmv_setops_union_consistency(spark, sf_dir):
    # sketch-union estimate == kmv_estimate run on the concatenation
    from big_data_computing__spark.operators.frequent import kmv_estimate
    from big_data_computing__spark.operators.textstats import tokens

    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("lang").alias("label"),
        F.explode(tokens(F.col("text"))).alias("item"),
    )
    got = kmv_set_ops(d, "label", "en", "de").collect()[0]
    both = kmv_estimate(
        d.where(F.col("label").isin(["en", "de"])).select("item")
    ).collect()[0]
    assert got.est_union == both.estimate
    assert got.est_intersect >= 0


def test_auc_stream_state_equals_batch(spark, sf_dir):
    """AucState folded over micro-batch chunks equals the batch
    auc_report over the union bit-for-bit after every prefix with both
    classes; replays are no-ops; single-class prefixes raise."""
    from big_data_computing__spark.streaming.frequent_stream import (
        AucState,
    )

    docs = read_table(spark, sf_dir, "documents")
    scored = (
        ridge_quality_scores(docs)
        .select("doc_id", "score")
        .join(
            gopher_quality_report(docs).select("doc_id", "passes"),
            "doc_id",
        )
    )
    rows = scored.orderBy("doc_id").collect()
    chunks = [rows[i : i + 100] for i in range(0, len(rows), 100)]
    schema = "doc_id long, score double, passes boolean"
    st = AucState("score", "passes")
    seen: list = []
    for bid, chunk in enumerate(chunks):
        st.update(spark.createDataFrame(chunk, schema), bid)
        seen.extend(chunk)
        prefix = spark.createDataFrame(seen, schema)
        want = auc_report(prefix, "score", "passes").collect()[0]
        assert st.estimate() == (
            want["n_pos"], want["n_neg"], want["auc_micro"],
        )
    before = {k: list(v) for k, v in st.counts.items()}
    st.update(spark.createDataFrame(chunks[0], schema), 0)  # replay
    assert st.counts == before

    empty = AucState("score", "passes")
    with pytest.raises(ValueError, match="undefined"):
        empty.estimate()


# ---------------------------------------------------------------------------
# corr_matrix_signed_r2 / trimmed_mean (stats.py), bigram_lift (textstats)
# ---------------------------------------------------------------------------

from big_data_computing__spark.operators.stats import (  # noqa: E402
    corr_matrix_signed_r2,
    trimmed_mean,
)


def test_corr_signed_r2_hand(spark):
    # y = 2x exactly -> +1000; z = -x -> -1000; w constant -> NULL
    rows = [(i, i, 2 * i, -i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long, w long")
    got = {
        (r.col_a, r.col_b): r.r2_milli
        for r in corr_matrix_signed_r2(df, ["x", "y", "z", "w"]).collect()
    }
    assert got[("x", "y")] == 1000
    assert got[("x", "z")] == -1000
    assert got[("y", "z")] == -1000
    assert got[("x", "w")] is None and got[("z", "w")] is None
    assert len(got) == 6


def test_corr_signed_r2_matches_pure_python(spark):
    import random

    rng = random.Random(7)
    vals = [(i, rng.randrange(100), rng.randrange(100)) for i in range(50)]
    df = spark.createDataFrame(vals, "id long, a long, b long")
    got = corr_matrix_signed_r2(df, ["a", "b"]).collect()[0]
    n = len(vals)
    sa = sum(v[1] for v in vals)
    sb = sum(v[2] for v in vals)
    qab = sum(v[1] * v[2] for v in vals)
    qaa = sum(v[1] ** 2 for v in vals)
    qbb = sum(v[2] ** 2 for v in vals)
    cov = n * qab - sa * sb
    va, vb = n * qaa - sa * sa, n * qbb - sb * sb
    want = (1 if cov >= 0 else -1) * ((1000 * cov * cov) // (va * vb))
    assert got.r2_milli == want


def test_trimmed_mean_hand(spark):
    # one huge outlier: the 10% trim must remove it
    vals = [10] * 18 + [10, 100000]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = trimmed_mean(df, "v", "id", trim_permille=100).collect()[0]
    assert got.n_total == 20 and got.n_kept == 16
    assert got.trimmed_mean_cents == 10
    assert got.mean_cents == sum(vals) // 20


def test_trimmed_mean_rejects_total_trim(spark):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError, match="discard every row"):
        trimmed_mean(df, "v", "id", trim_permille=500)


def test_bigram_lift_hand(spark):
    from big_data_computing__spark.operators.textstats import (
        bigram_lift_top,
    )

    # "alpha beta" always together (lift max); "the xx" spread out
    text = " ".join(["alpha beta the one", "alpha beta the two",
                     "alpha beta the six"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r.bigram: r for r in bigram_lift_top(docs, min_count=3).collect()
    }
    ab = got["alpha beta"]
    # N=11 bigram positions, c(alpha,.)=3, c(.,beta)=3, c_uv=3
    assert (ab.c_uv, ab.c_u, ab.c_v) == (3, 3, 3)
    assert ab.lift_milli == (1000 * 11 * 3) // 9


def test_ht_stream_state_equals_batch(spark, sf_dir):
    """HtState folded over micro-batch chunks of the orders table
    equals the batch ht_total over the union bit-for-bit after every
    prefix; replays are no-ops."""
    from big_data_computing__spark.streaming.frequent_stream import (
        HtState,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    rows = orders.orderBy("o_orderkey").collect()
    chunks = [rows[i : i + 250] for i in range(0, len(rows), 250)]
    schema = (
        "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    st = HtState("o_totalprice", "o_orderpriority", "o_orderkey")
    seen: list = []
    for bid, chunk in enumerate(chunks):
        st.update(spark.createDataFrame(chunk, schema), bid)
        seen.extend(chunk)
        prefix = spark.createDataFrame(seen, schema)
        want = sorted(
            tuple(r)
            for r in ht_total(
                prefix, "o_totalprice", "o_orderpriority", "o_orderkey"
            ).collect()
        )
        assert st.estimate() == want
    before = {k: list(v) for k, v in st.sums.items()}
    st.update(spark.createDataFrame(chunks[0], schema), 0)  # replay
    assert st.sums == before


def test_chi2_independence_hand(spark):
    from big_data_computing__spark.operators.stats import (
        chi2_independence,
    )

    # perfectly independent 2x2: chi2 exactly 0
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 10
        + [("b", "x")] * 30 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "u string, v string")
    got = chi2_independence(df, "u", "v").collect()[0]
    assert (got.n, got.n_cells, got.dof, got.chi2_micro) == (80, 4, 1, 0)
    # perfectly dependent 2x2 (diagonal): chi2 = n
    rows = [("a", "x")] * 25 + [("b", "y")] * 25
    df = spark.createDataFrame(rows, "u string, v string")
    got = chi2_independence(df, "u", "v").collect()[0]
    assert got.chi2_micro == 50 * 1_000_000
    assert got.v2_micro == 1_000_000  # perfect association: V^2 = 1
    # structural zero counted: 2x2 with one absent cell still has
    # n_cells = 4 (margins cross product, not observed pairs)
    rows = [("a", "x")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, v string")
    got = chi2_independence(df, "u", "v").collect()[0]
    assert got.n_cells == 4 and got.chi2_micro > 0


def test_conformal_by_lang_guarantee(spark, sf_dir):
    from big_data_computing__spark.operators.regression import (
        conformal_coverage_by,
    )

    docs = read_table(spark, sf_dir, "documents")
    out = conformal_coverage_by(docs).collect()
    assert len(out) >= 2  # multiple language slices present
    for r in out:
        # group-conditional guarantee, generous finite-sample slack
        # (slices are small at sf0.001)
        assert r.coverage_milli >= 750
        assert r.n_cal > 0 and r.n_test > 0


def test_pair_set_eval_hand(spark):
    from big_data_computing__spark.operators.dedup import pair_set_eval

    tru = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    res = spark.createDataFrame(
        [(1, 2), (1, 2), (7, 8)], "doc_a long, doc_b long"  # dup pair
    )
    got = pair_set_eval(res, tru).collect()[0]
    assert (got.n_truth, got.n_result, got.n_hit) == (3, 2, 1)
    assert got.precision_milli == 500
    assert got.recall_milli == 333
    assert got.f1_milli == 2000 // 5
    # empty truth: NULL recall, not a fake perfect score
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = pair_set_eval(res, empty).collect()[0]
    assert got.recall_milli is None and got.precision_milli == 0


def test_bcubed_hand(spark):
    from big_data_computing__spark.operators.dedup import bcubed_eval

    def mk(assign):
        return spark.createDataFrame(assign, "doc_id long, cluster long")

    truth = mk([(1, 1), (2, 1), (3, 3), (4, 3)])
    # identical clustering: all three metrics exactly 1
    got = bcubed_eval(truth, truth).collect()[0]
    assert (
        got.bcubed_precision_micro,
        got.bcubed_recall_micro,
        got.bcubed_f1_micro,
    ) == (1_000_000, 1_000_000, 1_000_000)
    # everything merged into one cluster: precision penalized
    # per-doc |C∩T|/|C| = 2/4 -> 0.5; recall perfect
    merged = mk([(1, 1), (2, 1), (3, 1), (4, 1)])
    got = bcubed_eval(merged, truth).collect()[0]
    assert got.bcubed_precision_micro == 500_000
    assert got.bcubed_recall_micro == 1_000_000
    # all singletons: precision perfect, recall 1/2
    single = mk([(1, 1), (2, 2), (3, 3), (4, 4)])
    got = bcubed_eval(single, truth).collect()[0]
    assert got.bcubed_precision_micro == 1_000_000
    assert got.bcubed_recall_micro == 500_000
    # f1 = harmonic mean of the micro values
    assert got.bcubed_f1_micro == (
        2 * 1_000_000 * 500_000
    ) // 1_500_000


def test_bcubed_transitive_merge_penalty(spark):
    """One false pair gluing two big clusters must cost more under
    B-cubed than under pair-level metrics — the metric's raison
    d'etre."""
    from big_data_computing__spark.operators.dedup import (
        bcubed_eval,
        full_assignment,
        pair_set_eval,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    # truth: {1..4}, {5..8}
    tpairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8)],
        "doc_a long, doc_b long",
    )
    # candidate: same pairs PLUS one false bridge 4-5
    cpairs = tpairs.union(
        spark.createDataFrame([(4, 5)], "doc_a long, doc_b long")
    )
    pair_p = pair_set_eval(cpairs, tpairs).collect()[0].precision_milli
    got = bcubed_eval(
        full_assignment(docs, cpairs), full_assignment(docs, tpairs)
    ).collect()[0]
    # pair precision: 6/7 ~ 857 milli; B-cubed precision: every doc's
    # cluster doubled -> 4/8 = 500 milli. The transitive damage shows.
    assert pair_p == 857
    assert got.bcubed_precision_micro == 500_000
    assert got.bcubed_recall_micro == 1_000_000


def test_gini_stream_state_equals_batch(spark, sf_dir):
    """GiniState folded over micro-batch chunks equals batch gini_by
    after every prefix; replays are no-ops."""
    from big_data_computing__spark.streaming.frequent_stream import (
        GiniState,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rows = docs.orderBy("doc_id").collect()
    chunks = [rows[i : i + 120] for i in range(0, len(rows), 120)]
    schema = "doc_id long, source string, n_chars long"
    st = GiniState("n_chars", "source")
    seen: list = []
    for bid, chunk in enumerate(chunks):
        st.update(spark.createDataFrame(chunk, schema), bid)
        seen.extend(chunk)
        prefix = spark.createDataFrame(seen, schema)
        want = sorted(
            tuple(r)
            for r in gini_by(prefix, "n_chars", "source", "doc_id")
            .collect()
        )
        assert st.estimate() == want
    before = dict(st.counts)
    st.update(spark.createDataFrame(chunks[0], schema), 0)
    assert st.counts == before


def test_pr_curve_hand(spark):
    from big_data_computing__spark.operators.stats import pr_curve

    # scores 10..1 (distinct), positives = the top 3 scores
    rows = [(i, 10 - i, i < 3) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    got = {r.point: r for r in pr_curve(df, "s", "y", n_points=5).collect()}
    assert len(got) == 5
    # point 1 = top 2 docs: both positive
    assert (got[1].n_pred_pos, got[1].n_tp) == (2, 2)
    assert got[1].precision_milli == 1000
    assert got[1].recall_milli == (1000 * 2) // 3
    # point 5 = whole corpus: recall 1, precision 3/10
    assert (got[5].n_pred_pos, got[5].n_tp) == (10, 3)
    assert got[5].precision_milli == 300
    assert got[5].recall_milli == 1000
    assert got[5].f1_milli == (2000 * 3) // 13


def test_pr_curve_tie_run_reports_whole(spark):
    from big_data_computing__spark.operators.stats import pr_curve

    # all ten rows share one score: every cut crosses inside the tie
    # run, so every point reports the full corpus
    rows = [(i, 7, i < 4) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    got = pr_curve(df, "s", "y", n_points=4).collect()
    assert len(got) == 4
    for r in got:
        assert (r.n_pred_pos, r.n_tp) == (10, 4)


def test_mutual_knn_reciprocity(spark, sf_dir):
    from big_data_computing__spark.operators.similarity import (
        cosine_topk,
        mutual_knn_pairs,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = mutual_knn_pairs(emb, k=3)
    topk = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, k=3).collect()
    }
    rows = pairs.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.vec_a < r.vec_b
        # reciprocity: both directions present in the top-k table
        assert (r.vec_a, r.vec_b) in topk and (r.vec_b, r.vec_a) in topk
    # completeness: every reciprocal top-k pair is reported
    want = {
        (a, b) for (a, b) in topk if a < b and (b, a) in topk
    }
    assert {(r.vec_a, r.vec_b) for r in rows} == want


def test_cvm_drift_properties(spark):
    from big_data_computing__spark.operators.stats import cvm_drift

    # identical distributions: gap zero everywhere -> statistic 0
    rows = [
        (float((i // 2) % 10), "a" if i % 2 else "b") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = cvm_drift(df, "value", "grp", "a").collect()[0]
    assert got.cvm_micro == 0
    # disjoint supports: maximal integrated gap; pure-python check
    rows = [(float(i), "a") for i in range(10)] + [
        (float(100 + i), "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = cvm_drift(df, "value", "grp", "a").collect()[0]
    n = m = 10
    N = n + m
    u = 0
    # values 0..9: ca = i+1, cb = 0; values 100..109: ca = 10, cb = j+1
    for i in range(10):
        u += 1 * ((i + 1) * m - 0 * n) ** 2
    for j in range(10):
        u += 1 * (10 * m - (j + 1) * n) ** 2
    assert got.cvm_micro == (1_000_000 * u) // (N * N * n * m)


def test_cvm_stream_state_equals_batch(spark, sf_dir):
    from big_data_computing__spark.operators.stats import cvm_drift
    from big_data_computing__spark.streaming.frequent_stream import (
        CvmDriftState,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    rows = ev.orderBy("event_id").collect()
    chunks = [rows[i : i + 400] for i in range(0, len(rows), 400)]
    schema = "event_id long, event_type string, value double"
    st = CvmDriftState("value", "event_type", "purchase")
    seen: list = []
    for bid, chunk in enumerate(chunks):
        st.update(spark.createDataFrame(chunk, schema), bid)
        seen.extend(chunk)
        want = cvm_drift(
            spark.createDataFrame(seen, schema),
            "value",
            "event_type",
            "purchase",
        ).collect()[0]
        assert st.estimate() == (
            want["n_base"], want["n_comp"], want["cvm_micro"],
        )
    empty = CvmDriftState("value", "event_type", "purchase")
    with pytest.raises(ValueError, match="undefined"):
        empty.estimate()


def test_random_walks_structure(spark):
    from big_data_computing__spark.operators.dedup import random_walks

    # path graph 1-2-3-4: every walk must follow edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    walks = random_walks(pairs, length=3).collect()
    by_start = {}
    for r in walks:
        by_start.setdefault(r.start, {})[r.step] = r.node
    edges = {(1, 2), (2, 3), (3, 4), (2, 1), (3, 2), (4, 3)}
    assert set(by_start) == {1, 2, 3, 4}
    for s0, steps in by_start.items():
        assert steps[0] == s0
        for t in range(1, len(steps)):
            assert (steps[t - 1], steps[t]) in edges  # legal moves only
        assert len(steps) == 4  # no dead ends on a connected graph


def test_random_walks_deterministic_and_seeded(spark):
    from big_data_computing__spark.operators.dedup import random_walks

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "doc_a long, doc_b long"
    )
    a = sorted(tuple(r) for r in random_walks(pairs, length=4).collect())
    b = sorted(tuple(r) for r in random_walks(pairs, length=4).collect())
    assert a == b  # pure function of (graph, seed)
    c = sorted(
        tuple(r)
        for r in random_walks(pairs, length=4, seed="other").collect()
    )
    assert a != c  # the seed actually steers the draws
