"""BM25 / conjunctive / phrase search vs sequential references
implementing the same integer-exact scoring."""

from __future__ import annotations

from big_data_computing__spark.operators.retrieval import (
    bm25_topk,
    conjunctive_search,
    phrase_search,
)

CORPUS = [
    (0, "spark join window join join"),
    (1, "spark spark spark"),
    (2, "window window join filter scan scan scan scan"),
    (3, "filter scan"),
    (4, ""),
    (5, "join"),
]


def _df(spark, rows=CORPUS):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars long",
    )


def _ref_bm25(rows, query):
    toks = {i: t.split() for i, t in rows if t}
    n = len(toks)
    big_l = sum(len(v) for v in toks.values())
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in query
    }
    scores = {}
    for i, v in toks.items():
        r_dl = (1000 * len(v) * n) // big_l
        s = 0
        hits = 0
        for q in query:
            tf = v.count(q)
            if not tf:
                continue
            hits += 1
            num = 44_000_000 * tf * max(2 * n - 2 * df[q] + 1, 1)
            den = (2 * df[q] + 1) * (20_000 * tf + 6_000 + 18 * r_dl)
            s += num // den
        if hits:
            scores[i] = (hits, s)
    return scores


def test_bm25_matches_sequential_reference(spark):
    query = ["spark", "join", "scan"]
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["score_milli"])
        for r in bm25_topk(_df(spark), query, k=10).collect()
    }
    assert got == _ref_bm25(CORPUS, query)


def test_bm25_topk_total_order(spark):
    rows = bm25_topk(_df(spark), ["join", "scan"], k=3).collect()
    assert len(rows) == 3
    keys = [(-r["score_milli"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_bm25_rare_term_outranks_common(spark):
    # 'filter' (df=2) should outrank 'join' (df=3) at equal tf/dl
    rows = [(0, "filter stop"), (1, "join stop"), (2, "join stop"),
            (3, "filter join stop stop")]
    got = {
        r["doc_id"]: r["score_milli"]
        for r in bm25_topk(_df(spark, rows), ["filter", "join"]).collect()
    }
    assert got[0] > got[1] == got[2]


def test_conjunctive_requires_all_terms(spark):
    got = sorted(
        r["doc_id"]
        for r in conjunctive_search(
            _df(spark), ["spark", "join"]
        ).collect()
    )
    assert got == [0]  # doc 1 lacks 'join', doc 5 lacks 'spark'


def test_phrase_overlapping_and_short_docs(spark):
    rows = [(0, "a a a a"), (1, "a b a"), (2, "a"), (3, ""),
            (4, "b a a b")]
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(_df(spark, rows), ["a", "a"]).collect()
    }
    assert got == {0: 3, 4: 1}


def test_phrase_three_token(spark):
    rows = [(0, "x y z x y z"), (1, "x y x y z"), (2, "z y x")]
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(_df(spark, rows), ["x", "y", "z"]).collect()
    }
    assert got == {0: 2, 1: 1}
