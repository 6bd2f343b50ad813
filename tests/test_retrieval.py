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


# ---------------------------------------------------------------------
# MaxSim late interaction
# ---------------------------------------------------------------------

def _hash60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tri_vec(tok: str, n_buckets: int) -> dict[int, int]:
    p = "^" + tok + "$"
    v: dict[int, int] = {}
    for i in range(len(p) - 2):
        b = _hash60_py(p[i : i + 3]) % n_buckets
        v[b] = v.get(b, 0) + 1
    return v


def _sim_micro(q: str, d: str, n_buckets: int) -> int:
    vq, vd = _tri_vec(q, n_buckets), _tri_vec(d, n_buckets)
    dot = sum(c * vd.get(b, 0) for b, c in vq.items())
    nq2 = sum(c * c for c in vq.values())
    nd2 = sum(c * c for c in vd.values())
    return (1_000_000 * dot * dot) // (nq2 * nd2)


def _ref_maxsim(rows, query, n_buckets):
    out = {}
    for i, t in rows:
        doc_toks = sorted(set(t.split()))
        if not doc_toks:
            continue
        hits = 0
        total = 0
        for q in sorted(set(query)):
            best = max(
                (_sim_micro(q, d, n_buckets) for d in doc_toks),
                default=0,
            )
            sims = [
                _sim_micro(q, d, n_buckets)
                for d in doc_toks
                if _sim_micro(q, d, n_buckets) > 0
            ]
            if sims:  # inner-join semantics: only bucket-sharing pairs
                hits += 1
                total += best
        if hits:
            out[i] = (hits, total)
    return out


def test_maxsim_matches_sequential_reference(spark):
    from big_data_computing__spark.operators.retrieval import (
        MAXSIM_BUCKETS,
        maxsim_topk,
    )

    query = ["sparky", "joins", "scanner"]
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["score_micro"])
        for r in maxsim_topk(_df(spark), query, k=10).collect()
    }
    assert got == _ref_maxsim(CORPUS, query, MAXSIM_BUCKETS)


def test_maxsim_exact_token_scores_million(spark):
    # an exact surface match is cosine 1 → 1_000_000 micro, and it
    # dominates every fuzzy alternative for that query token
    from big_data_computing__spark.operators.retrieval import maxsim_topk

    [top] = maxsim_topk(_df(spark), ["spark"], k=1).collect()
    assert top["score_micro"] == 1_000_000
    assert top["doc_id"] in (0, 1)  # docs containing the exact token


def test_maxsim_repeated_query_tokens_collapse(spark):
    # set semantics: a duplicated query token must not double-count
    from big_data_computing__spark.operators.retrieval import maxsim_topk

    once = maxsim_topk(_df(spark), ["spark"], k=3).collect()
    twice = maxsim_topk(_df(spark), ["spark", "spark"], k=3).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]


# -- hybrid RRF fusion --


def test_rrf_fusion_matches_python(spark):
    # recompute fusion from the two rankers' own (already-tested)
    # outputs with plain python integer arithmetic
    from big_data_computing__spark.operators.retrieval import (
        RRF_SCALE,
        bm25_topk,
        maxsim_topk,
        rrf_fuse_topk,
    )

    docs = _df(spark)
    Q = ["spark", "join", "window"]
    bm = bm25_topk(docs, Q, k=50).collect()
    ms = maxsim_topk(docs, Q, k=50).collect()
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score_milli"], r["doc_id"]))
        )
    }
    ms_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(ms, key=lambda r: (-r["score_micro"], r["doc_id"]))
        )
    }
    fused = {}
    for d in set(bm_rank) | set(ms_rank):
        s = 0
        if d in bm_rank:
            s += RRF_SCALE // (60 + bm_rank[d])
        if d in ms_rank:
            s += RRF_SCALE // (60 + ms_rank[d])
        fused[d] = (bm_rank.get(d, 0), ms_rank.get(d, 0), s)
    expect = sorted(
        ((d,) + v for d, v in fused.items()),
        key=lambda t: (-t[3], t[0]),
    )[:20]
    got = [tuple(r) for r in rrf_fuse_topk(docs, Q, k=20).collect()]
    assert got == expect


def test_rrf_unranked_doc_contributes_zero(spark):
    from big_data_computing__spark.operators.retrieval import (
        RRF_SCALE,
        rrf_fuse_topk,
    )

    docs = _df(spark)
    rows = rrf_fuse_topk(docs, ["spark", "join", "window"], k=50).collect()
    for r in rows:
        expect = 0
        if r["bm25_rank"] > 0:
            expect += RRF_SCALE // (60 + r["bm25_rank"])
        if r["maxsim_rank"] > 0:
            expect += RRF_SCALE // (60 + r["maxsim_rank"])
        assert r["rrf_score"] == expect
        assert r["bm25_rank"] > 0 or r["maxsim_rank"] > 0
