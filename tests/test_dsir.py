"""DSIR-style importance scoring vs a sequential reference of the same
hashed-bucket integer math, plus the ranking property it exists for."""

from __future__ import annotations

import hashlib

from big_data_computing__spark.operators.curation import (
    dsir_importance,
    dsir_select_topk,
)

ROWS = [
    # target-language docs use the 'good' vocabulary
    (0, "alpha beta gamma alpha beta", "en"),
    (1, "beta gamma alpha beta gamma", "en"),
    (2, "alpha alpha beta gamma beta", "en"),
    # off-target docs use a disjoint vocabulary
    (3, "zork quux blarg zork quux", "zh"),
    (4, "quux blarg zork blarg zork", "zh"),
    # a mixed doc: half target-like, half off-target
    (5, "alpha beta zork quux gamma", "zh"),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string"
    )


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref(rows, n_buckets=1024):
    feats = {}
    for i, t, _lang in rows:
        toks = t.split()
        fs = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        feats[i] = [_h60(f) % n_buckets for f in fs]
    r, tg = {}, {}
    target = {i for i, _, lang in rows if lang == "en"}
    for i, bs in feats.items():
        for b in bs:
            r[b] = r.get(b, 0) + 1
            if i in target:
                tg[b] = tg.get(b, 0) + 1
    q = {b: (1_000_000 * (tg.get(b, 0) + 1)) // (r[b] + 1) for b in r}
    return {
        i: (len(bs), sum(q[b] for b in bs) // len(bs))
        for i, bs in feats.items()
    }


def test_dsir_matches_sequential_reference(spark):
    got = {
        r["doc_id"]: (r["n_feats"], r["imp_milli"])
        for r in dsir_importance(_df(spark)).collect()
    }
    assert got == _ref(ROWS)


def test_dsir_ranks_target_like_docs_first(spark):
    got = {
        r["doc_id"]: r["imp_milli"]
        for r in dsir_importance(_df(spark)).collect()
    }
    # every pure-target-vocab doc outranks every off-target doc,
    # and the mixed doc sits strictly between
    lo = max(got[3], got[4])
    hi = min(got[0], got[1], got[2])
    assert lo < got[5] < hi


def test_dsir_topk_total_order(spark):
    rows = dsir_select_topk(_df(spark), k=3).collect()
    keys = [(-r["imp_milli"], r["doc_id"]) for r in rows]
    assert len(rows) == 3 and keys == sorted(keys)
    assert {r["doc_id"] for r in rows} <= {0, 1, 2}
