"""Distributed suffix array (prefix doubling) vs sequential sorted
suffixes — including repetitive strings where the doubling recurrence
does real work."""

from __future__ import annotations

import random

from big_data_computing__spark.operators.suffix import (
    CORPUS_SEP,
    corpus_chars,
    suffix_array,
)


def _expected(texts):
    s = "".join(t + CORPUS_SEP for t in texts)
    order = sorted(range(len(s)), key=lambda i: s[i:])
    return {pos: rank + 1 for rank, pos in enumerate(order)}, s


def _got(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {
        r["pos"]: r["rank"] for r in suffix_array(docs).collect()
    }


def test_corpus_chars_positions(spark):
    texts = ["abc", "de"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["pos"]: r["ch"] for r in corpus_chars(docs).collect()
    }
    s = "abc" + CORPUS_SEP + "de" + CORPUS_SEP
    assert got == {i: c for i, c in enumerate(s)}


def test_suffix_array_banana(spark):
    want, _ = _expected(["banana"])
    assert _got(spark, ["banana"]) == want


def test_suffix_array_repetitive_and_random(spark):
    rng = random.Random(11)
    texts = [
        "ab" * 40 + "aab" * 20,          # heavy repeats: deep doubling
        "".join(rng.choice("ab ") for _ in range(150)),
        "the quick brown fox " * 5,
    ]
    want, _ = _expected(texts)
    assert _got(spark, texts) == want


def test_suffix_array_exact_duplicate_docs(spark):
    """Two identical documents — the fixture's planted-dup shape and
    the longest-LCP case the oracle key bound reasons about."""
    texts = ["same words again and again", "other", 
             "same words again and again"]
    want, _ = _expected(texts)
    assert _got(spark, texts) == want


def test_adjacent_lcp_matches_sequential(spark):
    """The rank-table LCP walk equals per-pair character comparison of
    the sequentially sorted suffixes — on the repetitive corpus where
    LCPs are long and multi-level advances must compose."""
    from big_data_computing__spark.operators.suffix import adjacent_lcp

    rng = random.Random(13)
    texts = [
        "ab" * 30 + "aab" * 15,
        "".join(rng.choice("ab ") for _ in range(120)),
        "repeat me repeat me repeat me",
        "repeat me repeat me repeat me",   # exact dup doc
    ]
    s = "".join(t + CORPUS_SEP for t in texts)
    order = sorted(range(len(s)), key=lambda i: s[i:])

    def ref_lcp(a, b):
        i = 0
        while a + i < len(s) and b + i < len(s) and s[a + i] == s[b + i]:
            i += 1
        return i

    want = {
        r + 1: (order[r], order[r + 1], ref_lcp(order[r], order[r + 1]))
        for r in range(len(order) - 1)
    }
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["rank"]: (r["pos_a"], r["pos_b"], r["lcp"])
        for r in adjacent_lcp(docs).collect()
    }
    assert got == want
    assert max(v[2] for v in want.values()) >= len(texts[2])  # dup doc
