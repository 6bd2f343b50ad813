"""Corpus-curation operators (operators/curation.py) + the n-gram
helpers they lean on (functions/text.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.functions.text import (
    char_shingles,
    word_ngrams,
)
from big_data_computing__spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                 "lang string, source string")


# ---------------------------------------------------------------------------
# n-gram helpers: hand-checked edges (shift-and-zip construction)
# ---------------------------------------------------------------------------


def test_ngram_helpers_edges(spark):
    rows = [("",), ("a",), ("a b",), ("a b c",), ("  x  y ",)]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        "text",
        word_ngrams(F.col("text"), 2).alias("w2"),
        word_ngrams(F.col("text"), 3).alias("w3"),
        char_shingles(F.col("text"), 2).alias("c2"),
    ).collect()
    by_text = {r.text: r for r in got}
    assert by_text["a b c"].w2 == ["a b", "b c"]
    assert by_text["a b c"].w3 == ["a b c"]
    assert by_text["a"].w2 == []
    assert by_text[""].w2 == []
    # whitespace tokens are filtered before n-gram construction
    assert by_text["  x  y "].w2 == ["x y"]
    assert by_text["a b"].c2 == ["a ", " b"]


def test_word_ngrams_match_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "one",
        "aa aa aa aa",
        "x y z x y z x",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (2, 3, 4):
        got = {
            r.text: r.g
            for r in df.select(
                "text", word_ngrams(F.col("text"), n).alias("g")
            ).collect()
        }
        for t in texts:
            toks = t.split()
            want = [
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            ]
            assert got[t] == want, (t, n)


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_metrics_hand_computed(spark):
    rows = [
        # 4 tokens, top 'a' x2; bigrams [a b, b a, a c] distinct 3
        (1, "a b a c", "en", "s0"),
        # degenerate repetition: all same token
        (2, "z z z z z", "en", "s0"),
    ]
    out = {
        r.doc_id: r
        for r in C.repetition_metrics(_docs(spark, rows)).collect()
    }
    r1 = out[1]
    assert r1.n_tokens == 4
    assert r1.top_token_frac == pytest.approx(0.5)
    assert r1.dup_bigram_frac == pytest.approx(0.0)
    r2 = out[2]
    assert r2.n_tokens == 5
    assert r2.top_token_frac == pytest.approx(1.0)
    # bigrams: 4 total, 1 distinct -> 0.75 ; trigrams: 3 total, 1 distinct
    assert r2.dup_bigram_frac == pytest.approx(0.75)
    assert r2.dup_trigram_frac == pytest.approx(2 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_hand_computed(spark):
    rows = [
        # held-out (doc_id % 10 == 0): shares trigram "p q r" with doc 1
        (0, "p q r s", "en", "s0"),
        (1, "p q r zz", "en", "s0"),
        # held-out with no leakage
        (10, "m n o", "en", "s0"),
        (11, "completely different words here", "en", "s0"),
    ]
    out = {
        r.doc_id: r for r in C.contamination(_docs(spark, rows)).collect()
    }
    assert set(out) == {0, 10}
    # doc 0 trigrams: {p q r, q r s} -> 1 of 2 in train
    assert out[0].n_ngrams == 2
    assert out[0].n_contaminated == 1
    assert out[0].contamination_frac == pytest.approx(0.5)
    assert out[10].n_contaminated == 0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_report_totals_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = {
        r.stratum: r
        for r in C.stratified_sample_report(docs, fraction=0.25).collect()
    }
    totals = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert {s: r.n_total for s, r in rep.items()} == totals
    for r in rep.values():
        assert 0 <= r.n_kept <= r.n_total
    # rate is approximately honored overall (counter-based uniform draw)
    frac = sum(r.n_kept for r in rep.values()) / sum(
        r.n_total for r in rep.values()
    )
    assert 0.15 < frac < 0.35
    rep2 = {
        r.stratum: (r.n_total, r.n_kept)
        for r in C.stratified_sample_report(docs, fraction=0.25).collect()
    }
    assert rep2 == {s: (r.n_total, r.n_kept) for s, r in rep.items()}


def test_balanced_sample_caps_each_stratum(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.balanced_sample(docs, cap=7).collect()
    per = {}
    for r in out:
        per[r.stratum] = per.get(r.stratum, 0) + 1
    totals = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    for s, n in per.items():
        assert n == min(7, totals[s])
    # sampled ids are a subset of the stratum
    langs = {(r.doc_id, r.lang) for r in docs.select("doc_id", "lang").collect()}
    assert all((r.doc_id, r.stratum) in langs for r in out)


# ---------------------------------------------------------------------------
# corpus stats
# ---------------------------------------------------------------------------


def test_top_ngrams_matches_python_count(spark):
    rows = [
        (1, "a b a b c", "en", "s0"),
        (2, "a b x", "en", "s1"),
        (3, "a b", "en", "s1"),
    ]
    got = [(r.ngram, r.cnt) for r in
           C.top_ngrams(_docs(spark, rows), n=2, k=3).collect()]
    # counts: 'a b' x4, 'b a' x1, 'b c' x1, 'b x' x1 -> tie-break by name
    assert got == [("a b", 4), ("b a", 1), ("b c", 1)]


def test_domain_mixture_weights_sum_to_one(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.domain_mixture(docs).collect()
    assert len(out) == docs.select("source").distinct().count()
    assert sum(r.weight for r in out) == pytest.approx(1.0, abs=1e-4)
    # sqrt temperature flattens: max/min weight ratio is sqrt of token ratio
    toks = {r.source: r.n_tokens for r in out}
    ws = {r.source: r.weight for r in out}
    hi, lo = max(toks, key=toks.get), min(toks, key=toks.get)
    assert ws[hi] / ws[lo] == pytest.approx(
        (toks[hi] / toks[lo]) ** 0.5, rel=1e-3
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------


def test_pii_report_and_redaction(spark):
    rows = [
        (1, "mail me at jane.doe+x@example.org or call +1 (555) 123-4567",
         "en", "s0"),
        (2, "server at 10.0.42.7 went down", "en", "s0"),
        (3, "no pii here at all", "en", "s0"),
    ]
    docs = _docs(spark, rows)
    rep = {r.doc_id: r for r in C.pii_report(docs).collect()}
    assert (rep[1].n_emails, rep[1].n_phones, rep[1].n_ips) == (1, 1, 0)
    assert (rep[2].n_emails, rep[2].n_phones, rep[2].n_ips) == (0, 0, 1)
    assert (rep[3].n_emails, rep[3].n_phones, rep[3].n_ips) == (0, 0, 0)

    red = {r.doc_id: r.text for r in C.redact_pii(docs).collect()}
    assert "<EMAIL>" in red[1] and "<PHONE>" in red[1]
    assert "jane" not in red[1] and "555" not in red[1]
    assert red[2] == "server at <IP> went down"
    assert red[3] == "no pii here at all"


def test_domain_quality_distribution(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.domain_quality(docs).collect()
    assert len(out) == docs.select("source").distinct().count()
    for r in out:
        assert 0.0 <= r.p25 <= r.p50 <= r.p75 <= 1.0
        assert 0.0 <= r.avg_quality <= 1.0


def test_token_budget_sample_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 300
    out = C.token_budget_sample(docs, budget=budget).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r)
    assert set(per) == {
        r.source for r in docs.select("source").distinct().collect()
    }
    for source, rows in per.items():
        rows.sort(key=lambda r: r.cum_tokens)
        # running sum is consistent and the budget bounds the PREVIOUS
        # total (so overshoot is at most one document)
        run = 0
        for r in rows:
            assert r.cum_tokens == run + r.n_tokens
            assert run < budget
            run = r.cum_tokens
    # determinism
    again = sorted(map(tuple, C.token_budget_sample(docs, budget=budget).collect()))
    assert again == sorted(map(tuple, out))


def test_mixture_resample_invariants(spark, sf_dir):
    """Downsample-only τ=0.5 resampling: the most under-represented
    domain keeps 100%, every rate is in (0, 1], the report's kept
    counts equal the materialized sample, and resampling moves the
    token shares toward the sqrt-temperature target."""
    import math

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = {r["source"]: r for r in C.mixture_resample_report(docs).collect()}
    rates = [r["rate"] for r in rep.values()]
    assert max(rates) == 1.0
    assert all(0.0 < r <= 1.0 for r in rates)
    # rate=1 belongs to the domain with the smallest token count
    # (r_d = 1/sqrt(n_d) is monotone decreasing in n_d)
    smallest = min(rep.values(), key=lambda r: r["n_tokens"])
    assert smallest["rate"] == 1.0
    for r in rep.values():
        assert 0 <= r["n_kept"] <= r["n_docs"]

    kept = C.mixture_resample(docs).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in kept} == {
        s: r["n_kept"] for s, r in rep.items() if r["n_kept"] > 0
    }

    # in expectation the resample hits the sqrt target EXACTLY:
    # E[kept_tokens_d] = rate_d·n_tokens_d ∝ sqrt(n_tokens_d)
    # (the realized counts carry binomial noise — on the near-uniform
    # fixture that noise can exceed the small systematic correction, so
    # the deterministic expectation is the right invariant to pin)
    exp_kept = {s: r["rate"] * r["n_tokens"] for s, r in rep.items()}
    etot = sum(exp_kept.values())
    ssum = sum(math.sqrt(r["n_tokens"]) for r in rep.values())
    for s, r in rep.items():
        assert abs(
            exp_kept[s] / etot - math.sqrt(r["n_tokens"]) / ssum
        ) < 1e-6  # rate is reported at 6 dp


def test_tfidf_top_terms_hand_computed(spark):
    """tf·(N/df) on a 3-doc corpus, hand-checked: a term appearing
    twice in one doc and nowhere else scores 2·3/1 = 6; ubiquitous
    terms score tf·1; ties break term-ascending."""
    from big_data_computing__spark.operators.textstats import (
        tfidf_top_terms,
    )

    rows = [
        (1, "apple apple common", "en", "s"),
        (2, "banana common", "en", "s"),
        (3, "common cherry", "en", "s"),
    ]
    docs = _docs(spark, rows)
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["score"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert out[(1, "apple")] == (2, 1, 6.0)
    assert out[(2, "banana")] == (1, 1, 3.0)
    assert out[(3, "cherry")] == (1, 1, 3.0)
    # 'common' is in every doc: tf·(3/3) = 1.0, ranked below the rares
    assert out[(1, "common")] == (1, 3, 1.0)


def test_bloom_contamination_one_sided_vs_exact(spark, sf_dir):
    """Bloom contamination never misses a true leak: per held-out doc,
    n_flagged >= the exact operator's n_contaminated (no false
    negatives); the bit table stays within m_bits; and shard filters
    merged by union equal the whole-corpus filter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    exact = {
        r["doc_id"]: r["n_contaminated"]
        for r in C.contamination(docs).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in C.bloom_contamination(docs).collect()
    }
    assert set(bloom) == set(exact)
    for d, flagged in bloom.items():
        assert flagged >= exact[d], (d, flagged, exact[d])

    from big_data_computing__spark.functions.hashing import hash60
    from big_data_computing__spark.functions.text import word_ngrams

    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias(
            "g"
        ),
    ).select("doc_id", hash60(F.col("g")).alias("h"))
    train = grams.where(F.col("doc_id") % 10 != 0).select("h")
    whole = {r["pos"] for r in C.bloom_bits(train).collect()}
    assert len(whole) <= C.BLOOM_BITS
    half = train.count() // 2
    lo, hi = train.limit(half), train.subtract(train.limit(half))
    merged = {
        r["pos"]
        for r in C.bloom_bits(lo).unionByName(C.bloom_bits(hi))
        .distinct()
        .collect()
    }
    # union of shard filters ⊆ whole (subtract() dedupes, so exact
    # equality needs identical multisets; superset-of-whole via union
    # of a partition is the property production sharding relies on)
    assert merged <= whole
    docs.unpersist()


def test_interleave_order_spreads_small_domains(spark, sf_dir):
    """The weighted-interleave contract: (1) the order is a
    permutation; (2) no domain is exhausted early — every domain's
    documents span most of the sequence (max seq position of each
    domain lands in the last ~quarter of the stream), unlike a
    concatenated-by-domain order."""
    from pyspark.sql import functions as F

    from big_data_computing__spark.operators.curation import (
        interleave_order,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    out = interleave_order(docs)
    seqs = [r["seq"] for r in out.select("seq").collect()]
    assert sorted(seqs) == list(range(1, n + 1))
    spans = {
        r["source"]: (r["lo"], r["hi"])
        for r in out.groupBy("source")
        .agg(F.min("seq").alias("lo"), F.max("seq").alias("hi"))
        .collect()
    }
    assert len(spans) > 1
    for src, (lo, hi) in spans.items():
        assert hi >= 0.75 * n, (src, lo, hi)  # reaches deep into epoch

    # determinism under re-partitioning: identical sequence
    again = {
        r["doc_id"]: r["seq"]
        for r in interleave_order(docs.repartition(17)).collect()
    }
    first = {r["doc_id"]: r["seq"] for r in out.collect()}
    assert again == first


def test_pack_sequences_invariants(spark, sf_dir):
    """Concat-and-chunk packing: offsets tile the token stream exactly
    (each doc starts where the previous ended), chunk spans follow from
    arithmetic, and the chunk view conserves tokens with zero padding
    anywhere but the final chunk."""
    from big_data_computing__spark.operators.curation import (
        pack_chunk_stats,
        pack_sequences,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    C = 256
    packed = pack_sequences(docs, context_len=C).collect()
    packed.sort(key=lambda r: r["doc_id"])
    acc = 0
    for r in packed:
        assert r["tok_start"] == acc  # exclusive prefix sum, exact
        acc += r["n_tokens"]
        assert r["first_chunk"] == r["tok_start"] // C
        last_pos = r["tok_start"] + max(r["n_tokens"] - 1, 0)
        assert r["last_chunk"] == last_pos // C
        assert r["spans_boundary"] == (r["last_chunk"] > r["first_chunk"])
    total_tokens = acc

    chunks = pack_chunk_stats(docs, context_len=C).collect()
    chunks.sort(key=lambda r: r["chunk_id"])
    # contiguous chunk ids from 0
    assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
    # token conservation
    assert sum(r["n_tokens"] for r in chunks) == total_tokens
    # concat-and-chunk never pads except the final partial chunk
    for r in chunks[:-1]:
        assert r["n_pad"] == 0 and r["n_tokens"] == C
    assert 0 <= chunks[-1]["n_pad"] < C
    assert sum(r["n_docs"] for r in chunks) >= len(
        [r for r in packed if r["n_tokens"] > 0]
    )


def test_global_prefix_sum_matches_window(spark):
    """The two-pass distributed prefix sum equals the single-partition
    window form on a fixture small enough to compare, including ties
    broken by the order columns and zero/empty values."""
    from pyspark.sql import Window

    from big_data_computing__spark.operators.relational import (
        global_prefix_sum,
    )

    rows = [(i, (i * 37) % 11) for i in range(500)] + [(1000, 0), (1001, 0)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["ps"]
        for r in global_prefix_sum(
            df, "v", "k", out_col="ps", n_partitions=8
        ).collect()
    }
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["k"]: r["ps"]
        for r in df.select(
            "k",
            F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long").alias("ps"),
        ).collect()
    }
    assert got == want


def test_gopher_quality_rules_each_fire(spark):
    """Each Gopher rule rejects its designed violator and the clean
    doc passes: too short, too-long mean word, no alpha, no
    stopwords."""
    from big_data_computing__spark.operators.curation import (
        gopher_quality_report,
    )

    ok = "the " + " ".join(f"word{i:02d}" for i in range(50))
    rows = [
        (1, ok),
        (2, "the short doc"),                              # < 40 words
        (3, "the " + " ".join(["supercalifragilistic"] * 60)),  # mean len
        (4, " ".join(["1234"] * 60)),                      # no alpha
        (5, " ".join(f"word{i:02d}" for i in range(60))),  # no stopword
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in gopher_quality_report(docs).collect()
    }
    assert out[1]["passes"] is True
    for bad in (2, 3, 4, 5):
        assert out[bad]["passes"] is False, bad
    assert out[2]["n_words"] == 3
    assert out[4]["frac_alpha_words"] == 0.0
    assert out[5]["stop_hits"] == 0


# ---------------------------------------------------------------------------
# bigram-LM rarity (textstats — grouped here with the quality filters)
# ---------------------------------------------------------------------------


def test_bigram_lm_rarity_reference(spark):
    from big_data_computing__spark.operators.textstats import (
        bigram_lm_rarity,
    )

    rows = [
        (0, "a b a b a b"),     # only common transitions
        (1, "a b b a a b"),     # mixes in rare transitions b->b, a->a
        (2, "a b"),
        (3, "x"),               # no bigrams: absent from output
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_rarity"])
        for r in bigram_lm_rarity(docs).collect()
    }
    # sequential reference of the same integer ratios
    toks = {i: t.split() for i, t in rows if t}
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for v in toks.values():
        for t in v:
            uni[t] = uni.get(t, 0) + 1
        for p in zip(v, v[1:]):
            bi[p] = bi.get(p, 0) + 1
    vocab = len(uni)
    want = {}
    for i, v in toks.items():
        ps = list(zip(v, v[1:]))
        if not ps:
            continue
        s = sum((2 * uni[u] + vocab) / (2 * bi[(u, w)] + 1) for u, w in ps)
        want[i] = (len(ps), round(s / len(ps), 6))
    assert got == want
    # the transition-scrambled doc scores strictly higher
    assert got[1][1] > got[0][1]


def test_chunk_documents_windows_and_overlap(spark):
    from big_data_computing__spark.operators.curation import (
        chunk_documents,
    )

    rows = [
        (0, " ".join(f"t{i}" for i in range(11))),  # 11 toks: tail chunk
        (1, "a b c"),                               # shorter than window
        (2, "x" + " y" * 3),                        # exactly one window
        (3, ""),                                    # no chunks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["start_tok"], r["n_tokens"], r["chunk_text"]
        )
        for r in chunk_documents(docs, window=4, stride=3).collect()
    }
    # doc 0: full chunks at 0,3,6 + the partial tail at 9
    assert got[(0, 0)] == (0, 4, "t0 t1 t2 t3")
    assert got[(0, 1)] == (3, 4, "t3 t4 t5 t6")  # 1-token overlap
    assert got[(0, 2)] == (6, 4, "t6 t7 t8 t9")
    assert got[(0, 3)] == (9, 2, "t9 t10")
    assert (0, 4) not in got
    assert got[(1, 0)] == (0, 3, "a b c")
    assert (1, 1) not in got
    # exactly one window: NO redundant tail chunk
    assert got[(2, 0)] == (0, 4, "x y y y")
    assert (2, 1) not in got
    assert not any(d == 3 for d, _c in got)
    # every token of doc 0 is covered
    covered = set()
    for (d, _c), (s, n, _t) in got.items():
        if d == 0:
            covered.update(range(s, s + n))
    assert covered == set(range(11))


def test_chunk_documents_validates_stride(spark):
    import pytest

    from big_data_computing__spark.operators.curation import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, window=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, window=4, stride=0)


def test_kneser_ney_score_reference(spark):
    from big_data_computing__spark.operators.textstats import (
        kneser_ney_score,
    )

    rows = [
        (0, "a b a b a b"),     # predictable transitions
        (1, "a b b a a b"),     # rare transitions b->b, a->a
        (2, "c a b c"),         # c glued to few contexts
        (3, "x"),               # no bigrams: absent from output
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_score_micro"])
        for r in kneser_ney_score(docs).collect()
    }
    # sequential reference of the same integer floor divisions
    toks = {i: t.split() for i, t in rows if t}
    bi: dict[tuple, int] = {}
    for v in toks.values():
        for p in zip(v, v[1:]):
            bi[p] = bi.get(p, 0) + 1
    c_ctx: dict[str, int] = {}
    n1u: dict[str, int] = {}
    n1v: dict[str, int] = {}
    for (u, w), c in bi.items():
        c_ctx[u] = c_ctx.get(u, 0) + c
        n1u[u] = n1u.get(u, 0) + 1
        n1v[w] = n1v.get(w, 0) + 1
    nbb = len(bi)
    want = {}
    for i, v in toks.items():
        ps = list(zip(v, v[1:]))
        if not ps:
            continue
        s = sum(
            (1_000_000 * max(4 * bi[(u, w)] - 3, 0)) // (4 * c_ctx[u])
            + (1_000_000 * 3 * n1u[u] * n1v[w])
            // (4 * c_ctx[u] * nbb)
            for u, w in ps
        )
        want[i] = (len(ps), s // len(ps))
    assert got == want
    # predictable text scores higher mean probability than scrambled
    assert got[0][1] > got[1][1]


def test_leakage_safe_negatives_properties(spark, sf_dir):
    """No negative is its own anchor or the anchor's near-dup cluster
    mate; at most k per anchor; draws are deterministic."""
    from big_data_computing__spark.operators.curation import (
        leakage_safe_negatives,
    )
    from big_data_computing__spark.operators.dedup import (
        duplicate_components,
        minhash_lsh_pairs,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    out = leakage_safe_negatives(docs, pairs, k=4).collect()
    comp = {
        r["doc_id"]: r["component_id"]
        for r in duplicate_components(pairs).collect()
    }

    per_anchor: dict[int, int] = {}
    for r in out:
        a, n = r["doc_id"], r["neg_doc_id"]
        assert a != n
        assert comp.get(a, a) != comp.get(n, n), (a, n)
        per_anchor[a] = per_anchor.get(a, 0) + 1
    assert max(per_anchor.values()) <= 4
    # most anchors keep all 4 draws (rejection loss is rare)
    assert sum(v == 4 for v in per_anchor.values()) > 0.8 * len(
        per_anchor
    )

    again = leakage_safe_negatives(docs, pairs, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
