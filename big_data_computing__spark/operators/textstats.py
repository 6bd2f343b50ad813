"""Text analysis over the `documents` table: token counts, quality
scoring, language ID, fingerprinting.

Not in the reference (its only string op is `"x,y"`.split(',') —
big_data_computing_2.py:10-12); these are the training-data-pipeline
extensions the engine adds as first-class operators. Everything is
Catalyst-only (no UDFs) and has an exact DuckDB-SQL twin for the
correctness oracles.

Scale notes: all operators are embarrassingly parallel per-document maps
— no shuffles at all; filters/projections push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql
from ..functions.text import normalized, token_count, tokens, word_ngrams

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and ASCII so the SQL twin is simple.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def _count_tokens_in(toks: Column, words: tuple[str, ...]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: DataFrame[doc_id, n_tokens,
    n_distinct_tokens, avg_token_len]."""
    toks = tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def _quality_parts(
    text_col: str,
) -> tuple[Column, Column, Column, Column]:
    """(n_tokens, stopword_ratio, distinct_ratio, unrounded score) — the
    single source of the quality formula, shared by the batch operator
    and the streaming gate (streaming/curation_stream.py)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_ratio = _count_tokens_in(toks, STOPWORDS).cast("double") / n_tok
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )
    return n_tok, stop_ratio, distinct_ratio, score


def quality_score_expr(text_col: str = "text") -> Column:
    """The rounded quality score as one stateless per-row Column."""
    return F.round(_quality_parts(text_col)[3], 6)


def pred_lang_expr(text_col: str = "text") -> Column:
    """The marker-argmax predicted language as one stateless per-row
    Column — the same (-hits, lang) sorted-struct argmax
    :func:`language_id` materializes, exposed as a bare expression so
    gates can FILTER on language without joining the operator's
    output back to the corpus (equality with the join form is pinned
    in tests). Repeated marker-count subtrees are shared by codegen
    subexpression elimination."""
    toks = tokens(F.col(text_col))
    pairs = F.array(
        *[
            F.struct(
                (-_count_tokens_in(toks, words)).alias("neg"),
                F.lit(lang).alias("lang"),
                _count_tokens_in(toks, words).alias("hits"),
            )
            for lang, words in LANG_MARKERS.items()
        ]
    )
    best = F.array_sort(pairs)[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise("und")


def quality_lang_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.45,
    lang: str = "en",
) -> DataFrame:
    """Join-free quality + language gate: the rows of ``docs`` whose
    rounded quality score clears ``min_quality`` AND whose
    marker-argmax language equals ``lang`` — ONE narrow per-row
    filter, all input columns preserved.

    Row-identical to the join form (docs ⋈ quality_scores ⋈
    language_id with both filters) — pinned in tests — but with NO
    shuffle: the first-stage corpus gate is embarrassingly parallel,
    and expressing it as two operator joins re-shuffles the full text
    column twice for nothing (the composed 50M-doc run priced that
    join form at 248 s; see STRESS.md r10). Plans as Filter → Scan
    with both predicates inside one WholeStageCodegen span, so at
    100 TB the gate runs at scan speed with zero exchange."""
    return docs.where(
        (quality_score_expr(text_col) >= F.lit(min_quality))
        & (pred_lang_expr(text_col) == F.lit(lang))
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: DataFrame[doc_id, n_chars, n_tokens,
    stopword_ratio, distinct_ratio, quality_score].

    quality_score blends length, lexical diversity, and stopword presence
    (the standard cheap pre-filter shape for LLM corpus curation); rounded
    to 6 dp so float results hash-match the SQL oracle.
    """
    n_tok, stop_ratio, distinct_ratio, score = _quality_parts(text_col)
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: DataFrame[doc_id, pred_lang, marker_hits].

    Scores each candidate language by marker-token hits; argmax with a
    deterministic tie-break (language code ascending, 'und' if no hits).
    """
    toks = tokens(F.col(text_col))
    scored = docs.select(
        "doc_id",
        *[
            _count_tokens_in(toks, words).alias(f"_hits_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    # greatest-hits argmax via a sorted struct array: order by (-hits, lang)
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"_hits_{lang}")).alias("neg"),
                F.lit(lang).alias("lang"),
                F.col(f"_hits_{lang}").alias("hits"),
            )
            for lang in LANG_MARKERS
        ]
    )
    best = F.array_sort(pairs)[0]
    return scored.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias(
            "pred_lang"
        ),
        best["hits"].alias("marker_hits"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape (not the merges) of a byte-pair-encoding pre-tokenization.
# Plain ASCII classes so the Java (Spark) and RE2-ish (DuckDB) regex
# dialects agree exactly.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token counting: DataFrame[doc_id, n_bpe_tokens,
    n_word_tokens]. n_bpe_tokens uses the BPE-ish regex (letters / digit
    runs / punctuation split); n_word_tokens is the whitespace count for
    comparison. The standard cheap proxy for LLM token budgeting."""
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("n_bpe_tokens"),
        token_count(F.col(text_col)).alias("n_word_tokens"),
    )


def bpe_token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT)
         AS n_bpe_tokens,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT)
         AS n_word_tokens
FROM documents
"""


# polynomial rolling hash parameters: base 131, Mersenne prime modulus —
# acc stays < 2^31 so acc*131+code < 2^39, no bigint overflow anywhere
ROLLING_BASE = 131
ROLLING_MOD = 2147483647


def rolling_fingerprints(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the normalized text's
    character codes: DataFrame[doc_id, rolling_fp].

    h = fold(codes, 0, (acc, c) → (acc·B + c) mod p) — the classic
    Rabin–Karp accumulator, expressed as a Catalyst higher-order
    aggregate (no UDF) with an exact SQL twin.
    """
    norm = normalized(F.col(text_col))
    codes = F.transform(
        F.sequence(F.lit(1), F.length(norm)),
        lambda i: F.ascii(F.substring(norm, i, 1)).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(ROLLING_BASE) + c) % F.lit(ROLLING_MOD),
    )
    return docs.select("doc_id", fp.alias("rolling_fp"))


def rolling_fingerprints_sql() -> str:
    norm = "trim(regexp_replace(lower(text), ' +', ' ', 'g'))"
    return f"""
WITH n AS (SELECT doc_id, {norm} AS t FROM documents),
codes AS (
  SELECT doc_id,
         list_transform(range(1, length(t) + 1),
                        i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)) AS cs
  FROM n
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
                   (acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD})
         AS rolling_fp
FROM codes
"""


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 60-bit hash of the normalized text.
    DataFrame[doc_id, fingerprint] — the key for exact dedup."""
    return docs.select(
        "doc_id", hash60(normalized(F.col(text_col))).alias("fingerprint")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken): the distinct set of
    per-window minimum k-gram hashes — DataFrame[doc_id, fp].

    Each document's word k-grams are hashed in position order; every
    sliding window of ``w`` consecutive positions contributes its minimum
    hash (rightmost minimum on ties, via min over (hash, -pos)).
    Guarantees any shared substring of ≥ w+k-1 words yields a shared
    fingerprint — the robust local-fingerprinting scheme plagiarism
    detectors use. One window function partitioned by doc, no global
    shuffle beyond the doc key.
    """
    from pyspark.sql import Window

    grams = docs.select(
        "doc_id",
        F.posexplode(
            word_ngrams(normalized(F.col(text_col)), k)
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", hash60(F.col("gram")).alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, w - 1)
    )
    # rightmost-min tie-break: minimize (h, -pos) as a struct
    picked = grams.select(
        "doc_id",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win)[
            "h"
        ].alias("fp"),
        F.count("*").over(win).alias("_wlen"),
    )
    # only full windows select fingerprints (standard definition)
    return picked.where(F.col("_wlen") == w).select("doc_id", "fp").distinct()


def winnow_fingerprints_sql(k: int = 4, w: int = 5) -> str:
    toks = (
        "list_filter(string_split("
        "trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' '), "
        "t -> t <> '')"
    )
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         {hash60_sql("array_to_string(t[i:i+" + str(k - 1) + "], ' ')")} AS h
  FROM toks, UNNEST(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS u(i)
),
wins AS (
  SELECT doc_id,
         (min({{'h': h, 'np': -pos}}) OVER
            (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)).h AS fp,
         count(*) OVER
            (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wlen
  FROM grams
)
SELECT DISTINCT doc_id, fp FROM wins WHERE wlen = {w}
"""


# ---------------------------------------------------------------------------
# DuckDB-SQL twins
# ---------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split(text, ' '), t -> t <> '')"


def _hits_sql(words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter({_TOKS_SQL}, t -> list_contains([{arr}], t)))"
    )


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       ROUND(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
             / len(toks), 6) AS avg_token_len
FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""


def quality_scores_sql() -> str:
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, CAST(length(text) AS INT) AS n_chars, {_TOKS_SQL} AS toks
  FROM documents
), r AS (
  SELECT doc_id, n_chars, CAST(len(toks) AS INT) AS n_tokens,
         CAST(len(list_filter(toks, t -> list_contains([{stop_arr}], t))) AS DOUBLE)
           / len(toks) AS sr,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dr
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
       ROUND(sr, 6) AS stopword_ratio,
       ROUND(dr, 6) AS distinct_ratio,
       ROUND(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + dr * 0.4 + least(sr * 5.0, 1.0) * 0.2, 6) AS quality_score
FROM r
"""


def language_id_sql() -> str:
    structs = ", ".join(
        f"{{'neg': -{_hits_sql(words)}, 'lang': '{lang}', "
        f"'hits': {_hits_sql(words)}}}"
        for lang, words in LANG_MARKERS.items()
    )
    return f"""
WITH scored AS (
  SELECT doc_id, list_sort([{structs}])[1] AS best FROM documents
)
SELECT doc_id,
       CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS pred_lang,
       CAST(best.hits AS INT) AS marker_hits
FROM scored
"""


def fingerprints_sql() -> str:
    norm = "trim(regexp_replace(lower(text), ' +', ' ', 'g'))"
    return (
        f"SELECT doc_id, {hash60_sql(norm)} AS fingerprint FROM documents"
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document top-``k`` terms by tf·idf:
    DataFrame[doc_id, term, tf, df, score].

    The idf factor is the LINEAR form ``N/df`` (score = tf·N/df,
    rounded to 6 dp), not the textbook ``ln(N/df)``: ln is not
    bit-portable across engines (Spark's and DuckDB's libm results
    measurably differ in the last ulp), while multiply and divide are
    IEEE correctly-rounded everywhere — so this variant is exactly
    reproducible cross-engine from integer (tf, df, N). Within one
    document the two orderings differ only in how strongly rare terms
    are promoted; both are standard keyword-extraction weightings.

    Shape: one (doc_id, term) aggregation (map-side combined — the
    word-count shape), a term-keyed df aggregation over the distinct
    pairs, a term-keyed join of the two, and a per-doc WindowGroupLimit
    for the top-k — every stage keyed on high-cardinality columns, no
    hot keys, no driver state.
    """
    from pyspark.sql import Window

    pairs = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = pairs.groupBy("doc_id", "term").agg(
        F.count("*").cast("int").alias("tf")
    )
    df_ = tf.groupBy("term").agg(
        F.count("*").cast("int").alias("df")
    )
    n = docs.select(
        F.count("*").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * (F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    return f"""
WITH pairs AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS INT) AS tf
  FROM pairs GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS INT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(CAST(tf.tf AS DOUBLE)
               * (n.n_docs / CAST(dfreq.df AS DOUBLE)), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score FROM (
  SELECT *, row_number() OVER
    (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= {k}
"""


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric near-dup detection — document CONTAINMENT over the
    winnowing fingerprints: DataFrame[doc_a, doc_b, containment_a,
    containment_b] for pairs where max(containment) ≥ threshold, with
    containment_a = |fp(A) ∩ fp(B)| / |fp(A)| (the share of A's
    fingerprinted content that also appears in B).

    Jaccard misses the copy-with-additions case: a short document
    pasted verbatim into a much longer one has low symmetric overlap
    but containment ≈ 1 in one direction — exactly what quote/boiler
    expansion looks like in a crawl. Broder's containment measure over
    winnowed fingerprints inherits winnowing's guarantee (any shared
    run of ≥ w+k-1 words shares a fingerprint), so a contained copy of
    meaningful length cannot score 0.

    Same inverted-index + df≥2-prune join shape as the Jaccard
    operator; only (doc_id, fp) longs shuffle.
    """
    fps = winnow_fingerprints(docs, k, w, text_col).localCheckpoint()
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("nfp"))
    shared = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") >= 2)
    )
    pruned = fps.join(shared.select("fp"), "fp", "left_semi")
    inter = (
        pruned.select(F.col("doc_id").alias("doc_a"), "fp")
        .join(pruned.select(F.col("doc_id").alias("doc_b"), "fp"), "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nfp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nfp").alias("nb"))
    ca = F.col("inter").cast("double") / F.col("na")
    cb = F.col("inter").cast("double") / F.col("nb")
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(F.greatest(ca, cb) >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def containment_pairs_sql(
    threshold: float = 0.8, k: int = 4, w: int = 5
) -> str:
    """DuckDB twin of :func:`containment_pairs` over the same winnowing
    fingerprint SQL."""
    return f"""
WITH fps AS MATERIALIZED ({winnow_fingerprints_sql(k, w)}),
sizes AS (SELECT doc_id, COUNT(*) AS nfp FROM fps GROUP BY doc_id),
shared AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) >= 2),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN shared USING (fp)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / sa.nfp, 6) AS containment_a,
       ROUND(CAST(inter AS DOUBLE) / sb.nfp, 6) AS containment_b
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE GREATEST(CAST(inter AS DOUBLE) / sa.nfp,
               CAST(inter AS DOUBLE) / sb.nfp) >= {threshold!r}
"""


def unigram_rarity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document rarity score under the corpus unigram model:
    DataFrame[doc_id, n_tokens, rarity] with
    ``rarity = avg over the doc's tokens of (2N + V) / (2·c(t) + 1)``
    — the mean INVERSE add-½-smoothed unigram probability (N = corpus
    token count, V = vocabulary size, c(t) = corpus count of token t).

    This is the engine's portable stand-in for the unigram
    perplexity filter of CCNet/Gopher-style curation: documents heavy
    in rare tokens (gibberish, boilerplate IDs, non-language noise)
    score high and get cut by a threshold, exactly the decision shape a
    log-perplexity filter draws. The score deliberately avoids ``ln``:
    like :func:`tfidf_top_terms`'s linear idf, every term is a ratio of
    exact integers (IEEE-exact in doubles) and the per-document sum
    runs in token-position order on BOTH engines (sorted struct
    rebuild here, ``list(... ORDER BY idx)`` in the twin), so the
    result is bit-reproducible cross-engine — a property no libm log
    can give (last-ulp divergence, measured; see tfidf's docstring).

    Plan: one (token) count aggregation (word-count shape), a 2-scalar
    total (broadcast), a token-keyed join of the exploded corpus, and
    one per-doc aggregation — every stage keyed on high-cardinality
    columns. At 100 TB the vocabulary table is the only mid-size
    intermediate, and it shuffles once.
    """
    pairs = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("idx", "term")
    )
    counts = pairs.groupBy("term").agg(
        F.count("*").cast("long").alias("c")
    )
    totals = counts.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("vocab"),
    )
    weighted = (
        pairs.join(counts, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "idx",
            (
                (2 * F.col("n_total") + F.col("vocab")).cast("double")
                / (2 * F.col("c") + 1).cast("double")
            ).alias("w"),
        )
    )
    return weighted.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("idx", "w"))),
                    lambda s: s["w"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count("*"),
            6,
        ).alias("rarity"),
    )


def unigram_rarity_sql() -> str:
    """DuckDB twin of :func:`unigram_rarity` (identical integer
    ratios, identical position-ordered summation)."""
    return f"""
WITH pairs AS (
  -- two same-length unnests in one SELECT expand in lockstep
  SELECT doc_id,
         unnest(range(len(toks))) AS idx,
         unnest(toks) AS term
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
),
counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY term
),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM counts
),
weighted AS (
  SELECT p.doc_id, p.idx,
         CAST(2 * t.n_total + t.vocab AS DOUBLE)
         / CAST(2 * c.c + 1 AS DOUBLE) AS w
  FROM pairs p JOIN counts c USING (term) CROSS JOIN totals t
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       ROUND(list_sum(list(w ORDER BY idx)) / COUNT(*), 6) AS rarity
FROM weighted GROUP BY doc_id
"""


def bpe_top_pairs(
    docs: DataFrame, k: int = 30, text_col: str = "text"
) -> DataFrame:
    """The inner step of BPE tokenizer training, distributed:
    DataFrame[pair, n_pairs] — the ``k`` most frequent ADJACENT
    character pairs across the corpus's whitespace words, each word's
    bigrams weighted by the word's corpus frequency (exactly the count
    a sequential BPE trainer computes before choosing its next merge;
    the argmax row here IS the first merge).

    Plan shape is the scale-critical part: the corpus collapses to the
    DISTINCT word vocabulary first (one word-count aggregation — at
    100 TB the vocabulary is millions of rows, the corpus trillions),
    and character-pair expansion runs over the vocabulary only, so the
    expensive explode is O(vocab · word_len), not O(corpus). Top-k is
    count-desc with the pair string as the deterministic tiebreak
    (TakeOrderedAndProject — never a full sort).
    """
    words = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    pairs = words.where(F.length("term") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(term) - 1), "
                "i -> substring(term, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("pair"))
        .limit(k)
    )


def bpe_top_pairs_sql(k: int = 30) -> str:
    """DuckDB twin of :func:`bpe_top_pairs` (same vocabulary
    collapse, same bigram expansion, same deterministic tiebreak)."""
    return f"""
WITH words AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY term
),
pairs AS (
  SELECT substr(term, CAST(i AS INT), 2) AS pair, cnt
  FROM (
    SELECT term, cnt, unnest(range(1, length(term))) AS i
    FROM words WHERE length(term) >= 2
  )
)
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_pairs
FROM pairs GROUP BY pair
ORDER BY n_pairs DESC, pair
LIMIT {k}
"""


_BPE_SEP = "\x1f"  # unit separator: frames symbols so merges can't
# match across symbol boundaries ("␟a␟␟t␟" never matches inside
# "␟ca␟␟t␟")


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts of a framed-encoding vocabulary:
    DataFrame[a, b, n_pairs] over vocab[enc, cnt] — each word's
    adjacent (symbolᵢ, symbolᵢ₊₁) pairs weighted by the word's corpus
    count. Shared by the full-recount and incremental trainers (the
    incremental deltas are this exact expression over the affected
    subset, which is what makes the two paths provably identical)."""
    sep = _BPE_SEP
    syms = F.split(
        F.expr("substring(enc, 2, length(enc) - 2)"), sep + sep
    )
    return (
        vocab.where(F.size(syms) >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, "
                    f"size(split(substring(enc, 2, length(enc) - 2), '{sep}{sep}')) - 1), "
                    f"i -> struct(split(substring(enc, 2, length(enc) - 2), '{sep}{sep}')[i-1] AS a, "
                    f"split(substring(enc, 2, length(enc) - 2), '{sep}{sep}')[i] AS b))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").cast("long").alias("n_pairs"))
    )


def _bpe_symbol_counts(vocab: DataFrame) -> DataFrame:
    """Per-symbol occurrence counts of a framed-encoding vocabulary:
    DataFrame[sym, n_sym] — each word's symbols weighted by the word's
    corpus count (the denominator statistics of the WordPiece
    likelihood objective)."""
    sep = _BPE_SEP
    return (
        vocab.select(
            F.explode(
                F.split(
                    F.expr("substring(enc, 2, length(enc) - 2)"),
                    sep + sep,
                )
            ).alias("sym"),
            "cnt",
        )
        .groupBy("sym")
        .agg(F.sum("cnt").cast("long").alias("n_sym"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    incremental: bool = True,
    level: str = "char",
    objective: str = "count",
) -> list[tuple[str, str, int]]:
    """Distributed BPE tokenizer training: returns the first
    ``n_merges`` merges as ``(left, right, pair_count)`` in merge
    order — the exact greedy sequence a sequential trainer (Sennrich
    et al.'s learn_bpe) produces, with count-desc then (left, right)
    lexicographic tiebreak.

    Scale shape: the corpus collapses ONCE to the distinct-word
    vocabulary with counts; every merge round then runs over
    vocabulary-sized data only. The driver holds one (pair, count)
    row per round — the argmax — never the vocabulary.
    ``localCheckpoint`` per round keeps the lineage flat
    (iterative-loop rule, PLANS.md); each round unpersists its
    predecessor's checkpoint once the successor is materialized, so a
    30k-merge training run holds O(1) checkpoints, not O(rounds).

    ``incremental=True`` (default) is the classic delta maintenance
    that makes real tokenizer training feasible: the (pair → count)
    relation is kept as state, and each merge recounts ONLY the words
    containing the just-merged pair — delta = pairs(affected after) −
    pairs(affected before), everything else untouched — instead of
    re-aggregating every pair of every vocabulary word per round.
    Per-round cost drops from O(vocab·word_len) exploded+shuffled to
    one narrow contains() scan over the vocabulary plus
    O(affected·len + |distinct pairs|) shuffled; on a 200k-word
    vocabulary at 64 merges that is a measured 3.1× end-to-end win —
    111.0 s full vs 35.7 s incremental, identical sequences, and 256
    incremental merges run in 121.6 s where extrapolated full recount
    is ~7.5 min (STRESS.md r6, tools/stress_test.py --bpe-only) — and
    the gap widens with corpus scale since |affected| per round
    shrinks relative to the vocabulary. ``incremental=False`` keeps the
    full-recount path (the A/B baseline; byte-identical merge
    sequences, pinned by test_bpe_incremental_equals_full_recount and
    the sequential-learner equivalence test).

    ``objective="likelihood"`` switches the merge choice to the
    WORDPIECE criterion (Schuster & Nakajima / BERT family): instead
    of the raw pair count, each round merges the pair maximizing
    c(a,b)/(c(a)·c(b)) — the training-corpus likelihood gain of
    fusing the symbols — quantized to the portable integer ranking
    ``score = (1_000_000·c(a,b)) div (c(a)·c(b))`` with
    (score DESC, a, b) tiebreak (no libm log; same floor-div idiom as
    BM25). Merged tuples carry the score in place of the count. The
    symbol-count denominators are recomputed per round from the
    vocabulary (a vocabulary-sized scan; the pair-count numerators
    still use the incremental delta maintenance). Overflow bound:
    c(a)·c(b) < 2^63 needs total corpus positions < ~3e9 per symbol
    pair — beyond that, drop the milli factor or rank in doubles.
    No ## continuation marker — boundary handling follows the same
    word framing as the count objective, so the two trainers differ
    ONLY in the argmax (documented simplification).

    ``level="byte"`` trains BYTE-level BPE (the GPT-2 family): each
    word is prefixed with the space byte (0x20 — the add_prefix_space
    word-boundary marker, GPT-2's Ġ) and encoded as its UTF-8 bytes,
    one framed two-hex-digit cell per byte, so the initial alphabet is
    the 256 byte values, any Unicode input is representable with no
    UNK, and merged symbols are even-length hex strings. Everything
    downstream — pair counting, argmax, framed replace, the
    incremental deltas — is encoding-agnostic and identical."""
    if level not in ("char", "byte"):
        raise ValueError(f"unknown BPE level: {level!r}")
    if objective not in ("count", "likelihood"):
        raise ValueError(f"unknown BPE objective: {objective!r}")
    sep = _BPE_SEP
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .where(~F.col("term").contains(sep))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if level == "byte":
        # precompute the hex string ONCE per word: a lambda that
        # re-evaluated hex(encode(...)) per byte position would be
        # quadratic (the word_ngrams lesson)
        words = words.withColumn(
            "h",
            F.hex(F.encode(F.concat(F.lit(" "), F.col("term")), "UTF-8")),
        )
        enc = F.concat(
            F.lit(sep),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(h) div 2), "
                    "i -> substring(h, 2*i - 1, 2))"
                ),
                sep + sep,
            ),
            F.lit(sep),
        )
    else:
        # encode each word as ␟c₁␟␟c₂␟…: one framed cell per symbol
        enc = F.concat(
            F.lit(sep),
            F.array_join(
                F.expr(
                    "transform(sequence(1, length(term)), "
                    "i -> substring(term, i, 1))"
                ),
                sep + sep,
            ),
            F.lit(sep),
        )
    # r11 (guide §1.2): the whole merge loop now runs ONE job per merge
    # — the argmax collect. Every checkpoint is LAZY; the argmax is a
    # TakeOrderedAndProject whose per-partition top-1 scans every
    # partition of the counts chain, so it materializes the current
    # counts checkpoint AND (through the delta's `affected` filter
    # scan) the previous vocab checkpoint. The r10 shape paid 3 jobs
    # per merge (argmax + eager counts checkpoint + eager vocab
    # checkpoint) and was left eager only because its unpersist
    # bookkeeping ran before the next materializer; the fix is to
    # RETIRE generations late: after the argmax of round r, counts_{r-1}
    # and vocab_{r-2} have no un-materialized dependents left
    # (counts_r and vocab_{r-1} are in blocks), so exactly those are
    # unpersisted. Footprint: ≤ 2 vocab + 2 counts checkpoints live at
    # any time — same O(1) bound as before, one generation later.
    vocab = words.select(enc.alias("enc"), "cnt").localCheckpoint(
        eager=False
    )
    merges: list[tuple[str, str, int]] = []
    counts = (
        _bpe_pair_counts(vocab).localCheckpoint(eager=False)
        if incremental
        else None
    )
    # retire-queues: checkpoints whose last un-materialized dependent
    # becomes materialized by the NEXT argmax (see block comment above)
    retire_counts: list[DataFrame] = []
    retire_vocabs: list[DataFrame] = []
    # full-recount mode materializes vocab_r at round r's own argmax
    # (the recount scans it directly), so vocab retires one round
    # earlier than in incremental mode
    vocab_lag = 2 if incremental else 1
    for _ in range(n_merges):
        src = counts if incremental else _bpe_pair_counts(vocab)
        if objective == "likelihood":
            syms = _bpe_symbol_counts(vocab)
            src = (
                src.join(
                    syms.select(
                        F.col("sym").alias("a"),
                        F.col("n_sym").alias("na"),
                    ),
                    "a",
                )
                .join(
                    syms.select(
                        F.col("sym").alias("b"),
                        F.col("n_sym").alias("nb"),
                    ),
                    "b",
                )
                .select(
                    "a",
                    "b",
                    F.expr("(1000000 * n_pairs) div (na * nb)").alias(
                        "n_pairs"
                    ),
                )
            )
        pair_rows = (
            src.orderBy(F.col("n_pairs").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not pair_rows:
            break
        # the collect above materialized the current counts chain (and
        # with it the previous vocab) — retire the generations nothing
        # un-materialized depends on anymore
        while len(retire_counts) > 1:
            retire_counts.pop(0).unpersist()
        while len(retire_vocabs) > vocab_lag - 1:
            retire_vocabs.pop(0).unpersist()
        a, b, n = pair_rows[0]["a"], pair_rows[0]["b"], pair_rows[0]["n_pairs"]
        merges.append((a, b, n))
        # leftmost non-overlapping merge = one framed string replace
        pat = f"{sep}{a}{sep}{sep}{b}{sep}"
        rep = f"{sep}{a}{b}{sep}"
        if incremental:
            affected = vocab.where(F.col("enc").contains(pat))
            replaced = affected.select(
                F.replace(F.col("enc"), F.lit(pat), F.lit(rep)).alias(
                    "enc"
                ),
                "cnt",
            )
            deltas = _bpe_pair_counts(replaced).unionByName(
                _bpe_pair_counts(affected).select(
                    "a", "b", (-F.col("n_pairs")).alias("n_pairs")
                )
            )
            new_counts = (
                counts.unionByName(deltas)
                .groupBy("a", "b")
                .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
                .where(F.col("n_pairs") > 0)
                .localCheckpoint(eager=False)
            )
            retire_counts.append(counts)
            counts = new_counts
        new_vocab = vocab.select(
            F.replace(F.col("enc"), F.lit(pat), F.lit(rep)).alias("enc"),
            "cnt",
        ).localCheckpoint(eager=False)
        retire_vocabs.append(vocab)
        vocab = new_vocab
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    level: str = "char",
) -> DataFrame:
    """Tokenize with a learned BPE: DataFrame[doc_id, bpe_tokens]
    applying the merges of :func:`bpe_train` IN TRAINING ORDER to
    every whitespace word — the same framed-string leftmost
    non-overlapping replace the trainer used, so
    ``bpe_apply(corpus, bpe_train(corpus, n))`` reproduces exactly the
    trainer's final symbol sequences (the round-trip property pinned
    in tests). A pure per-row Catalyst map (one chained replace per
    merge inside a ``transform``) — no shuffle, no Python, scales as a
    narrow stage at any corpus size.

    ``level="byte"`` applies byte-level merges (see :func:`bpe_train`):
    tokens come back as even-length hex strings over the space-prefixed
    UTF-8 bytes of each word; concatenating a word's tokens always
    re-spells ``hex(' ' + word)`` exactly (lossless round trip, no
    UNK)."""
    if level not in ("char", "byte"):
        raise ValueError(f"unknown BPE level: {level!r}")
    sep = _BPE_SEP
    if level == "byte":
        # two-step: words -> hex strings (computed once each), then
        # hex -> framed byte cells over the BOUND lambda value (no
        # per-position re-evaluation of the encode)
        enc = F.expr(
            f"transform(transform(filter(split({text_col}, ' '), "
            f"w -> w != '' AND NOT contains(w, '{sep}')), "
            "w -> hex(encode(concat(' ', w), 'UTF-8'))), "
            f"h -> concat('{sep}', array_join(transform("
            "sequence(1, length(h) div 2), "
            f"i -> substring(h, 2*i - 1, 2)), '{sep}{sep}'), '{sep}'))"
        )
    else:
        enc_word = (
            "concat('{s}', array_join(transform(sequence(1, length(w)), "
            "i -> substring(w, i, 1)), '{s}{s}'), '{s}')"
        ).format(s=sep)
        enc = F.expr(
            f"transform(filter(split({text_col}, ' '), w -> w != '' AND "
            f"NOT contains(w, '{sep}')), w -> {enc_word})"
        )
    def _merge_step(col, a: str, b: str):
        pat, rep = f"{sep}{a}{sep}{sep}{b}{sep}", f"{sep}{a}{b}{sep}"
        return F.transform(
            col, lambda e: F.replace(e, F.lit(pat), F.lit(rep))
        )

    col = enc
    for mrg in merges:
        col = _merge_step(col, mrg[0], mrg[1])
    decoded = F.flatten(
        F.transform(
            col,
            lambda e: F.split(
                F.substring(e, F.lit(2), F.length(e) - 2), sep + sep
            ),
        )
    )
    return docs.select("doc_id", decoded.alias("bpe_tokens"))


def vocab_coverage(
    docs: DataFrame,
    ks: tuple[int, ...] = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-sizing report: DataFrame[k, covered_tokens,
    total_tokens, vocab_size, coverage] — the fraction of all corpus
    token OCCURRENCES covered by the ``k`` most frequent terms (count
    desc, term asc tiebreak). This is the head-coverage curve a
    tokenizer/vocab-size decision reads off (how much of the stream
    the top-k vocabulary absorbs before falling back to subword/UNK).

    Scale shape: one word-count aggregation, the engine's two-pass
    distributed rank over the VOCABULARY (relational.global_rank —
    never a single-partition window), then one k×vocab conditional
    aggregation via a broadcast cross join with the tiny k list."""
    from .relational import global_rank

    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    ranked = global_rank(
        counts.withColumn("neg", -F.col("cnt")), "neg", "term"
    )
    ks_df = docs.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k int"
    )
    return (
        ranked.crossJoin(F.broadcast(ks_df))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("rank") <= F.col("k"), F.col("cnt"))
                .otherwise(0)
            ).cast("long").alias("covered_tokens"),
            F.sum("cnt").cast("long").alias("total_tokens"),
            F.count("*").cast("long").alias("vocab_size"),
        )
        .select(
            "k", "covered_tokens", "total_tokens", "vocab_size",
            F.round(
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("coverage"),
        )
    )


def vocab_coverage_sql(ks: tuple[int, ...] = (100, 1000, 10000)) -> str:
    """DuckDB twin of :func:`vocab_coverage` (same rank total order,
    same conditional sums)."""
    values = ", ".join(f"({int(k)})" for k in ks)
    return f"""
WITH counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank
  FROM counts
)
SELECT kt.k,
       CAST(SUM(CASE WHEN r.rank <= kt.k THEN r.cnt ELSE 0 END)
            AS BIGINT) AS covered_tokens,
       CAST(SUM(r.cnt) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       ROUND(CAST(SUM(CASE WHEN r.rank <= kt.k THEN r.cnt ELSE 0 END)
                  AS DOUBLE) / SUM(r.cnt), 6) AS coverage
FROM ranked r CROSS JOIN (VALUES {values}) kt(k)
GROUP BY kt.k
"""


# ---------------------------------------------------------------------------
# Unigram language-model tokenizer (SentencePiece-style, Kudo 2018)
# ---------------------------------------------------------------------------


def _viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str] | None:
    """Best unigram segmentation of ``word``: maximize the sum of piece
    log-probs; ties prefer FEWER pieces, then the lexicographically
    smaller piece sequence — a total order, so the segmentation is a
    pure deterministic function of (word, logp). Returns None when the
    word cannot be covered (a character outside the vocabulary)."""
    n = len(word)
    # best[i] = (score, -n_pieces, rev_lex_key, start) for word[:i]
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, (), -1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        cand = None
        cand_back = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            sc = best[j][0] + lp
            np_ = best[j][1] - 1
            key = (sc, np_)
            if cand is None or key > cand[:2] or (
                key == cand[:2]
                and _seg_of(back, j, word) + [piece]
                < _seg_of(back, cand_back[0], word) + [cand_back[1]]
            ):
                cand = (sc, np_, (), j)
                cand_back = (j, piece)
        best[i] = cand
        back[i] = cand_back
    if best[n] is None:
        return None
    return _seg_of(back, n, word)


def _seg_of(back, i: int, word: str) -> list[str]:
    out: list[str] = []
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 512,
    seed_size: int = 2048,
    max_piece_len: int = 6,
    em_rounds: int = 2,
    shrink_factor: float = 0.75,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Distributed unigram-LM tokenizer training (the SentencePiece
    counterpart to :func:`bpe_train`): returns the final vocabulary as
    ``(piece, logprob)`` sorted by (-logprob, piece).

    Algorithm (Kudo 2018, with the standard hard-EM simplification —
    Viterbi counts instead of lattice forward-backward, documented so
    the contract is honest): seed the vocabulary with the
    ``seed_size`` most frequent substrings (length ≤ ``max_piece_len``)
    plus ALL single characters (coverage guarantee); iterate {em_rounds
    × [Viterbi-segment every distinct word under current log-probs →
    piece counts → renormalize]}, then prune to ``shrink_factor`` of
    the current size by expected count (single characters are never
    pruned), until ``vocab_size`` remains.

    Scale shape mirrors the trainer family's contract: the corpus
    collapses ONCE to the distinct-word vocabulary with counts; every
    EM/prune round is one Arrow-batched ``mapInPandas`` pass over the
    VOCABULARY (the per-word Viterbi DP is O(len·max_piece_len) Python
    — the FFT-kernel precedent: a seeded deterministic kernel where
    Catalyst has no equivalent), one explode + groupBy-sum for the
    M-step (piece-vocabulary-sized shuffle), and the driver holds only
    the piece table (≤ seed_size floats, broadcast each round). The
    segmentation tie-break (fewer pieces, then lexicographic) makes
    training a pure function of (data, parameters) — pinned by the
    sequential-reference equivalence test (test_dedup_text.py)."""
    import math

    from pyspark.sql import types as T

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    # seed: frequent substrings (count weighted) + all single chars
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(term)), i -> "
                f"transform(sequence(i, least(i + {max_piece_len - 1}, "
                "length(term))), j -> substring(term, i, j - i + 1))))"
            )
        ).alias("piece"),
        "cnt",
    ).groupBy("piece").agg(F.sum("cnt").cast("long").alias("n"))
    chars = {
        r["piece"]: r["n"]
        for r in subs.where(F.length("piece") == 1).collect()
    }
    multi = (
        subs.where(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece"))
        .limit(max(seed_size - len(chars), 0))
        .collect()
    )
    counts = dict(chars)
    counts.update({r["piece"]: r["n"] for r in multi})

    def to_logp(cnts: dict[str, int | float]) -> dict[str, float]:
        # fsum: exactly-rounded total regardless of accumulation order,
        # so log-probs are bit-identical however the counts arrived
        # (distributed batches vs a sequential reference)
        total = math.fsum(cnts.values())
        return {p: math.log(c / total) for p, c in cnts.items()}

    logp = to_logp(counts)
    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )

    def em_counts(logp_now: dict[str, float]) -> dict[str, float]:
        """One hard-EM E-step over the distributed word vocabulary."""
        bc = spark.sparkContext.broadcast(logp_now)

        def run(batches):
            import pandas as pd

            for pdf in batches:
                acc: dict[str, float] = {}
                lp = bc.value
                for term, cnt in zip(pdf["term"], pdf["cnt"]):
                    seg = _viterbi_segment(term, lp, max_piece_len)
                    if seg is None:
                        continue
                    for p in seg:
                        acc[p] = acc.get(p, 0.0) + float(cnt)
                yield pd.DataFrame(
                    {"piece": list(acc), "c": list(acc.values())}
                )

        rows = (
            words.mapInPandas(run, out_schema)
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        return {r["piece"]: r["c"] for r in rows}

    while True:
        for _ in range(em_rounds):
            ec = em_counts(logp)
            # unused pieces keep an epsilon count so log stays finite;
            # they are the first pruned
            merged = {
                p: ec.get(p, 1e-9) for p in logp
            }
            logp = to_logp(merged)
        if len(logp) <= vocab_size:
            break
        keep = max(
            vocab_size, int(len(logp) * shrink_factor)
        )
        multi_sorted = sorted(
            ((p, c) for p, c in merged.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        kept = {p: merged[p] for p in chars if p in merged}
        for p, c in multi_sorted[: max(keep - len(kept), 0)]:
            kept[p] = c
        if len(kept) == len(logp):
            break  # nothing prunable (all single chars)
        logp = to_logp(kept)
    return sorted(logp.items(), key=lambda pl: (-pl[1], pl[0]))


def unigram_apply(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a trained unigram LM: DataFrame[doc_id, pieces]
    — per-word Viterbi segmentation under the learned log-probs (the
    exact kernel the trainer used, so train→apply round-trips), words
    with out-of-vocabulary characters passed through whole. One
    Arrow-batched narrow pass, no shuffle."""
    from pyspark.sql import types as T

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(dict(vocab))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            lp = bc.value
            ids, outs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    seg = _viterbi_segment(w, lp, max_piece_len)
                    pieces.extend(seg if seg is not None else [w])
                ids.append(doc_id)
                outs.append(pieces)
            yield pd.DataFrame({"doc_id": ids, "pieces": outs})

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(run, schema)


def substring_seed_vocab(
    docs: DataFrame,
    k: int = 100,
    max_piece_len: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """The unigram trainer's seed-vocabulary ranking as a first-class
    query: DataFrame[piece, n] — the ``k`` most frequent substrings
    (length ≤ ``max_piece_len``) of the corpus's whitespace words,
    weighted by word count, ordered (n desc, piece asc).
    :func:`unigram_train` seeds with all single characters plus the
    head of exactly this ranking, so the distributed-heavy half of
    unigram training is driver-oracle-checked here.

    Plan: one word-count aggregation collapses the corpus to the
    vocabulary, the substring explode runs over DISTINCT words only
    (O(vocab · len · max_piece_len), never O(corpus)), and top-k is a
    TakeOrderedAndProject."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(term)), i -> "
                f"transform(sequence(i, least(i + {max_piece_len - 1}, "
                "length(term))), j -> substring(term, i, j - i + 1))))"
            )
        ).alias("piece"),
        "cnt",
    )
    return (
        subs.groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("piece"))
        .limit(k)
    )


def substring_seed_vocab_sql(k: int = 100, max_piece_len: int = 6) -> str:
    """DuckDB twin of :func:`substring_seed_vocab` (same vocabulary
    collapse, same bounded substring expansion, same total order)."""
    return f"""
WITH words AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY term
),
starts AS (
  -- lateral expansion via unnest-in-select (DuckDB's range() table
  -- function rejects column parameters)
  SELECT term, cnt,
         CAST(unnest(range(1, length(term) + 1)) AS INT) AS i
  FROM words
),
lens AS (
  SELECT term, cnt, i,
         CAST(unnest(range(1, least({max_piece_len},
                                    length(term) - i + 1) + 1)) AS INT)
           AS l
  FROM starts
),
subs AS (
  SELECT substr(term, i, l) AS piece, cnt FROM lens
)
SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n
FROM subs GROUP BY piece
ORDER BY n DESC, piece
LIMIT {k}
"""


def bigram_lm_rarity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document rarity under the corpus BIGRAM language model:
    DataFrame[doc_id, n_bigrams, bigram_rarity] with

        bigram_rarity = avg over the doc's adjacent token pairs (u, v)
                        of (2·c(u) + V) / (2·c(u, v) + 1)

    — the mean INVERSE add-½-smoothed conditional probability
    p(v | u) = (c(u,v) + ½) / (c(u) + V/2), with c(u) the corpus
    unigram count, c(u,v) the corpus bigram count, V the unigram
    vocabulary size. Documents whose token TRANSITIONS are improbable
    under the corpus (shuffled text, template keys, boilerplate
    stitching) score high even when every individual token is common —
    the signal a CCNet/KenLM perplexity filter adds over a unigram
    filter, at the first LM order where context exists.

    Portability: the :func:`unigram_rarity` contract — every term is a
    ratio of exact integers (IEEE-exact in doubles), the per-document
    sum runs in position order on BOTH engines, no libm log anywhere.
    Smoothing detail (documented): the context count is the plain
    unigram count c(u) — which counts document-final tokens too — not
    the followed-by-anything count; both are standard, this one needs
    no second aggregation.

    Plan: one bigram count over the corpus (word-count shape, map-side
    combined), one unigram count, a broadcast 1-row vocab scalar, one
    bigram-keyed join + one context-keyed join of the exploded stream,
    and a per-doc ordered-sum aggregation. The bigram table is the only
    intermediate that grows super-linearly in vocabulary (it is bounded
    by corpus positions); both joins key on high-cardinality strings.
    """
    pairs = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(F.col(text_col), 2)).alias(
            "idx", "bigram"
        ),
    ).select(
        "doc_id",
        "idx",
        "bigram",
        F.split(F.col("bigram"), " ")[0].alias("u"),
    )
    bi_counts = pairs.groupBy("bigram").agg(
        F.count("*").cast("long").alias("c_uv")
    )
    uni = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).groupBy("term").agg(F.count("*").cast("long").alias("c_u"))
    vocab = uni.agg(F.count("*").cast("long").alias("vocab"))
    weighted = (
        pairs.join(bi_counts, "bigram")
        .join(uni.withColumnRenamed("term", "u"), "u")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "idx",
            (
                (2 * F.col("c_u") + F.col("vocab")).cast("double")
                / (2 * F.col("c_uv") + 1).cast("double")
            ).alias("w"),
        )
    )
    return weighted.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("idx", "w"))),
                    lambda s: s["w"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count("*"),
            6,
        ).alias("bigram_rarity"),
    )


def bigram_lm_rarity_sql() -> str:
    """DuckDB twin of :func:`bigram_lm_rarity` (identical integer
    ratios, identical position-ordered summation)."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
pairs AS (
  SELECT doc_id,
         unnest(range(len(toks) - 1)) AS idx,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i] || ' ' || toks[i + 1]))
           AS bigram,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i])) AS u
  FROM base
),
bi_counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_uv
  FROM pairs GROUP BY bigram
),
uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c_u
  FROM (SELECT unnest(toks) AS term FROM base) GROUP BY term
),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM uni),
weighted AS (
  SELECT p.doc_id, p.idx,
         CAST(2 * uni.c_u + vocab.vocab AS DOUBLE)
         / CAST(2 * b.c_uv + 1 AS DOUBLE) AS w
  FROM pairs p
  JOIN bi_counts b USING (bigram)
  JOIN uni ON uni.term = p.u
  CROSS JOIN vocab
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       ROUND(list_sum(list(w ORDER BY idx)) / COUNT(*), 6)
         AS bigram_rarity
FROM weighted GROUP BY doc_id
"""


def kneser_ney_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean Kneser-Ney bigram probability, integer-exact:
    DataFrame[doc_id, n_bigrams, kn_score_micro] with

        p_KN(v | u) = max(c(u,v) - D, 0) / c(u·)
                      + (D · N1+(u,·) / c(u·)) · N1+(·,v) / N1+(··)

    at the textbook absolute discount D = 3/4, materialized in integer
    MICRO units as two floor divisions (4·c clears the discount):

        p_micro = (1_000_000 · greatest(4·c_uv - 3, 0)) div (4·c_ctx)
                + (1_000_000 · 3 · n1u · n1v) div (4 · c_ctx · nbb)

    and the document score = (Σ p_micro) div n_bigrams — all BIGINT,
    bit-identical across engines (the no-libm-log convention). Where
    :func:`bigram_lm_rarity` is the add-½ first cut, this is the
    proper interpolated KN estimator the KenLM/CCNet perplexity
    filters actually use: mass freed by discounting observed bigrams
    is redistributed by CONTINUATION counts (how many distinct
    contexts a word follows), so "Francisco" — frequent but glued to
    one context — stops inflating unseen-bigram probability.

    Definitions: c_ctx(u) = Σ_v c(u,v) (the followed-by-anything
    count — the true KN denominator, one extra groupBy over the
    bigram table; bigram_lm_rarity documents using plain c(u)
    instead), N1+(u,·) = distinct successors of u, N1+(·,v) =
    distinct predecessors of v, N1+(··) = total distinct bigrams. The
    greatest(…, 0) clamp only binds when scoring held-out text whose
    bigrams are absent from the training corpus (self-scoring always
    has c_uv >= 1).

    Plan: the bigram word-count aggregation feeds THREE
    vocabulary-sized derived tables (c_ctx, n1u by context; n1v by
    successor) and one scalar; the corpus-sized stream then takes one
    bigram-keyed join + two token-keyed joins and a per-doc sum —
    order-independent integer addition, so no position-ordered
    collect is needed. Overflow headroom: the continuation numerator
    1e6·3·n1u·n1v stays under 2**63 for n1u·n1v <= 3·10**12 — fine
    through multi-million-token vocabularies; beyond that, split the
    floor division (documented variant, different rounding).
    """
    pairs = docs.select(
        "doc_id",
        F.explode(word_ngrams(F.col(text_col), 2)).alias("bigram"),
    ).select(
        "doc_id",
        "bigram",
        F.split(F.col("bigram"), " ")[0].alias("u"),
        F.split(F.col("bigram"), " ")[1].alias("v"),
    )
    bi = pairs.groupBy("bigram").agg(
        F.count("*").cast("long").alias("c_uv")
    )
    bi_uv = bi.select(
        "bigram",
        "c_uv",
        F.split(F.col("bigram"), " ")[0].alias("u"),
        F.split(F.col("bigram"), " ")[1].alias("v"),
    )
    ctx = bi_uv.groupBy("u").agg(
        F.sum("c_uv").alias("c_ctx"),
        F.count("*").cast("long").alias("n1u"),
    )
    succ = bi_uv.groupBy("v").agg(
        F.count("*").cast("long").alias("n1v")
    )
    nbb = bi.agg(F.count("*").cast("long").alias("nbb"))
    scored = (
        pairs.join(bi.select("bigram", "c_uv"), "bigram")
        .join(ctx, "u")
        .join(succ, "v")
        .crossJoin(F.broadcast(nbb))
        .select(
            "doc_id",
            F.expr(
                "(1000000 * greatest(4 * c_uv - 3, 0)) div (4 * c_ctx)"
                " + (1000000 * 3 * n1u * n1v) div (4 * c_ctx * nbb)"
            ).alias("p_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.expr("sum(p_micro) div count(*)")
        .cast("long")
        .alias("kn_score_micro"),
    )


def kneser_ney_score_sql() -> str:
    """DuckDB twin of :func:`kneser_ney_score` (identical integer
    floor divisions; order-independent integer sums)."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i] || ' ' || toks[i + 1]))
           AS bigram,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i])) AS u,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i + 1])) AS v
  FROM base
),
bi AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_uv
  FROM pairs GROUP BY bigram
),
bi_uv AS (
  SELECT bigram, c_uv,
         string_split(bigram, ' ')[1] AS u,
         string_split(bigram, ' ')[2] AS v
  FROM bi
),
ctx AS (
  SELECT u, CAST(SUM(c_uv) AS BIGINT) AS c_ctx,
         CAST(COUNT(*) AS BIGINT) AS n1u
  FROM bi_uv GROUP BY u
),
succ AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n1v
  FROM bi_uv GROUP BY v
),
nbb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM bi),
scored AS (
  SELECT p.doc_id,
         (1000000 * GREATEST(4 * b.c_uv - 3, 0)) // (4 * ctx.c_ctx)
         + (1000000 * 3 * ctx.n1u * succ.n1v)
           // (4 * ctx.c_ctx * nbb.nbb) AS p_micro
  FROM pairs p
  JOIN bi b USING (bigram)
  JOIN ctx ON ctx.u = p.u
  JOIN succ ON succ.v = p.v
  CROSS JOIN nbb
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS kn_score_micro
FROM scored GROUP BY doc_id
"""


def bpe_top_pairs_bytes(
    docs: DataFrame, k: int = 30, text_col: str = "text"
) -> DataFrame:
    """Byte-level twin of :func:`bpe_top_pairs`:
    DataFrame[pair, n_pairs] — the ``k`` most frequent adjacent BYTE
    pairs (as 4 hex digits) over the space-prefixed UTF-8 encoding of
    the word vocabulary, each weighted by word frequency. The argmax
    row is byte-level :func:`bpe_train`'s first merge; the hot pairs
    here are dominated by the 0x20-boundary pairs a GPT-2-style
    tokenizer merges first. Same scale shape as the char variant: the
    explode runs over the DISTINCT vocabulary, never the corpus."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "h",
            F.hex(F.encode(F.concat(F.lit(" "), F.col("term")), "UTF-8")),
        )
    )
    return (
        words.where(F.length("h") >= 4)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(h) div 2 - 1), "
                    "i -> substring(h, 2*i - 1, 4))"
                )
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "pair")
        .limit(k)
    )


def bpe_top_pairs_bytes_sql(k: int = 30) -> str:
    """DuckDB twin of :func:`bpe_top_pairs_bytes` (same space-prefixed
    UTF-8 hex spelling, same vocabulary collapse)."""
    return f"""
WITH words AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY term
),
hexed AS (
  SELECT hex(encode(' ' || term)) AS h, cnt FROM words
),
pairs AS (
  SELECT substr(h, CAST(2*i - 1 AS INT), 4) AS pair, cnt
  FROM (
    SELECT h, cnt, unnest(range(1, length(h) // 2)) AS i
    FROM hexed WHERE length(h) >= 4
  )
)
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_pairs
FROM pairs GROUP BY pair
ORDER BY n_pairs DESC, pair
LIMIT {k}
"""


def wordpiece_top_pairs(
    docs: DataFrame, k: int = 30, text_col: str = "text"
) -> DataFrame:
    """The WordPiece objective's first-round ranking:
    DataFrame[pair, n_pairs, score] — adjacent character pairs scored
    by the portable likelihood gain ``(1_000_000·c(ab)) div
    (c(a)·c(b))`` (see bpe_train(objective='likelihood')), top-``k``
    by (score DESC, pair). The argmax row is the likelihood trainer's
    first merge; rare-symbol pairs outrank raw-frequency winners —
    the ranking difference between the BERT and GPT trainer families,
    as a query. Same vocabulary-collapse scale shape as bpe_top_pairs.
    """
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    syms = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(term)), "
                    "i -> substring(term, i, 1))"
                )
            ).alias("sym"),
            "cnt",
        )
        .groupBy("sym")
        .agg(F.sum("cnt").cast("long").alias("n_sym"))
    )
    pairs = (
        words.where(F.length("term") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(term) - 1), "
                    "i -> substring(term, i, 2))"
                )
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n_pairs"))
    )
    return (
        pairs.join(
            syms.select(
                F.expr("sym").alias("a_sym"), F.col("n_sym").alias("na")
            ),
            F.expr("substring(pair, 1, 1)") == F.col("a_sym"),
        )
        .join(
            syms.select(
                F.expr("sym").alias("b_sym"), F.col("n_sym").alias("nb")
            ),
            F.expr("substring(pair, 2, 1)") == F.col("b_sym"),
        )
        .select(
            "pair",
            "n_pairs",
            F.expr("(1000000 * n_pairs) div (na * nb)").alias("score"),
        )
        .orderBy(F.col("score").desc(), "pair")
        .limit(k)
    )


def wordpiece_top_pairs_sql(k: int = 30) -> str:
    """DuckDB twin of :func:`wordpiece_top_pairs`."""
    return f"""
WITH words AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY term
),
syms AS (
  SELECT substr(term, CAST(i AS INT), 1) AS sym,
         CAST(SUM(cnt) AS BIGINT) AS n_sym
  FROM (
    SELECT term, cnt, unnest(range(1, length(term) + 1)) AS i
    FROM words
  ) GROUP BY sym
),
pairs AS (
  SELECT substr(term, CAST(i AS INT), 2) AS pair,
         CAST(SUM(cnt) AS BIGINT) AS n_pairs
  FROM (
    SELECT term, cnt, unnest(range(1, length(term))) AS i
    FROM words WHERE length(term) >= 2
  ) GROUP BY pair
)
SELECT pair, n_pairs,
       (1000000 * n_pairs) // (sa.n_sym * sb.n_sym) AS score
FROM pairs
JOIN syms sa ON sa.sym = substr(pair, 1, 1)
JOIN syms sb ON sb.sym = substr(pair, 2, 1)
ORDER BY score DESC, pair
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Market-basket frequent token pairs (apriori prefix filter)
# ---------------------------------------------------------------------------


def frequent_token_pairs(
    docs: DataFrame, support_milli: int = 500, text_col: str = "text"
) -> DataFrame:
    """Frequent co-occurring token pairs across documents (the
    market-basket / frequent-itemset level-2 pass, apriori-pruned):
    DataFrame[tok_a, tok_b, n_docs] — pairs present together in at
    least ``support_milli``/1000 of the corpus, tok_a < tok_b.

    The apriori property does the scaling: a pair can only be frequent
    if BOTH items are, so the per-document self-join runs over the
    corpus restricted to frequent tokens (a broadcast semi-join) —
    candidate volume is Σ_d f_d² for f_d frequent tokens in doc d,
    never vocabulary². Support thresholds compare as exact integers
    (cnt·1000 >= support_milli·n) so both engines draw the same line.
    Presence is per-document (array_distinct before the explode):
    a token repeated inside one document counts once, the standard
    basket semantics.
    """
    base = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    )
    total = docs.agg(F.count("*").cast("long").alias("_n"))
    sup = (
        base.groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
        .crossJoin(F.broadcast(total))
        .where(F.col("c") * 1000 >= F.lit(support_milli) * F.col("_n"))
        .select("term")
    )
    ft = base.join(F.broadcast(sup), "term", "left_semi")
    a = ft.select(F.col("doc_id"), F.col("term").alias("tok_a"))
    b = ft.select(F.col("doc_id"), F.col("term").alias("tok_b"))
    return (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .where(
            F.col("n_docs") * 1000 >= F.lit(support_milli) * F.col("_n")
        )
        .select("tok_a", "tok_b", "n_docs")
    )


def frequent_token_pairs_sql(support_milli: int = 500) -> str:
    """DuckDB twin of :func:`frequent_token_pairs` (same exact-integer
    support line, unpruned self-join — agreement certifies the apriori
    pruning loses nothing)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS term
  FROM documents
),
nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT a.term AS tok_a, b.term AS tok_b,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id AND a.term < b.term, nn
GROUP BY a.term, b.term, nn.n
HAVING COUNT(*) * 1000 >= {support_milli} * nn.n
"""


def feature_hash_embed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Hashing-trick document embeddings (Weinberger et al., ICML'09 —
    the Vowpal Wabbit featurizer): token t adds sign(t)·count to
    bucket hash(t) mod dim, giving a fixed-dimension vector with NO
    vocabulary build, no model, and no driver state — the signed hash
    makes bucket collisions cancel in expectation, which is what keeps
    the inner product an unbiased estimate of the exact
    bag-of-words inner product. Output is the sparse flattening
    DataFrame[id, dim_idx, value] (absent buckets are zero; a bucket
    whose signs cancel to 0 IS emitted — the groupBy's honest sum).

    The 100 TB featurizer shape: one Generate + one hash aggregate
    keyed (doc, bucket) — vocabulary-independent, a single shuffle
    whose key count is n_docs·dim at worst, all integer, and both the
    bucket and the sign are md5 draws so DuckDB reproduces every
    vector bit-for-bit.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    hb = hash60(F.concat_ws("-", F.lit("fh-b"), F.lit(str(seed)), F.col("t")))
    hs = hash60(F.concat_ws("-", F.lit("fh-s"), F.lit(str(seed)), F.col("t")))
    signed = toks.select(
        "id",
        (hb % dim).alias("dim_idx"),
        (F.lit(1) - F.lit(2) * (hs % 2)).cast("long").alias("s"),
    )
    return (
        signed.groupBy("id", "dim_idx")
        .agg(F.sum("s").alias("value"))
        .select(F.col("id").alias(id_col), "dim_idx", "value")
    )


def feature_hash_embed_sql(dim: int = 16, seed: int = 0) -> str:
    """DuckDB twin of :func:`feature_hash_embed`."""
    hb = hash60_sql(f"concat('fh-b', '-', '{seed}', '-', t)")
    hs = hash60_sql(f"concat('fh-s', '-', '{seed}', '-', t)")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({_TOKS_SQL}) AS t FROM documents
),
signed AS (
  SELECT id, ({hb}) % {dim} AS dim_idx,
         CAST(1 - 2 * (({hs}) % 2) AS BIGINT) AS s
  FROM toks
)
SELECT id AS doc_id, dim_idx, CAST(SUM(s) AS BIGINT) AS value
FROM signed GROUP BY id, dim_idx
"""


def heaps_vocab_growth(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_steps: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: the corpus in ``n_steps``
    equal prefixes (by the total ``id_col`` order) and the CUMULATIVE
    distinct-token count at each prefix — DataFrame[step, n_docs,
    vocab]. The collection-curation view of "is more data still buying
    new vocabulary": a flattening curve means the corpus has saturated
    its domain (Heaps 1978; the V(n) = K·n^β empiricism).

    One corpus pass, no per-step rescans: a token's contribution is
    decided by the FIRST prefix it appears in (min step per token), so
    vocab(s) = Σ_{fs <= s} new(fs) — the cumulative sum runs over
    ``n_steps`` rows, not data. Doc ranks come from the two-pass
    distributed global_rank (never a single-partition window over
    data); the only windows here order <= n_steps rows.
    """
    from pyspark.sql import Window

    from .relational import global_rank

    n = docs.count()
    ranked = global_rank(
        docs.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
        ),
        "_id",
        rank_col="rk",
    )
    stepped = ranked.select(
        "_id",
        "_text",
        (
            F.lit(1)
            + F.expr(f"((rk - 1) * {n_steps}) div {n}")
        ).cast("long").alias("step"),
    )
    first = (
        stepped.select(
            "step", F.explode(tokens(F.col("_text"))).alias("t")
        )
        .groupBy("t")
        .agg(F.min("step").alias("fs"))
    )
    newv = first.groupBy(F.col("fs").alias("step")).agg(
        F.count("*").alias("nv")
    )
    dsteps = stepped.groupBy("step").agg(F.count("*").alias("nd"))
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dsteps.join(newv, "step", "left")
        .select(
            "step",
            F.sum("nd").over(w).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("vocab"),
        )
    )


def heaps_vocab_growth_sql(n_steps: int = 10) -> str:
    """DuckDB twin of :func:`heaps_vocab_growth` (ROW_NUMBER over the
    unique doc_id is the same total order as global_rank's)."""
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
stepped AS (
  SELECT doc_id, text,
         CAST(1 + ((ROW_NUMBER() OVER (ORDER BY doc_id) - 1)
                   * {n_steps}) // nn.n AS BIGINT) AS step
  FROM documents, nn
),
tok AS (
  SELECT step, unnest({_TOKS_SQL}) AS t
  FROM (SELECT step, text FROM stepped)
),
first AS (SELECT t, MIN(step) AS fs FROM tok GROUP BY t),
newv AS (SELECT fs AS step, COUNT(*) AS nv FROM first GROUP BY fs),
dsteps AS (SELECT step, COUNT(*) AS nd FROM stepped GROUP BY step)
SELECT d.step,
       CAST(SUM(d.nd) OVER (ORDER BY d.step) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(v.nv, 0)) OVER (ORDER BY d.step) AS BIGINT)
         AS vocab
FROM dsteps d LEFT JOIN newv v ON d.step = v.step
"""


def langid_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID evaluation against the labeled ``lang`` column:
    DataFrame[actual_lang, pred_lang, n_docs] — the confusion matrix a
    curation pipeline checks before trusting the classifier's routing
    (which pairs of languages the marker heuristic confuses, and how
    much lands in 'und'). One classify pass + one tiny aggregate."""
    preds = language_id(docs, text_col)
    return (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(preds, "doc_id")
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def langid_confusion_sql() -> str:
    """DuckDB twin of :func:`langid_confusion`."""
    return f"""
WITH preds AS ({language_id_sql()})
SELECT d.lang AS actual_lang, p.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN preds p ON p.doc_id = d.doc_id
GROUP BY 1, 2
"""


def bpe_apply_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE piece counts under a GIVEN merge list:
    DataFrame[doc_id, token, n] — :func:`bpe_apply` followed by one
    explode + count. The serving half of the tokenizer story: the
    model (merge list) is an input parameter, the application is a
    pure per-row Catalyst map, and the output is directly
    hash-comparable. Pair with :func:`bpe_train` in production; the
    registered query pins a hand-chosen merge list so the oracle twin
    (:func:`bpe_apply_counts_sql`) receives the identical model as
    literals — the PQ-codebook parameter pattern."""
    toks = bpe_apply(docs, merges, text_col)
    return (
        toks.select(
            "doc_id", F.explode(F.col("bpe_tokens")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("n"))
    )


def bpe_apply_counts_sql(merges: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`bpe_apply_counts` (char level): the same
    framed-cell encode and the same in-order chained replace — both
    engines' ``replace`` substitutes left-to-right non-overlapping,
    which is the trainer's semantics."""
    sep = _BPE_SEP
    frame = (
        "concat('{s}', array_to_string(list_transform("
        "generate_series(1, length(w)), i -> substring(w, i, 1)), "
        "'{s}{s}'), '{s}')"
    ).format(s=sep)
    cell = frame
    expr = "e"
    for a, b in merges:
        pat = f"{sep}{a}{sep}{sep}{b}{sep}"
        rep = f"{sep}{a}{b}{sep}"
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"""
WITH enc AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(text, ' '),
                       w -> w <> '' AND NOT contains(w, '{sep}')),
           w -> {cell}) AS cells
  FROM documents
),
merged AS (
  SELECT doc_id,
         list_transform(cells, e -> {expr}) AS cells
  FROM enc
),
toks AS (
  SELECT doc_id,
         unnest(flatten(list_transform(cells,
           e -> string_split(substring(e, 2, length(e) - 2),
                             '{sep}{sep}')))) AS token
  FROM merged
)
SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n
FROM toks GROUP BY doc_id, token
"""


def bigram_lift_top(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by LIFT — the PMI family's exactly-computable
    member: DataFrame[bigram, c_uv, c_u, c_v, lift_milli], the k
    strongest-associated adjacent token pairs with corpus support
    ≥ ``min_count``.

        lift_milli = ⌊1000 · N·c(u,v) / (c(u,·)·c(·,v))⌋

    with N the total bigram positions and c(u,·)/c(·,v) the START/END
    position marginals (so Σ_u c(u,·) = N exactly — the clean
    contingency normalization; PMI is log(lift), monotone, so the
    RANKING is PMI's with no libm log anywhere). The wide product runs
    in DECIMAL(38,0)/HUGEINT: 1000·N·c_uv must stay under 10^38,
    true for any corpus whose positions fit BIGINT.

    The ``min_count`` floor is the textbook guard against the
    hapax-pair degeneracy (a 1-1-1 pair has maximal lift and zero
    evidence). Ties break by bigram text — total order.

    Plan: one bigram count (word-count shape), two marginal
    re-aggregations OF THE BIGRAM TABLE (never the corpus again), two
    vocabulary-keyed joins, TakeOrderedAndProject for the top-k.
    """
    bi = (
        docs.select(
            F.explode(word_ngrams(F.col(text_col), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("c_uv"))
        .select(
            "bigram",
            "c_uv",
            F.split(F.col("bigram"), " ")[0].alias("u"),
            F.split(F.col("bigram"), " ")[1].alias("v"),
        )
    )
    start = bi.groupBy("u").agg(F.sum("c_uv").cast("long").alias("c_u"))
    end = bi.groupBy("v").agg(F.sum("c_uv").cast("long").alias("c_v"))
    total = bi.agg(F.sum("c_uv").cast("long").alias("n_total"))
    return (
        bi.where(F.col("c_uv") >= min_count)
        .join(start, "u")
        .join(end, "v")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "c_uv",
            "c_u",
            "c_v",
            F.expr(
                "CAST((1000 * CAST(n_total AS DECIMAL(38,0)) * c_uv)"
                " div (CAST(c_u AS DECIMAL(38,0)) * c_v) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy(F.col("lift_milli").desc(), "bigram")
        .limit(k)
    )


def bigram_lift_top_sql(min_count: int = 5, k: int = 20) -> str:
    """DuckDB twin of :func:`bigram_lift_top`."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
bi AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_uv,
         string_split(bigram, ' ')[1] AS u,
         string_split(bigram, ' ')[2] AS v
  FROM (
    SELECT unnest(list_transform(
             range(1, greatest(len(toks) - 1, 0) + 1),
             i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM base
  ) GROUP BY bigram
),
st AS (SELECT u, CAST(SUM(c_uv) AS BIGINT) AS c_u FROM bi GROUP BY u),
en AS (SELECT v, CAST(SUM(c_uv) AS BIGINT) AS c_v FROM bi GROUP BY v),
tot AS (SELECT CAST(SUM(c_uv) AS BIGINT) AS n_total FROM bi)
SELECT b.bigram, b.c_uv, st.c_u, en.c_v,
       CAST((1000 * CAST(t.n_total AS HUGEINT) * b.c_uv)
            // (CAST(st.c_u AS HUGEINT) * en.c_v) AS BIGINT)
         AS lift_milli
FROM bi b JOIN st USING (u) JOIN en USING (v) CROSS JOIN tot t
WHERE b.c_uv >= {min_count}
ORDER BY lift_milli DESC, b.bigram
LIMIT {k}
"""
