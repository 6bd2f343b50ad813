"""Distributed closed-form ridge regression — the learned-linear
quality scorer next to the rule gates.

The pattern (CCNet / LLaMA pipelines): an EXPENSIVE gate labels a
corpus once, then a CHEAP linear model trained on those labels scores
everything at scan speed. Here the Gopher rule gate
(curation.gopher_quality_report) is the teacher and the student is a
ridge regression over three integer document features — fit in closed
form by the normal equations, so "training" is ONE distributed
aggregation (the 4x4 Gram matrix + moment vector, all BIGINT-exact
map-side-combinable sums) and the solve is Cramer's rule expressed
INSIDE the plan over exact wide-integer arithmetic (DECIMAL(38,0) on
Spark, HUGEINT on DuckDB — the twin evaluates the structurally
identical expression, so the solve itself is value-oracled, no
driver-side numpy and no pinned coefficients anywhere).

100 TB shape: the Gram aggregation is a full-scan map-side combine to
ONE 14-column row (no groupBy key at all — partial aggregation does
all the work); the solve is O(1) on that row; scoring re-joins the
1-row coefficient table back by broadcast and is a pure per-row
Catalyst projection. Nothing shuffles but the 14 partial sums.

Not in the reference (no learned operators there; cf. the engine's
other teacher→student pair, dsir_importance). Determinism: every
intermediate until the final betas is an exact integer in both
engines; the betas and scores are IEEE doubles produced by the same
operations in the same order, rounded to 6 dp like every float the
oracle hashes (textstats.quality_scores convention).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .curation import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
)
from .textstats import _TOKS_SQL, STOPWORDS

# ridge strength on the feature diagonal (never the intercept) — in
# squared-feature units; also what keeps the system nonsingular when a
# feature is constant (e.g. x3 = 100 on an all-alphabetic fixture)
RIDGE_LAMBDA = 100

# feature caps keep every Gram entry inside the exactness budget:
# x <= 200, so sum(x_i * x_j) <= 4e4 * n and the 4x4 Cramer terms
# (products of four Gram entries) stay < 1e35 << the DECIMAL(38,0) /
# HUGEINT ceiling at any realistic row count
X1_CAP = 200  # words
X2_CAP = 100  # distinct stopword hits
Y_PASS = 100  # centi label: 100 = passes the Gopher gate


def _sign(perm: tuple[int, ...]) -> int:
    s = 1
    p = list(perm)
    for i in range(len(p)):
        while p[i] != i:
            j = p[i]
            p[i], p[j] = p[j], p[i]
            s = -s
    return s


def _det4(m: list[list[str]], cast: str) -> str:
    """Leibniz determinant of a 4x4 symbolic matrix as ONE expression
    string, every factor wrapped in ``CAST(x AS {cast})`` so the 24
    four-entry products are exact wide integers in either engine
    (DECIMAL(38,0) keeps scale 0 through staged multiplication on
    Spark; HUGEINT is 128-bit on DuckDB). The string is engine-neutral
    apart from the cast target, so both sides evaluate the same
    operation tree."""
    terms = []
    for perm in permutations(range(4)):
        prod = " * ".join(
            f"CAST({m[i][perm[i]]} AS {cast})" for i in range(4)
        )
        terms.append(("+ " if _sign(perm) > 0 else "- ") + f"({prod})")
    return "(0 " + " ".join(terms) + ")"


def _gram_matrix(lam: int) -> list[list[str]]:
    """The ridge-shifted Gram matrix [[n, Sx1, ...], ...] as column
    names of the aggregated 1-row table, lambda added on the feature
    diagonal only."""
    g = [
        ["g00", "g01", "g02", "g03"],
        ["g01", f"(g11 + {lam})", "g12", "g13"],
        ["g02", "g12", f"(g22 + {lam})", "g23"],
        ["g03", "g13", "g23", f"(g33 + {lam})"],
    ]
    return g


def _beta_exprs(cast: str, lam: int = RIDGE_LAMBDA) -> dict[str, str]:
    """det + per-coefficient Cramer numerators as expression strings
    over the gram columns g00..g33 / r0..r3."""
    m = _gram_matrix(lam)
    rhs = ["r0", "r1", "r2", "r3"]
    out = {"det": _det4(m, cast)}
    for j in range(4):
        mj = [row[:] for row in m]
        for i in range(4):
            mj[i][j] = rhs[i]
        out[f"det{j}"] = _det4(mj, cast)
    return out


def quality_features(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, x1, x2, x3, y): the integer feature row the regression
    trains and scores on. x1 = capped word count, x2 = capped distinct
    stopword hits, x3 = centi alphabetic-word fraction (floor-div of
    integer counts — exact); y = 100 iff the document passes the
    Gopher gate (same expressions, rounding, and thresholds as
    curation.gopher_quality_report)."""
    toks = tokens(F.col(text_col))
    stopset = F.array(*[F.lit(w) for w in STOPWORDS])
    raw = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).alias(
            "n_alpha"
        ),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        .alias("sum_len"),
        F.size(F.array_intersect(F.array_distinct(toks), stopset))
        .alias("stop_hits"),
    )
    mean_len = F.round(
        F.col("sum_len").cast("double") / F.col("n_words"), 6
    )
    alpha_frac = F.round(
        F.col("n_alpha").cast("double") / F.col("n_words"), 6
    )
    passes = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return raw.select(
        "doc_id",
        F.least(F.col("n_words"), F.lit(X1_CAP)).cast("int").alias("x1"),
        F.least(F.col("stop_hits"), F.lit(X2_CAP))
        .cast("int")
        .alias("x2"),
        # floor division of two positive integers — exact in both
        # engines (Spark DIV, DuckDB //), no float in the feature path
        F.expr("(100 * n_alpha) DIV n_words").cast("int").alias("x3"),
        F.when(passes, F.lit(Y_PASS)).otherwise(F.lit(0))
        .cast("int")
        .alias("y"),
    )


# the 14 Gram/moment column names, in the order gram_sums emits them —
# also the streaming state vector (streaming/regression_stream.py folds
# these as exact Python ints; BIGINT sums are additive)
GRAM_COLS = (
    "g00", "g01", "g02", "g03", "g11", "g12", "g13",
    "g22", "g23", "g33", "r0", "r1", "r2", "r3",
)


def gram_sums(feats: DataFrame) -> DataFrame:
    """1-row DataFrame[g00..g33, r0..r3]: the normal-equation
    sufficient statistics — 14 exact BIGINT sums, pure map-side
    combine (no groupBy key; the only shuffle is the partial rows)."""
    return feats.agg(
        F.count(F.lit(1)).cast("long").alias("g00"),
        F.sum("x1").cast("long").alias("g01"),
        F.sum("x2").cast("long").alias("g02"),
        F.sum("x3").cast("long").alias("g03"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("g11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("g12"),
        F.sum(F.col("x1") * F.col("x3")).cast("long").alias("g13"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("g22"),
        F.sum(F.col("x2") * F.col("x3")).cast("long").alias("g23"),
        F.sum(F.col("x3") * F.col("x3")).cast("long").alias("g33"),
        F.sum("y").cast("long").alias("r0"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("r1"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("r2"),
        F.sum(F.col("x3") * F.col("y")).cast("long").alias("r3"),
    )


def betas_from_gram(gram: DataFrame, lam: int = RIDGE_LAMBDA) -> DataFrame:
    """The in-plan Cramer solve over a 1-row Gram table (from
    :func:`gram_sums` OR from streaming running totals — the shared
    solve is what makes the streaming twin bit-exact by construction):
    DataFrame[det, b0..b3], det the exact ridge-Gram determinant cast
    to double, b_j = det_j / det."""
    ex = _beta_exprs("DECIMAL(38,0)", lam)
    dets = gram.select(
        *[
            F.expr(f"CAST({ex[k]} AS DOUBLE)").alias(k)
            for k in ("det", "det0", "det1", "det2", "det3")
        ]
    )
    return dets.select(
        "det",
        *[
            (F.col(f"det{j}") / F.col("det")).alias(f"b{j}")
            for j in range(4)
        ],
    )


def _ridge_betas_df(feats: DataFrame, lam: int = RIDGE_LAMBDA) -> DataFrame:
    """Gram aggregation + Cramer solve, unrounded."""
    return betas_from_gram(gram_sums(feats), lam)


def ridge_betas(
    docs: DataFrame, text_col: str = "text", lam: int = RIDGE_LAMBDA
) -> DataFrame:
    """The fitted model itself: DataFrame[det, b0, b1, b2, b3] (one
    row; det rounded to survive the double cast identically, betas
    rounded 6 dp). Oracled end-to-end — the twin re-derives the same
    Cramer expression over HUGEINT, so a single wrong Gram sum or a
    flipped cofactor sign fails the hash."""
    b = _ridge_betas_df(quality_features(docs, text_col), lam)
    return b.select(
        F.col("det"),
        *[F.round(F.col(f"b{j}"), 6).alias(f"b{j}") for j in range(4)],
    )


def ridge_quality_scores(
    docs: DataFrame, text_col: str = "text", lam: int = RIDGE_LAMBDA
) -> DataFrame:
    """Every document scored by the closed-form ridge fit:
    DataFrame[doc_id, x1, x2, x3, y, score] — score = b0 + b1 x1 +
    b2 x2 + b3 x3 rounded 6 dp, the broadcast of a 1-row coefficient
    table onto a per-row projection (scan-speed inference)."""
    feats = quality_features(docs, text_col)
    betas = _ridge_betas_df(feats, lam).select("b0", "b1", "b2", "b3")
    return feats.crossJoin(F.broadcast(betas)).select(
        "doc_id",
        "x1",
        "x2",
        "x3",
        "y",
        F.round(
            F.col("b0")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
            + F.col("b3") * F.col("x3"),
            6,
        ).alias("score"),
    )


def _features_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
t AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           AS n_alpha,
         ROUND(CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks), 6) AS mean_word_len,
         CAST(len(list_intersect(list_distinct(toks), [{stops}]))
              AS INT) AS stop_hits
  FROM t
),
f AS (
  SELECT doc_id,
         CAST(LEAST(n_words, {X1_CAP}) AS INT) AS x1,
         CAST(LEAST(stop_hits, {X2_CAP}) AS INT) AS x2,
         CAST((100 * n_alpha) // n_words AS INT) AS x3,
         CAST(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                    AND n_words <= {GOPHER_MAX_WORDS}
                    AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN!r}
                    AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN!r}
                    AND ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6)
                        >= {GOPHER_MIN_ALPHA_FRAC!r}
                    AND stop_hits >= {GOPHER_MIN_STOP_HITS}
               THEN {Y_PASS} ELSE 0 END AS INT) AS y
  FROM m
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g00,
         CAST(SUM(x1) AS BIGINT) AS g01,
         CAST(SUM(x2) AS BIGINT) AS g02,
         CAST(SUM(x3) AS BIGINT) AS g03,
         CAST(SUM(x1 * x1) AS BIGINT) AS g11,
         CAST(SUM(x1 * x2) AS BIGINT) AS g12,
         CAST(SUM(x1 * x3) AS BIGINT) AS g13,
         CAST(SUM(x2 * x2) AS BIGINT) AS g22,
         CAST(SUM(x2 * x3) AS BIGINT) AS g23,
         CAST(SUM(x3 * x3) AS BIGINT) AS g33,
         CAST(SUM(y) AS BIGINT) AS r0,
         CAST(SUM(x1 * y) AS BIGINT) AS r1,
         CAST(SUM(x2 * y) AS BIGINT) AS r2,
         CAST(SUM(x3 * y) AS BIGINT) AS r3
  FROM f
)"""


def _betas_sql(lam: int = RIDGE_LAMBDA) -> str:
    ex = _beta_exprs("HUGEINT", lam)
    det_cols = ",\n         ".join(
        f"CAST({ex[k]} AS DOUBLE) AS {k}"
        for k in ("det", "det0", "det1", "det2", "det3")
    )
    return f"""
d AS (
  SELECT {det_cols} FROM g
),
b AS (
  SELECT det,
         det0 / det AS b0, det1 / det AS b1,
         det2 / det AS b2, det3 / det AS b3
  FROM d
)"""


def ridge_betas_sql(lam: int = RIDGE_LAMBDA) -> str:
    """DuckDB twin of :func:`ridge_betas` — HUGEINT Cramer over the
    identical Gram sums."""
    return f"""
WITH {_features_sql()},
{_betas_sql(lam)}
SELECT det, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
       ROUND(b2, 6) AS b2, ROUND(b3, 6) AS b3
FROM b
"""


def ridge_quality_scores_sql(lam: int = RIDGE_LAMBDA) -> str:
    """DuckDB twin of :func:`ridge_quality_scores`."""
    return f"""
WITH {_features_sql()},
{_betas_sql(lam)}
SELECT f.doc_id, f.x1, f.x2, f.x3, f.y,
       ROUND(b.b0 + b.b1 * f.x1 + b.b2 * f.x2 + b.b3 * f.x3, 6)
         AS score
FROM f, b
"""


def quality_calibration_report(
    docs: DataFrame,
    text_col: str = "text",
    lam: int = RIDGE_LAMBDA,
    n_buckets: int = 10,
) -> DataFrame:
    """Calibration of the LEARNED quality scorer against the
    rule-based Gopher gate: DataFrame[bucket, n_docs, n_pass,
    pass_milli, min_score, max_score] — documents decile-bucketed by
    learned score (bucket 0 = lowest), with each bucket's rule-gate
    pass rate in integer milli.

    The ML-ops check a pipeline runs before trusting a learned
    filter: if the top deciles don't pass the hard gate more often
    than the bottom ones, the scorer isn't ranking quality. Buckets
    come from the deterministic (score, doc_id) total order through
    the engine's two-pass distributed rank (relational.global_rank —
    never a single-partition window), bucket = ((rank-1)·B) div N, so
    the report is exactly reproducible cross-engine: DuckDB ranks the
    same total order and floors the same division.

    Plan: two narrow feature passes (the scorer's fit + projection,
    the gate's row predicate), one doc_id join, the two-pass rank's
    skinny shuffle, one B-row aggregation.
    """
    from .curation import gopher_quality_report
    from .relational import global_rank

    scores = ridge_quality_scores(docs, text_col, lam).select(
        "doc_id", "score"
    )
    gate = gopher_quality_report(docs, text_col).select(
        "doc_id", "passes"
    )
    ranked = global_rank(scores, "score", "doc_id", rank_col="rk")
    total = ranked.agg(F.count("*").cast("long").alias("n_total"))
    return (
        ranked.join(gate, "doc_id")
        .crossJoin(F.broadcast(total))
        .select(
            F.expr(f"((rk - 1) * {n_buckets}) div n_total")
            .cast("int")
            .alias("bucket"),
            "passes",
            "score",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("passes").cast("long")).alias("n_pass"),
            F.expr(
                "(1000 * sum(cast(passes as long))) div count(*)"
            ).alias("pass_milli"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


def quality_calibration_report_sql(
    lam: int = RIDGE_LAMBDA, n_buckets: int = 10
) -> str:
    """DuckDB twin of :func:`quality_calibration_report` (identical
    total order, identical floor divisions)."""
    from .curation import gopher_quality_report_sql

    return f"""
WITH scores AS ({ridge_quality_scores_sql(lam)}),
gate AS ({gopher_quality_report_sql()}),
ranked AS (
  SELECT s.doc_id, s.score,
         ROW_NUMBER() OVER (ORDER BY s.score, s.doc_id) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_total
  FROM scores s
),
b AS (
  SELECT CAST(((rk - 1) * {n_buckets}) // n_total AS INT) AS bucket,
         g.passes, r.score
  FROM ranked r JOIN gate g USING (doc_id)
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST((1000 * SUM(CASE WHEN passes THEN 1 ELSE 0 END)) // COUNT(*)
         AS BIGINT) AS pass_milli,
       MIN(score) AS min_score,
       MAX(score) AS max_score
FROM b GROUP BY bucket
"""


CONFORMAL_SEED = "conf-v1"


def conformal_coverage_report(
    docs: DataFrame,
    text_col: str = "text",
    lam: int = RIDGE_LAMBDA,
    alpha_permille: int = 100,
) -> DataFrame:
    """Split-conformal prediction intervals for the ridge quality
    scorer, with their finite-sample guarantee CHECKED on held-out
    data — one row: DataFrame[n_cal, n_test, q_milli, n_covered,
    coverage_milli].

    Split conformal (Papadopoulos et al. 2002; Lei et al. 2018 §2):
    hash-split the corpus 50/50 (md5 counter-PRNG, so the split is a
    pure row function both engines replay), compute absolute residuals
    |y − ŷ| on the CALIBRATION half, take the
    k = ⌈(n_cal+1)(1−α)⌉-th smallest as the radius q̂; then
    [ŷ − q̂, ŷ + q̂] on the TEST half covers y with probability
    ≥ 1−α, distribution-free. The report realizes that check:
    ``coverage_milli`` should sit at/above ``1000 − alpha_permille``
    up to binomial noise — the pre-deployment calibration audit for
    any learned scorer the pipeline ships.

    Integer-exact: residuals in rounded milli, q̂ by the engine's
    two-pass distributed rank (relational.global_rank — never a
    single-partition window) with doc_id tie-break; k clamps to n_cal
    when ⌈(n_cal+1)(1−α)⌉ > n_cal (the textbook infinite-interval
    case — only at n_cal < 1/α − 1, i.e. single-digit calibration
    sets; the clamp is visible because coverage then reads low).

    Plan: the scorer's one Gram pass + broadcast projection, a skinny
    (r_milli, doc_id) rank shuffle on the calibration half, a 1-row
    broadcast of q̂ onto the test half's aggregate.
    """
    from ..functions.hashing import hash60
    from .relational import global_rank

    scored = ridge_quality_scores(docs, text_col, lam).select(
        "doc_id",
        "y",
        "score",
        F.expr("CAST(ROUND(1000 * ABS(y - score)) AS BIGINT)").alias(
            "r_milli"
        ),
        (
            hash60(
                F.concat(
                    F.lit(CONFORMAL_SEED + ":"),
                    F.col("doc_id").cast("string"),
                )
            )
            < F.lit(1 << 59)
        ).alias("is_cal"),
    )
    cal = scored.where("is_cal")
    ranked = global_rank(
        cal.select("r_milli", "doc_id"), "r_milli", "doc_id",
        rank_col="rk",
    )
    n_cal = ranked.agg(F.count("*").cast("long").alias("n_cal"))
    q = (
        ranked.crossJoin(F.broadcast(n_cal))
        .where(
            F.col("rk")
            == F.expr(
                f"LEAST(n_cal, ((n_cal + 1) * (1000 - {alpha_permille})"
                f" + 999) div 1000)"
            )
        )
        .select("n_cal", F.col("r_milli").alias("q_milli"))
    )
    return (
        scored.where(~F.col("is_cal"))
        .crossJoin(F.broadcast(q))
        .groupBy("n_cal", "q_milli")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (F.col("r_milli") <= F.col("q_milli")).cast("long")
            ).alias("n_covered"),
        )
        .select(
            "n_cal",
            "n_test",
            "q_milli",
            "n_covered",
            F.expr("(1000 * n_covered) div n_test").alias(
                "coverage_milli"
            ),
        )
    )


def conformal_coverage_report_sql(
    lam: int = RIDGE_LAMBDA, alpha_permille: int = 100
) -> str:
    """DuckDB twin of :func:`conformal_coverage_report` — identical
    split hashes, rank arithmetic, and floors."""
    from ..functions.hashing import hash60_sql

    h = hash60_sql(f"'{CONFORMAL_SEED}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH scored0 AS ({ridge_quality_scores_sql(lam)}),
scored AS (
  SELECT doc_id, y, score,
         CAST(ROUND(1000 * ABS(y - score)) AS BIGINT) AS r_milli,
         ({h}) < {1 << 59} AS is_cal
  FROM scored0
),
ranked AS (
  SELECT r_milli,
         ROW_NUMBER() OVER (ORDER BY r_milli, doc_id) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_cal
  FROM scored WHERE is_cal
),
q AS (
  SELECT n_cal, r_milli AS q_milli FROM ranked
  WHERE rk = LEAST(n_cal, ((n_cal + 1) * (1000 - {alpha_permille})
                           + 999) // 1000)
)
SELECT q.n_cal, CAST(COUNT(*) AS BIGINT) AS n_test, q.q_milli,
       CAST(SUM(CASE WHEN s.r_milli <= q.q_milli THEN 1 ELSE 0 END)
            AS BIGINT) AS n_covered,
       CAST((1000 * SUM(CASE WHEN s.r_milli <= q.q_milli
                        THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS coverage_milli
FROM scored s CROSS JOIN q
WHERE NOT s.is_cal
GROUP BY q.n_cal, q.q_milli
"""


def conformal_coverage_by(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    lam: int = RIDGE_LAMBDA,
    alpha_permille: int = 100,
) -> DataFrame:
    """Per-slice split-conformal audit: DataFrame[group, n_cal,
    n_test, q_milli, n_covered, coverage_milli] — group-conditional
    conformal (Vovk 2012's Mondrian form at the group level): each
    slice gets its OWN calibration quantile, so the ≥ 1−α guarantee
    holds PER GROUP, not just marginally. The fairness audit for a
    learned filter: marginal coverage can hide a slice the intervals
    systematically miss; this table can't.

    Same integer conventions as :func:`conformal_coverage_report`;
    the rank window is PARTITIONED by group (parallel across groups,
    never single-partition). Groups whose calibration half is empty
    drop from the output with their test rows (no quantile exists —
    visible as a missing row, not a fabricated interval).
    """
    from ..functions.hashing import hash60

    scored = (
        ridge_quality_scores(docs, text_col, lam)
        .join(docs.select("doc_id", group_col), "doc_id")
        .select(
            "doc_id",
            F.col(group_col).alias("g"),
            F.expr("CAST(ROUND(1000 * ABS(y - score)) AS BIGINT)")
            .alias("r_milli"),
            (
                hash60(
                    F.concat(
                        F.lit(CONFORMAL_SEED + ":"),
                        F.col("doc_id").cast("string"),
                    )
                )
                < F.lit(1 << 59)
            ).alias("is_cal"),
        )
    )
    w = Window.partitionBy("g").orderBy("r_milli", "doc_id")
    wn = Window.partitionBy("g")
    cal = (
        scored.where("is_cal")
        .select(
            "g",
            "r_milli",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wn).cast("long").alias("n_cal"),
        )
        .where(
            F.col("rk")
            == F.expr(
                f"LEAST(n_cal, ((n_cal + 1) * (1000 - {alpha_permille})"
                f" + 999) div 1000)"
            )
        )
        .select("g", "n_cal", F.col("r_milli").alias("q_milli"))
    )
    return (
        scored.where(~F.col("is_cal"))
        .join(cal, "g")
        .groupBy(F.col("g").alias(group_col), "n_cal", "q_milli")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (F.col("r_milli") <= F.col("q_milli")).cast("long")
            ).alias("n_covered"),
        )
        .select(
            group_col,
            "n_cal",
            "n_test",
            "q_milli",
            "n_covered",
            F.expr("(1000 * n_covered) div n_test").alias(
                "coverage_milli"
            ),
        )
    )


def conformal_coverage_by_sql(
    group_col: str = "lang",
    lam: int = RIDGE_LAMBDA,
    alpha_permille: int = 100,
) -> str:
    """DuckDB twin of :func:`conformal_coverage_by`."""
    from ..functions.hashing import hash60_sql

    h = hash60_sql(f"'{CONFORMAL_SEED}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH scored0 AS ({ridge_quality_scores_sql(lam)}),
scored AS (
  SELECT s.doc_id, d.{group_col} AS g,
         CAST(ROUND(1000 * ABS(s.y - s.score)) AS BIGINT) AS r_milli,
         ({h}) < {1 << 59} AS is_cal
  FROM scored0 s JOIN documents d USING (doc_id)
),
cal AS (
  SELECT g, r_milli AS q_milli, n_cal FROM (
    SELECT g, r_milli,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY r_milli, doc_id)
             AS rk,
           CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n_cal
    FROM scored WHERE is_cal
  ) WHERE rk = LEAST(n_cal, ((n_cal + 1) * (1000 - {alpha_permille})
                             + 999) // 1000)
)
SELECT s.g AS {group_col}, c.n_cal, CAST(COUNT(*) AS BIGINT) AS n_test,
       c.q_milli,
       CAST(SUM(CASE WHEN s.r_milli <= c.q_milli THEN 1 ELSE 0 END)
            AS BIGINT) AS n_covered,
       CAST((1000 * SUM(CASE WHEN s.r_milli <= c.q_milli
                        THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS coverage_milli
FROM scored s JOIN cal c USING (g)
WHERE NOT s.is_cal
GROUP BY s.g, c.n_cal, c.q_milli
"""
