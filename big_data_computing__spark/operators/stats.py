"""Resampling and moment estimators: Poisson bootstrap CI + AMS F2.

Two estimator families the reference's surface has no equivalent for,
both built on the engine's counter-based-PRNG contract
(functions/hashing.py): every "random" draw is a pure md5 function of
the row it applies to, so the algorithms are deterministic, order-free,
embarrassingly parallel, and reproducible verbatim in DuckDB SQL.

**Poisson bootstrap** (Chamandy et al., "Estimating Uncertainty for
Massive Data Streams", Google 2012): the classical bootstrap resamples
n rows with replacement R times — impossible in one distributed pass.
The Poisson bootstrap replaces each replicate's multinomial row counts
with independent Poisson(1) weights, which need NO coordination: one
pass computes all R replicate statistics simultaneously. Replicate r's
weight for a row is the Poisson(1) inverse CDF applied to the 60-bit
hash of (seed, row id, r) — eight pinned integer thresholds, identical
in both engines, no floating point anywhere. The confidence interval is
exact order statistics over the R replicate means.

**AMS F2 sketch** (Alon, Matias, Szegedy, STOC'96): the second
frequency moment F2 = Σ f_i² (self-join size / skew mass) estimated by
S sign-counters: counter_s = Σ_i sign_s(i)·f_i with sign_s(i) ∈ {±1}
from the md5 hash, E[counter²] = F2. Median-of-means over G groups
gives the usual concentration. Counters are linear in the input, hence
mergeable across partitions, batches, and streams (the streaming twin
F2State in streaming/frequent_stream.py folds arrivals one by one into
the same S integers and stays bit-identical to the batch evaluation).

Scale notes: the bootstrap expands each row by R *before* the partial
aggregate, so the shuffle carries R rows per task, not R×data; the F2
batch evaluation applies signs to the per-item exact counts (identical
by linearity of the counters), so the sign expansion touches only the
vocabulary. |counter| ≤ n keeps counter² inside BIGINT while
n ≤ 3·10^9 per sketch scope; shard wider streams by key and merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..functions.hashing import hash60, hash60_sql
from ..functions.sqlsafe import sql_str

# Poisson(1) inverse-CDF thresholds scaled to 2^60: weight w(h) for a
# 60-bit hash h is the number of thresholds <= h (i.e. w >= k+1 iff
# h >= T[k]), capping at 8 — P(w=8 drawn as cap) < 1.1e-5. Pinned
# integers so Spark and DuckDB take bit-identical decisions.
POISSON1_T60 = [
    424136118829305329,
    848272237658610659,
    1060340297073263324,
    1131029650211480879,
    1148701988496035267,
    1152236456152946145,
    1152825534095764625,
    1152909688087595836,
]


def _poisson_weight(h: Column) -> Column:
    """Poisson(1) weight of a 60-bit hash column (0..8, integer)."""
    w = F.lit(0)
    for t in POISSON1_T60:
        w = w + (h >= F.lit(t)).cast("int")
    return w.cast("long")


def _poisson_weight_sql(h_expr: str) -> str:
    terms = " + ".join(
        f"CASE WHEN ({h_expr}) >= {t} THEN 1 ELSE 0 END"
        for t in POISSON1_T60
    )
    return f"CAST({terms} AS BIGINT)"


def _ci_ranks(n_replicates: int, alpha_permille: int) -> tuple[int, int]:
    """Symmetric order-statistic ranks: lo = ⌈R·α/2⌉-th smallest
    replicate mean (at least 1), hi = the mirrored rank from the top.

    Callers pass the SURVIVING replicate count (replicates that drew
    all-zero Poisson weights carry no mean and are excluded), so the
    ranks always exist whenever >= 1 replicate survives — fixed ranks
    against the nominal R used to make tiny groups vanish through the
    rank joins (round-7 advice). Spark/DuckDB twins compute the same
    ranks as ``GREATEST(1, (n_surv·α + 1999) div 2000)``, identical to
    this ceil for non-negative operands."""
    lo = max(1, -(-n_replicates * alpha_permille // 2000))
    return lo, n_replicates + 1 - lo


def _milli_trunc(s: int, n: int) -> int:
    """1000·s / n truncated TOWARD ZERO — the exact convention of
    Spark's ``div`` and DuckDB's ``//`` (both verified truncating), so
    the driver-side fold stays bit-identical to the engines for
    negative-valued metrics too (Python's ``//`` floors)."""
    q = (1000 * abs(s)) // n
    return q if s >= 0 else -q


# the SQL/Catalyst spelling of _ci_ranks' lo rank for a window-counted
# surviving-replicate column (ceil via add-1999 intdiv; operands >= 0).
# ``op``: Spark spells integer division `div`, DuckDB `//`.
def _lo_rank_sql(
    n_surv_expr: str, alpha_permille: int, op: str = "//"
) -> str:
    return (
        f"GREATEST(1, ({n_surv_expr} * {alpha_permille} + 1999)"
        f" {op} 2000)"
    )


def bootstrap_replicate_sums(
    rows: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int,
    seed: int = 0,
) -> DataFrame:
    """Per-replicate weighted partial sums: DataFrame[rep, s, n]
    (R rows). Linear in the input — the streaming BootstrapState folds
    exactly these rows additively, bit-identical to one batch pass."""
    base = rows.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    )
    rep = base.select(
        "_id",
        "_v",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_replicates - 1))
        ).alias("rep"),
    )
    h = hash60(
        F.concat_ws(
            "-",
            F.lit("boot"),
            F.lit(str(seed)),
            F.col("_id").cast("string"),
            F.col("rep").cast("string"),
        )
    )
    w = _poisson_weight(h)
    return (
        rep.select("rep", (w * F.col("_v")).alias("wv"), w.alias("w"))
        .groupBy("rep")
        .agg(F.sum("wv").alias("s"), F.sum("w").alias("n"))
    )


def bootstrap_ci_from_sums(
    sums: list[tuple[int, int, int]],
    n_rows: int,
    sum_v: int,
    n_replicates: int,
    alpha_permille: int = 50,
) -> tuple[int, int | None, int | None]:
    """Driver-side (point_milli, lo_milli, hi_milli) from folded
    (rep, s, n) triples — the exact integer convention of
    :func:`poisson_bootstrap_ci`, shared with the streaming state.

    Degenerate prefixes are explicit (round-7 advice), matching the
    batch twins: n_rows == 0 raises (batch emits no row either — there
    is no estimate to disagree about); replicates that drew zero total
    weight are dropped and the order-statistic ranks come from the
    SURVIVING count; if every replicate drew zero (possible only for
    tiny prefixes) the point estimate returns with null CIs, exactly
    the left-join behavior of the batch operators."""
    if n_rows <= 0:
        raise ValueError(
            "bootstrap_ci_from_sums: empty prefix (n_rows == 0) — no "
            "estimate exists; the batch twin emits no row for the "
            "same input"
        )
    means = sorted(
        (_milli_trunc(s, n), rep) for rep, s, n in sums if n > 0
    )
    point = _milli_trunc(sum_v, n_rows)
    if not means:
        return point, None, None
    lo_rk, hi_rk = _ci_ranks(len(means), alpha_permille)
    return point, means[lo_rk - 1][0], means[hi_rk - 1][0]


def poisson_bootstrap_ci(
    rows: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> DataFrame:
    """One-pass bootstrap CI for the mean of ``value_col`` (exact milli
    integers): DataFrame[n_rows, point_milli, lo_milli, hi_milli,
    n_replicates].

    Plan shape: row → Generate(R replicate indices) → Poisson weight in
    pure codegen → partial hash aggregate per replicate (map-side
    combine does the heavy lifting; the exchange carries R rows per
    task) → R-row replicate table → rank window over exactly R rows
    (parameter-bounded, never data-bounded) → two single-row lookups
    cross-joined onto the point estimate. 1000·Σ(w·v) must fit BIGINT:
    holds while Σv < 9·10^14 per replicate scope.
    """
    base = rows.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    )
    means = (
        bootstrap_replicate_sums(
            rows, value_col, id_col, n_replicates, seed
        )
        .where(F.col("n") > 0)
        .select(
            "rep",
            F.expr("CAST(1000 * s AS BIGINT) div n").alias("mean_milli"),
        )
    )
    # ranks against the SURVIVING replicate count (window over <= R
    # rows, parameter-bounded): fixed nominal-R ranks made the whole
    # result vanish when > R - hi_rk replicates drew zero weight
    rk = Window.orderBy("mean_milli", "rep")
    ranked = means.select(
        "mean_milli",
        F.row_number().over(rk).alias("rk"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_surv"),
    )
    lo_rk_expr = F.expr(_lo_rank_sql("n_surv", alpha_permille, "div"))
    point = base.agg(
        F.count("*").alias("n_rows"),
        F.expr("CAST(1000 * sum(_v) AS BIGINT) div count(*)").alias(
            "point_milli"
        ),
    ).where(F.col("n_rows") > 0)  # empty input -> empty frame, always
    lo = ranked.where(F.col("rk") == lo_rk_expr).select(
        F.col("mean_milli").alias("lo_milli")
    )
    hi = ranked.where(
        F.col("rk") == F.col("n_surv") + 1 - lo_rk_expr
    ).select(F.col("mean_milli").alias("hi_milli"))
    # left joins: zero surviving replicates still reports the point
    # estimate, with null CIs (the by-group twin and the driver fold
    # share this contract)
    return (
        point.join(F.broadcast(lo), F.lit(True), "left")
        .join(F.broadcast(hi), F.lit(True), "left")
        .select(
            "n_rows",
            "point_milli",
            "lo_milli",
            "hi_milli",
            F.lit(n_replicates).cast("long").alias("n_replicates"),
        )
    )


def poisson_bootstrap_ci_sql(
    rows_sql: str,
    value_expr: str,
    id_expr: str,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_ci` — identical hashes,
    thresholds, truncating divisions, and surviving-count ranks."""
    h = hash60_sql(
        f"concat('boot', '-', '{seed}', '-', CAST(_id AS VARCHAR),"
        f" '-', CAST(rep AS VARCHAR))"
    )
    w = _poisson_weight_sql(h)
    return f"""
WITH base AS (
  SELECT CAST({id_expr} AS BIGINT) AS _id,
         CAST({value_expr} AS BIGINT) AS _v
  FROM ({rows_sql})
),
reps AS (
  SELECT _id, _v, r.rep
  FROM base CROSS JOIN (
    SELECT unnest(range({n_replicates})) AS rep
  ) r
),
weighted AS (
  SELECT rep, {w} AS w, _v FROM reps
),
means AS (
  SELECT rep,
         CAST(CAST(1000 * SUM(w * _v) AS BIGINT) // SUM(w) AS BIGINT)
           AS mean_milli
  FROM weighted GROUP BY rep HAVING SUM(w) > 0
),
ranked AS (
  SELECT mean_milli,
         ROW_NUMBER() OVER (ORDER BY mean_milli, rep) AS rk,
         COUNT(*) OVER () AS n_surv
  FROM means
),
point AS (
  SELECT COUNT(*) AS n_rows,
         CAST(1000 * SUM(_v) AS BIGINT) // COUNT(*) AS point_milli
  FROM base HAVING COUNT(*) > 0
)
SELECT p.n_rows, p.point_milli, lo.mean_milli AS lo_milli,
       hi.mean_milli AS hi_milli,
       CAST({n_replicates} AS BIGINT) AS n_replicates
FROM point p
LEFT JOIN (SELECT mean_milli FROM ranked
           WHERE rk = {_lo_rank_sql('n_surv', alpha_permille)}) lo ON TRUE
LEFT JOIN (SELECT mean_milli FROM ranked
           WHERE rk = n_surv + 1 - {_lo_rank_sql('n_surv', alpha_permille)}
          ) hi ON TRUE
"""


# ---------------------------------------------------------------------------
# AMS F2 second-moment sketch
# ---------------------------------------------------------------------------


def f2_counters(
    items: DataFrame,
    item_col: str = "item",
    n_counters: int = 64,
    seed: int = 0,
) -> DataFrame:
    """The S sign-counters over the input: DataFrame[s, c] (S rows).

    Linear in the input — counters over a union of batches equal the
    elementwise sum of per-batch counters, which is what makes the
    sketch mergeable (streaming twin F2State folds exactly these rows).
    """
    counts = items.groupBy(
        F.col(item_col).cast("string").alias("_item")
    ).agg(F.count("*").alias("f"))
    return _counters_from_counts(counts, n_counters, seed)


def _counters_from_counts(
    counts: DataFrame, n_counters: int, seed: int
) -> DataFrame:
    fanned = counts.select(
        "_item",
        "f",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_counters - 1))
        ).alias("s"),
    )
    sign = (
        F.lit(1)
        - F.lit(2)
        * (
            hash60(
                F.concat_ws(
                    "-",
                    F.lit("f2"),
                    F.lit(str(seed)),
                    F.col("s").cast("string"),
                    F.col("_item"),
                )
            )
            % 2
        )
    ).cast("long")
    signed = fanned.select("s", (sign * F.col("f")).alias("sf"))
    return signed.groupBy("s").agg(F.sum("sf").alias("c"))


def f2_estimate_from_counters(
    counters: list[tuple[int, int]], n_groups: int = 8
) -> int:
    """Driver-side estimate from S (s, c) pairs — the exact integer
    convention of :func:`f2_sketch` (lower median of G group means of
    c², floor divisions), shared with the streaming F2State."""
    if len(counters) % n_groups:
        raise ValueError("n_counters must be divisible by n_groups")
    per_group = len(counters) // n_groups
    gsum: dict[int, int] = {}
    for s, c in counters:
        gsum[s % n_groups] = gsum.get(s % n_groups, 0) + c * c
    gmeans = sorted(
        (v // per_group, g) for g, v in gsum.items()
    )
    return gmeans[(n_groups + 1) // 2 - 1][0]


def f2_sketch(
    items: DataFrame,
    item_col: str = "item",
    n_counters: int = 64,
    n_groups: int = 8,
    seed: int = 0,
) -> DataFrame:
    """AMS estimate of F2 = Σ f_i² next to the exact value:
    DataFrame[n_items, n_counters, estimate, exact_f2].

    Batch evaluation: exact per-item counts first (ONE shuffle on the
    item key — the aggregation any F2 query pays anyway), then each
    distinct item fans out to the S counters (vocabulary-sized Generate,
    never data-sized), counters reduce to S rows, squares group into G
    means, and the estimate is the lower median of the G group means —
    all BIGINT floor arithmetic. By linearity of the counters this is
    bit-identical to folding raw arrivals one at a time, which is what
    the mergeable streaming twin (F2State) does and asserts.
    """
    if n_counters % n_groups:
        raise ValueError("n_counters must be divisible by n_groups")
    per_group = n_counters // n_groups
    med_rk = (n_groups + 1) // 2
    counts = items.groupBy(
        F.col(item_col).cast("string").alias("_item")
    ).agg(F.count("*").alias("f"))
    counters = _counters_from_counts(counts, n_counters, seed)
    groups = (
        counters.select(
            (F.col("s") % n_groups).alias("g"),
            (F.col("c") * F.col("c")).alias("c2"),
        )
        .groupBy("g")
        .agg(
            F.expr(f"CAST(sum(c2) AS BIGINT) div {per_group}").alias(
                "gmean"
            )
        )
    )
    rk = Window.orderBy("gmean", "g")
    med = (
        groups.select("gmean", F.row_number().over(rk).alias("rk"))
        .where(F.col("rk") == med_rk)
        .select(F.col("gmean").alias("estimate"))
    )
    exact = counts.agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("f") * F.col("f")).alias("exact_f2"),
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "n_items",
        F.lit(n_counters).cast("long").alias("n_counters"),
        "estimate",
        "exact_f2",
    )


def f2_sketch_sql(
    items_sql: str,
    item_expr: str = "item",
    n_counters: int = 64,
    n_groups: int = 8,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`f2_sketch` — identical signs and ranks."""
    if n_counters % n_groups:
        raise ValueError("n_counters must be divisible by n_groups")
    per_group = n_counters // n_groups
    med_rk = (n_groups + 1) // 2
    h = hash60_sql(
        f"concat('f2', '-', '{seed}', '-', CAST(s AS VARCHAR), '-', _item)"
    )
    sign = f"CAST(1 - 2 * (({h}) % 2) AS BIGINT)"
    return f"""
WITH counts AS (
  SELECT CAST({item_expr} AS VARCHAR) AS _item, COUNT(*) AS f
  FROM ({items_sql}) GROUP BY 1
),
fanned AS (
  SELECT _item, f, r.s
  FROM counts CROSS JOIN (
    SELECT unnest(range({n_counters})) AS s
  ) r
),
counters AS (
  SELECT s, SUM({sign} * f) AS c FROM fanned GROUP BY s
),
groups AS (
  SELECT s % {n_groups} AS g,
         CAST(SUM(c * c) AS BIGINT) // {per_group} AS gmean
  FROM counters GROUP BY 1
),
med AS (
  SELECT gmean AS estimate
  FROM (
    SELECT gmean, ROW_NUMBER() OVER (ORDER BY gmean, g) AS rk
    FROM groups
  ) WHERE rk = {med_rk}
)
SELECT (SELECT COUNT(*) FROM counts) AS n_items,
       CAST({n_counters} AS BIGINT) AS n_counters,
       med.estimate,
       CAST((SELECT SUM(f * f) FROM counts) AS BIGINT) AS exact_f2
FROM med
"""


def f2_join_size(
    a_items: DataFrame,
    b_items: DataFrame,
    item_col: str = "item",
    n_counters: int = 64,
    n_groups: int = 8,
    seed: int = 0,
) -> DataFrame:
    """AMS join-size estimate |A ⋈ B| = Σ_k fA(k)·fB(k) next to the
    exact value: DataFrame[n_counters, estimate, exact_join_size].

    The classic second use of the AMS sketch (Alon, Gibbons, Matias,
    Szegedy, PODS'99): with the SAME sign family on both sides,
    E[cA_s · cB_s] = Σ fA·fB — so two independently-built S-integer
    sketches estimate a join's output cardinality without running the
    join, which is what a cost-based optimizer wants from a sketch
    catalog. Median-of-means over G groups, exact BIGINT floor
    arithmetic; the estimate can be negative for near-disjoint sides
    (an unbiased signed estimator; reported as-is, never clamped).

    Scale shape: each side pays its own per-item count (the
    aggregation a stats collector already runs), the sign fan-out
    touches vocabularies only, and the final product joins two S-row
    tables. The exact twin — computed alongside for the oracle — is
    the real count-join; a production catalog stores only the sketches.
    """
    if n_counters % n_groups:
        raise ValueError("n_counters must be divisible by n_groups")
    per_group = n_counters // n_groups
    med_rk = (n_groups + 1) // 2
    ca = f2_counters(a_items, item_col, n_counters, seed).withColumnRenamed(
        "c", "ca"
    )
    cb = f2_counters(b_items, item_col, n_counters, seed).withColumnRenamed(
        "c", "cb"
    )
    prod = ca.join(cb, "s")
    groups = (
        prod.select(
            (F.col("s") % n_groups).alias("g"),
            (F.col("ca") * F.col("cb")).alias("p"),
        )
        .groupBy("g")
        .agg(
            F.expr(f"CAST(sum(p) AS BIGINT) div {per_group}").alias("gmean")
        )
    )
    rk = Window.orderBy("gmean", "g")
    med = (
        groups.select("gmean", F.row_number().over(rk).alias("rk"))
        .where(F.col("rk") == med_rk)
        .select(F.col("gmean").alias("estimate"))
    )
    fa = a_items.groupBy(
        F.col(item_col).cast("string").alias("_item")
    ).agg(F.count("*").alias("fa"))
    fb = b_items.groupBy(
        F.col(item_col).cast("string").alias("_item")
    ).agg(F.count("*").alias("fb"))
    exact = (
        fa.join(fb, "_item")
        .agg(
            F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
            .cast("long")
            .alias("exact_join_size")
        )
    )
    return exact.crossJoin(F.broadcast(med)).select(
        F.lit(n_counters).cast("long").alias("n_counters"),
        "estimate",
        "exact_join_size",
    )


def f2_join_size_sql(
    a_sql: str,
    b_sql: str,
    item_expr: str = "item",
    n_counters: int = 64,
    n_groups: int = 8,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`f2_join_size`."""
    if n_counters % n_groups:
        raise ValueError("n_counters must be divisible by n_groups")
    per_group = n_counters // n_groups
    med_rk = (n_groups + 1) // 2
    h = hash60_sql(
        f"concat('f2', '-', '{seed}', '-', CAST(s AS VARCHAR), '-', _item)"
    )
    sign = f"CAST(1 - 2 * (({h}) % 2) AS BIGINT)"
    return f"""
WITH ca0 AS (
  SELECT CAST({item_expr} AS VARCHAR) AS _item, COUNT(*) AS f
  FROM ({a_sql}) GROUP BY 1
),
cb0 AS (
  SELECT CAST({item_expr} AS VARCHAR) AS _item, COUNT(*) AS f
  FROM ({b_sql}) GROUP BY 1
),
reps AS (SELECT unnest(range({n_counters})) AS s),
ca AS (
  SELECT s, SUM({sign} * f) AS ca
  FROM ca0 CROSS JOIN reps GROUP BY s
),
cb AS (
  SELECT s, SUM({sign} * f) AS cb
  FROM cb0 CROSS JOIN reps GROUP BY s
),
groups AS (
  SELECT ca.s % {n_groups} AS g,
         CAST(SUM(ca.ca * cb.cb) AS BIGINT) // {per_group} AS gmean
  FROM ca JOIN cb ON ca.s = cb.s GROUP BY 1
),
med AS (
  SELECT gmean AS estimate FROM (
    SELECT gmean, ROW_NUMBER() OVER (ORDER BY gmean, g) AS rk
    FROM groups
  ) WHERE rk = {med_rk}
),
exact AS (
  SELECT CAST(COALESCE(SUM(a.f * b.f), 0) AS BIGINT)
           AS exact_join_size
  FROM ca0 a JOIN cb0 b ON a._item = b._item
)
SELECT CAST({n_counters} AS BIGINT) AS n_counters,
       med.estimate, exact.exact_join_size
FROM med CROSS JOIN exact
"""


def poisson_bootstrap_ci_by(
    rows: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> DataFrame:
    """Per-group Poisson-bootstrap CI — one row per group:
    DataFrame[group, n_rows, point_milli, lo_milli, hi_milli].

    Same plan as :func:`poisson_bootstrap_ci` with the group key
    carried through: the exchange holds groups×R rows, the rank
    window is PARTITIONED by group over R rows each (WindowGroupLimit
    territory, never a single global partition), and a group where a
    replicate drew all-zero weights (possible only for tiny groups)
    drops that replicate for that group alone — the CI ranks come
    from the group's SURVIVING replicate count and the rank lookups
    LEFT-join, so such a group still surfaces (null CIs in the
    all-replicates-dropped extreme) instead of vanishing (round-7
    advice). Both engines apply the same rule. The dashboard shape:
    every per-slice metric ships with its uncertainty in the same
    pass.
    """
    base = rows.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    )
    rep = base.select(
        "grp",
        "_id",
        "_v",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_replicates - 1))
        ).alias("rep"),
    )
    h = hash60(
        F.concat_ws(
            "-",
            F.lit("boot"),
            F.lit(str(seed)),
            F.col("_id").cast("string"),
            F.col("rep").cast("string"),
        )
    )
    w = _poisson_weight(h)
    means = (
        rep.select(
            "grp", "rep", (w * F.col("_v")).alias("wv"), w.alias("w")
        )
        .groupBy("grp", "rep")
        .agg(F.sum("wv").alias("s"), F.sum("w").alias("n"))
        .where(F.col("n") > 0)
        .select(
            "grp",
            "rep",
            F.expr("CAST(1000 * s AS BIGINT) div n").alias("mean_milli"),
        )
    )
    rk = Window.partitionBy("grp").orderBy("mean_milli", "rep")
    ranked = means.select(
        "grp",
        "mean_milli",
        F.row_number().over(rk).alias("rk"),
        F.count("*").over(Window.partitionBy("grp")).alias("n_surv"),
    )
    lo_rk_expr = F.expr(_lo_rank_sql("n_surv", alpha_permille, "div"))
    point = base.groupBy("grp").agg(
        F.count("*").alias("n_rows"),
        F.expr("CAST(1000 * sum(_v) AS BIGINT) div count(*)").alias(
            "point_milli"
        ),
    )
    lo = ranked.where(F.col("rk") == lo_rk_expr).select(
        "grp", F.col("mean_milli").alias("lo_milli")
    )
    hi = ranked.where(
        F.col("rk") == F.col("n_surv") + 1 - lo_rk_expr
    ).select("grp", F.col("mean_milli").alias("hi_milli"))
    return (
        point.join(lo, "grp", "left")
        .join(hi, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "point_milli",
            "lo_milli",
            "hi_milli",
        )
    )


def poisson_bootstrap_ci_by_sql(
    rows_sql: str,
    value_expr: str,
    id_expr: str,
    group_expr: str,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_ci_by`."""
    h = hash60_sql(
        f"concat('boot', '-', '{seed}', '-', CAST(_id AS VARCHAR),"
        f" '-', CAST(rep AS VARCHAR))"
    )
    w = _poisson_weight_sql(h)
    return f"""
WITH base AS (
  SELECT {group_expr} AS grp, CAST({id_expr} AS BIGINT) AS _id,
         CAST({value_expr} AS BIGINT) AS _v
  FROM ({rows_sql})
),
reps AS (
  SELECT grp, _id, _v, r.rep
  FROM base CROSS JOIN (
    SELECT unnest(range({n_replicates})) AS rep
  ) r
),
means AS (
  SELECT grp, rep,
         CAST(CAST(1000 * SUM({w} * _v) AS BIGINT) // SUM({w}) AS BIGINT)
           AS mean_milli
  FROM reps GROUP BY grp, rep HAVING SUM({w}) > 0
),
ranked AS (
  SELECT grp, mean_milli,
         ROW_NUMBER() OVER (
           PARTITION BY grp ORDER BY mean_milli, rep
         ) AS rk,
         COUNT(*) OVER (PARTITION BY grp) AS n_surv
  FROM means
),
point AS (
  SELECT grp, COUNT(*) AS n_rows,
         CAST(1000 * SUM(_v) AS BIGINT) // COUNT(*) AS point_milli
  FROM base GROUP BY grp
)
SELECT p.grp AS {group_expr}, p.n_rows, p.point_milli,
       lo.mean_milli AS lo_milli, hi.mean_milli AS hi_milli
FROM point p
LEFT JOIN (SELECT grp, mean_milli FROM ranked
           WHERE rk = {_lo_rank_sql('n_surv', alpha_permille)}) lo
  ON lo.grp = p.grp
LEFT JOIN (SELECT grp, mean_milli FROM ranked
           WHERE rk = n_surv + 1 - {_lo_rank_sql('n_surv', alpha_permille)}
          ) hi
  ON hi.grp = p.grp
"""


def aqp_group_count_ci(
    rows: DataFrame,
    group_col: str,
    id_col: str,
    p_milli: int = 100,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> DataFrame:
    """Approximate query processing (the BlinkDB shape): per-group
    counts estimated from a deterministic p‰ sample WITH bootstrap
    error bars, next to the exact count — DataFrame[group,
    exact_count, est_count, lo_count, hi_count].

    The sample membership is a pure md5 predicate (hash(id) mod 1000
    < p‰), so the "sample" is really a reproducible semijoin any
    engine can re-derive; the estimator is Horvitz-Thompson
    (count·1000 div p‰, exact integer), and its uncertainty comes
    from the Poisson bootstrap over the SAMPLE — all R replicate
    counts in one Generate + partial-agg pass over p‰ of the data.
    The exact side is computed alongside here because the oracle
    checks it; a production dashboard would run only the sample side
    at 1/p the scan cost and the CI tells it when that's safe.
    Groups with no sampled row report est 0 with an empty CI row
    dropped — absence IS the estimate; both engines agree.
    """
    lo_rk, hi_rk = _ci_ranks(n_replicates, alpha_permille)
    scale = 1000
    base = rows.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).cast("long").alias("_id"),
    )
    exact = base.groupBy("grp").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    insample = base.where(
        hash60(
            F.concat_ws(
                "-", F.lit("aqp"), F.lit(str(seed)),
                F.col("_id").cast("string"),
            )
        )
        % scale
        < p_milli
    )
    est = insample.groupBy("grp").agg(
        F.expr(f"CAST(count(*) * {scale} AS BIGINT) div {p_milli}")
        .alias("est_count")
    )
    rep = insample.select(
        "grp",
        "_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_replicates - 1))
        ).alias("rep"),
    )
    w = _poisson_weight(
        hash60(
            F.concat_ws(
                "-", F.lit("boot"), F.lit(str(seed)),
                F.col("_id").cast("string"),
                F.col("rep").cast("string"),
            )
        )
    )
    reps = (
        rep.select("grp", "rep", w.alias("w"))
        .groupBy("grp", "rep")
        .agg(
            F.expr(
                f"CAST(sum(w) * {scale} AS BIGINT) div {p_milli}"
            ).alias("est_r")
        )
    )
    rk = Window.partitionBy("grp").orderBy("est_r", "rep")
    ranked = reps.select(
        "grp", "est_r", F.row_number().over(rk).alias("rk")
    )
    lo = ranked.where(F.col("rk") == lo_rk).select(
        "grp", F.col("est_r").alias("lo_count")
    )
    hi = ranked.where(F.col("rk") == hi_rk).select(
        "grp", F.col("est_r").alias("hi_count")
    )
    return (
        exact.join(est, "grp", "left")
        .join(lo, "grp", "left")
        .join(hi, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "exact_count",
            F.coalesce(F.col("est_count"), F.lit(0))
            .cast("long")
            .alias("est_count"),
            "lo_count",
            "hi_count",
        )
    )


def aqp_group_count_ci_sql(
    rows_sql: str,
    group_expr: str,
    id_expr: str,
    p_milli: int = 100,
    n_replicates: int = 200,
    alpha_permille: int = 50,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`aqp_group_count_ci`."""
    lo_rk, hi_rk = _ci_ranks(n_replicates, alpha_permille)
    hs = hash60_sql(
        f"concat('aqp', '-', '{seed}', '-', CAST(_id AS VARCHAR))"
    )
    hb = hash60_sql(
        f"concat('boot', '-', '{seed}', '-', CAST(_id AS VARCHAR),"
        f" '-', CAST(rep AS VARCHAR))"
    )
    w = _poisson_weight_sql(hb)
    return f"""
WITH base AS (
  SELECT {group_expr} AS grp, CAST({id_expr} AS BIGINT) AS _id
  FROM ({rows_sql})
),
exact AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM base GROUP BY grp
),
insample AS (
  SELECT * FROM base WHERE ({hs}) % 1000 < {p_milli}
),
est AS (
  SELECT grp,
         CAST(COUNT(*) * 1000 AS BIGINT) // {p_milli} AS est_count
  FROM insample GROUP BY grp
),
reps AS (
  SELECT grp, r.rep,
         CAST(SUM({w}) * 1000 AS BIGINT) // {p_milli} AS est_r
  FROM insample CROSS JOIN (
    SELECT unnest(range({n_replicates})) AS rep
  ) r
  GROUP BY grp, r.rep
),
ranked AS (
  SELECT grp, est_r,
         ROW_NUMBER() OVER (
           PARTITION BY grp ORDER BY est_r, rep
         ) AS rk
  FROM reps
)
SELECT e.grp AS {group_expr}, e.exact_count,
       CAST(COALESCE(s.est_count, 0) AS BIGINT) AS est_count,
       lo.est_r AS lo_count, hi.est_r AS hi_count
FROM exact e
LEFT JOIN est s ON s.grp = e.grp
LEFT JOIN (SELECT grp, est_r FROM ranked WHERE rk = {lo_rk}) lo
  ON lo.grp = e.grp
LEFT JOIN (SELECT grp, est_r FROM ranked WHERE rk = {hi_rk}) hi
  ON hi.grp = e.grp
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift
# ---------------------------------------------------------------------------


def ks_drift(
    rows: DataFrame,
    value_col: str,
    split_col: str,
    base_value: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Exact (unbinned) two-sample Kolmogorov-Smirnov statistic between
    the ``split_col == base_value`` slice and everything else — one
    row: DataFrame[n_base, n_comp, ks_milli, at_value].

    The drift test :func:`curation.corpus_drift_report`'s binned TVD
    cannot replace: KS is sup_x |F_base(x) − F_comp(x)| over the REAL
    empirical CDFs, so a shift smaller than a bin width still
    registers. Kept integer-exact the way the engine keeps every
    statistic: with cum counts a(x), b(x) and totals A, B, the gap at
    x is |a(x)·B − b(x)·A| (BIGINT products; requires A·B < 2^63 —
    shard beyond ~3·10^9 rows per slice), and
    ``ks_milli = (1000 · max gap) DIV (A·B)``. ``at_value`` is the
    smallest value attaining the max — a total order, deterministic.

    Scale shape: one map-side-combinable aggregate to the DISTINCT
    value table, then TWO two-pass distributed prefix sums over that
    table (relational.global_prefix_sum — range partition + driver
    offsets, never a single-partition window), then a 1-row max. The
    prefix passes touch |distinct values| rows, not data.
    """
    from .relational import global_prefix_sum

    is_base = (F.col(split_col) == base_value).cast("long")
    per_value = (
        rows.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(is_base).alias("na"),
            F.sum(F.lit(1) - is_base).alias("nb"),
        )
    )
    pa = global_prefix_sum(
        per_value, "na", "v", out_col="pa", n_partitions=n_partitions
    )
    pb = global_prefix_sum(
        pa, "nb", "v", out_col="pb", n_partitions=n_partitions
    ).select(
        "v",
        "na",
        "nb",
        (F.col("pa") + F.col("na")).alias("ca"),
        (F.col("pb") + F.col("nb")).alias("cb"),
    )
    totals = pb.agg(
        F.sum("na").cast("long").alias("n_base"),
        F.sum("nb").cast("long").alias("n_comp"),
    )
    gaps = pb.crossJoin(F.broadcast(totals)).select(
        "v",
        "n_base",
        "n_comp",
        F.abs(
            F.col("ca") * F.col("n_comp") - F.col("cb") * F.col("n_base")
        ).alias("gap"),
    )
    best = gaps.groupBy("n_base", "n_comp").agg(F.max("gap").alias("g"))
    return (
        gaps.join(F.broadcast(best), ["n_base", "n_comp"])
        .where(F.col("gap") == F.col("g"))
        .groupBy("n_base", "n_comp")
        .agg(
            F.expr("CAST(1000 * max(gap) AS BIGINT) div (n_base * n_comp)")
            .alias("ks_milli"),
            F.min("v").alias("at_value"),
        )
        .select("n_base", "n_comp", "ks_milli", "at_value")
    )


def ks_drift_sql(
    rows_sql: str, value_expr: str, split_expr: str, base_value: str
) -> str:
    """DuckDB twin of :func:`ks_drift` (window cum sums stand in for
    the distributed prefix passes; identical integers)."""
    return f"""
WITH pv AS (
  SELECT {value_expr} AS v,
         SUM(CASE WHEN {split_expr} = {sql_str(base_value)} THEN 1 ELSE 0 END)
           AS na,
         SUM(CASE WHEN {split_expr} = {sql_str(base_value)} THEN 0 ELSE 1 END)
           AS nb
  FROM ({rows_sql}) WHERE {value_expr} IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(na) OVER (ORDER BY v) AS ca,
         SUM(nb) OVER (ORDER BY v) AS cb
  FROM pv
),
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS n_base,
         CAST(SUM(nb) AS BIGINT) AS n_comp
  FROM pv
),
gaps AS (
  SELECT v, CAST(ABS(ca * t.n_comp - cb * t.n_base) AS BIGINT) AS gap,
         t.n_base, t.n_comp
  FROM cum CROSS JOIN tot t
)
SELECT n_base, n_comp,
       CAST(1000 * MAX(gap) AS BIGINT) // (n_base * n_comp) AS ks_milli,
       CAST(MIN(CASE WHEN gap = (SELECT MAX(gap) FROM gaps) THEN v END)
            AS DOUBLE) AS at_value
FROM gaps GROUP BY n_base, n_comp
"""


def auc_report(
    rows: DataFrame,
    score_col: str,
    label_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Exact ROC AUC of ``score_col`` as a ranker for the boolean
    ``label_col`` — one row: DataFrame[n_pos, n_neg, auc_micro].

    The Mann-Whitney identity (AUC = P[score_pos > score_neg] +
    ½·P[tie], midrank convention): with per-distinct-score positive/
    negative counts (p_s, q_s) and the exclusive prefix sum
    cneg(s) = Σ_{s'<s} q_s', the doubled U statistic

        U_x2 = Σ_s p_s · (2·cneg(s) + q_s)

    is an integer, and ``auc_micro = (10^6 · U_x2) div (2·n_pos·n_neg)``
    is exact floor arithmetic — no rank floats, no interpolation. The
    final 10^6-scaled division runs in DECIMAL(38,0)/HUGEINT (the
    accumulated U_x2 itself stays BIGINT), so the bound is
    2·n_pos·n_neg < 2^63, i.e. n ≲ 4·10^9 per evaluation scope —
    shard by group via :func:`auc_by` beyond that (the per-score
    counts themselves stay mergeable).

    Scale shape (same as :func:`ks_drift`): one map-side-combinable
    aggregate down to the DISTINCT score table, one two-pass
    distributed prefix sum over that table (relational.
    global_prefix_sum — range partition + driver offsets, never a
    single-partition window), then a 1-row reduction. No per-pair
    work: the quadratic pair count collapses into the prefix sum.
    """
    from .relational import global_prefix_sum

    is_pos = F.col(label_col).cast("boolean").cast("long")
    per = (
        rows.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(is_pos).alias("pos"),
            F.sum(F.lit(1) - is_pos).alias("neg"),
        )
    )
    cum = global_prefix_sum(
        per, "neg", "s", out_col="cneg", n_partitions=n_partitions
    )
    return (
        cum.agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.sum(
                F.col("pos") * (2 * F.col("cneg") + F.col("neg"))
            )
            .cast("long")
            .alias("u_x2"),
        )
        .select(
            "n_pos",
            "n_neg",
            F.expr(
                "CAST((1000000 * CAST(u_x2 AS DECIMAL(38,0)))"
                " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " AS BIGINT)"
            ).alias("auc_micro"),
        )
    )


def auc_report_sql(
    rows_sql: str, score_expr: str, label_expr: str
) -> str:
    """DuckDB twin of :func:`auc_report` (window cum sum stands in for
    the distributed prefix pass; identical integers)."""
    return f"""
WITH per AS (
  SELECT {score_expr} AS s,
         SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS pos,
         SUM(CASE WHEN {label_expr} THEN 0 ELSE 1 END) AS neg
  FROM ({rows_sql})
  WHERE {score_expr} IS NOT NULL AND ({label_expr}) IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT s, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cneg
  FROM per
)
SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(neg) AS BIGINT) AS n_neg,
       CAST((1000000 * CAST(SUM(pos * (2 * cneg + neg)) AS HUGEINT))
            // (2 * CAST(SUM(pos) AS HUGEINT) * SUM(neg))
            AS BIGINT) AS auc_micro
FROM cum
"""


def auc_by(
    rows: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group exact ROC AUC: DataFrame[group, n_pos, n_neg,
    auc_micro], same midrank Mann-Whitney integers as
    :func:`auc_report` but sharded by ``group_col`` — the form that
    scales past the single-scope BIGINT bound, because each group's
    2·n_pos·n_neg product only has to fit 2^63/10^6 on its own.

    The prefix sum here is a window PARTITIONED by group over the
    per-(group, distinct score) table — parallel across groups, never
    the global single-partition window. Groups with no positives or
    no negatives return a null auc_micro (AUC undefined), kept in the
    output so the caller sees the degenerate slice instead of a
    silently shorter report.
    """
    is_pos = F.col(label_col).cast("boolean").cast("long")
    per = (
        rows.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("g"), F.col(score_col).alias("s"))
        .agg(
            F.sum(is_pos).alias("pos"),
            F.sum(F.lit(1) - is_pos).alias("neg"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per.select(
        "*", F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("cneg")
    )
    return (
        cum.groupBy(F.col("g").alias(group_col))
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.sum(F.col("pos") * (2 * F.col("cneg") + F.col("neg")))
            .cast("long")
            .alias("u_x2"),
        )
        .select(
            group_col,
            "n_pos",
            "n_neg",
            F.expr(
                "CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
                "(1000000 * CAST(u_x2 AS DECIMAL(38,0)))"
                " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " END AS BIGINT)"
            ).alias("auc_micro"),
        )
    )


def auc_by_sql(
    rows_sql: str,
    score_expr: str,
    label_expr: str,
    group_expr: str,
    out_group: str | None = None,
) -> str:
    """DuckDB twin of :func:`auc_by`."""
    out_group = out_group or group_expr
    return f"""
WITH per AS (
  SELECT {group_expr} AS g, {score_expr} AS s,
         SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS pos,
         SUM(CASE WHEN {label_expr} THEN 0 ELSE 1 END) AS neg
  FROM ({rows_sql})
  WHERE {score_expr} IS NOT NULL AND ({label_expr}) IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT g, pos, neg,
         COALESCE(SUM(neg) OVER (PARTITION BY g ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cneg
  FROM per
)
SELECT g AS {out_group}, CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(neg) AS BIGINT) AS n_neg,
       CAST(CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
         (1000000 * CAST(SUM(pos * (2 * cneg + neg)) AS HUGEINT))
           // (2 * CAST(SUM(pos) AS HUGEINT) * SUM(neg)) END
         AS BIGINT) AS auc_micro
FROM cum GROUP BY g
"""


HT_SEED = "ht-v1"
# pinned per-stratum sampling rates (num, den): the Horvitz-Thompson
# design — oversample the rare/heavy strata, undersample the bulk.
HT_RATES: dict[str, tuple[int, int]] = {
    "1-URGENT": (1, 2),
    "2-HIGH": (1, 4),
    "3-MEDIUM": (1, 8),
    "4-NOT SPECIFIED": (1, 8),
    "5-LOW": (1, 16),
}


def ht_total(
    rows: DataFrame,
    value_col: str,
    stratum_col: str,
    id_col: str,
    rates: dict[str, tuple[int, int]] | None = None,
    seed: str = HT_SEED,
) -> DataFrame:
    """Stratified Horvitz-Thompson total estimator with the EXACT
    answer alongside: DataFrame[stratum, n_rows, n_sampled,
    exact_cents, est_cents, err_milli] — the unequal-probability AQP
    design (survey-sampling classic; Hájek 1971 exposition) next to
    the engine's equal-rate a20 AQP counts.

    Row r in stratum s enters the sample iff
    ``hash60(seed·id) < (num_s·2^60) div den_s`` — the counter-based
    PRNG contract, so membership is a pure row function both engines
    replay. The HT estimate weighs each sampled value by 1/π_s:

        est_cents_s = (den_s · Σ_sampled value_cents) div num_s

    exact integer floor per stratum; unbiasedness is the textbook
    E[Σ 1{sampled}·v/π] = Σ v. ``err_milli`` reports the realized
    |est − exact| against exact, floored to milli.

    Scale: the estimator is ONE map-side-combinable aggregate whether
    or not the sample was materialized — at 100 TB you'd persist the
    sampled partition and run this agg on it; here both sides run from
    the same scan so the oracle checks estimator + design together.
    Strata missing from ``rates`` are excluded (documented contract —
    an unknown stratum has no π and would silently bias the total).
    """
    rates = rates or HT_RATES
    arms = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {(num << 60) // den}"
        for s, (num, den) in rates.items()
    )
    wnum = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {den}"
        for s, (num, den) in rates.items()
    )
    wden = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {num}"
        for s, (num, den) in rates.items()
    )
    known = list(rates)
    base = rows.select(
        F.col(stratum_col).alias("stratum"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        hash60(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ).alias("h"),
    ).where(F.col("stratum").isin(known))
    flagged = base.select(
        "stratum",
        "cents",
        (F.col("h") < F.expr(f"CASE {arms} END")).cast("long").alias(
            "in_sample"
        ),
    )
    return (
        flagged.groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("in_sample").cast("long").alias("n_sampled"),
            F.sum("cents").cast("long").alias("exact_cents"),
            F.sum(F.col("cents") * F.col("in_sample"))
            .cast("long")
            .alias("sampled_cents"),
        )
        .select(
            "stratum",
            "n_rows",
            "n_sampled",
            "exact_cents",
            F.expr(
                f"(CASE {wnum} END * sampled_cents) div CASE {wden} END"
            ).alias("est_cents"),
        )
        .select(
            "*",
            F.expr(
                "CASE WHEN exact_cents > 0 THEN "
                "(1000 * abs(est_cents - exact_cents)) div exact_cents "
                "END"
            ).alias("err_milli"),
        )
    )


def ht_total_sql(
    rows_sql: str,
    value_expr: str,
    stratum_expr: str,
    id_expr: str,
    rates: dict[str, tuple[int, int]] | None = None,
    seed: str = HT_SEED,
) -> str:
    """DuckDB twin of :func:`ht_total` — identical md5 thresholds,
    weights, and floors."""
    rates = rates or HT_RATES
    arms = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {(num << 60) // den}"
        for s, (num, den) in rates.items()
    )
    wnum = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {den}"
        for s, (num, den) in rates.items()
    )
    wden = " ".join(
        f"WHEN stratum = {sql_str(s)} THEN {num}"
        for s, (num, den) in rates.items()
    )
    known = ", ".join(sql_str(s) for s in rates)
    h = hash60_sql(f"'{seed}:' || CAST({id_expr} AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT {stratum_expr} AS stratum,
         CAST(ROUND({value_expr} * 100) AS BIGINT) AS cents,
         CASE WHEN {h} < CASE {arms} END THEN 1 ELSE 0 END AS in_sample
  FROM ({rows_sql})
  WHERE {stratum_expr} IN ({known})
),
agg AS (
  SELECT stratum,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(in_sample) AS BIGINT) AS n_sampled,
         CAST(SUM(cents) AS BIGINT) AS exact_cents,
         CAST(SUM(cents * in_sample) AS BIGINT) AS sampled_cents
  FROM base GROUP BY stratum
)
SELECT stratum, n_rows, n_sampled, exact_cents,
       CAST((CASE {wnum} END * sampled_cents) // CASE {wden} END
            AS BIGINT) AS est_cents,
       CAST(CASE WHEN exact_cents > 0 THEN
         (1000 * ABS((CASE {wnum} END * sampled_cents)
                     // CASE {wden} END - exact_cents)) // exact_cents
         END AS BIGINT) AS err_milli
FROM agg
"""


def gini_by(
    rows: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Exact per-group Gini coefficient of a non-negative integer
    weight column: DataFrame[group, n, total, gini_milli] — the
    concentration number a data-mixing dashboard tracks (0 = every
    member equal, →1000 = one member holds all the mass).

    The sorted-rank identity: with within-group values w_1 ≤ … ≤ w_n,

        gini_milli = (1000 · (2·Σ i·w_i − (n+1)·Σw)) div (n·Σw)

    — Gini is invariant to tie order, so the rank sum collapses onto
    the DISTINCT-value table: a run of c copies of value v starting
    after cumulative count R contributes v·(c·R + c(c+1)/2) to
    Σ i·w_i. The window therefore orders distinct values per group,
    never rows — a billion-row group with thousands of distinct
    weights costs a thousand-row window (the ks_drift shape), and the
    heavy step is one map-side-combinable (group, value) count.
    ``id_col`` is accepted for API symmetry with the rank family but
    no longer enters the math (ties never need breaking). Pure BIGINT;
    zero-total groups are dropped (Gini undefined). Bound:
    2·Σ i·w_i ≤ 2·n·Σw < 2^63/1000 — shard groups beyond
    n·Σw ≈ 4.6·10^15. Negative weights are filtered out and the group
    reports over its non-negative mass only (documented contract).
    """
    per = (
        rows.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .where(F.col("v") >= 0)
        .groupBy("g", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runs = per.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("rr"),
    )
    return (
        runs.groupBy(F.col("g").alias(group_col))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("v") * F.col("c")).cast("long").alias("total"),
            F.sum(
                F.col("v")
                * (
                    F.col("c") * F.col("rr")
                    + F.expr("c * (c + 1) div 2")
                )
            )
            .cast("long")
            .alias("iw"),
        )
        .where(F.col("total") > 0)
        .select(
            group_col,
            "n",
            "total",
            F.expr(
                "(1000 * (2 * iw - (n + 1) * total)) div (n * total)"
            ).alias("gini_milli"),
        )
    )


def gini_by_sql(
    rows_sql: str,
    value_expr: str,
    group_expr: str,
    id_expr: str,
    out_group: str | None = None,
) -> str:
    """DuckDB twin of :func:`gini_by`."""
    out_group = out_group or group_expr
    return f"""
WITH per AS (
  SELECT {group_expr} AS g, CAST({value_expr} AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ({rows_sql}) WHERE {value_expr} >= 0
  GROUP BY 1, 2
),
runs AS (
  SELECT g, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rr
  FROM per
)
SELECT g AS {out_group}, CAST(SUM(c) AS BIGINT) AS n,
       CAST(SUM(v * c) AS BIGINT) AS total,
       CAST((1000 * (2 * SUM(v * (c * rr + c * (c + 1) // 2))
                     - (SUM(c) + 1) * SUM(v * c)))
            // (SUM(c) * SUM(v * c)) AS BIGINT) AS gini_milli
FROM runs GROUP BY g
HAVING SUM(v * c) > 0
"""


def corr_matrix_signed_r2(
    rows: DataFrame, cols: list[str]
) -> DataFrame:
    """Exact pairwise Pearson association of integer columns, reported
    as SIGNED r² in milli: DataFrame[col_a, col_b, n, r2_milli] for
    every a < b pair.

    Pearson r needs a square root, which no integer convention can
    carry — so the engine reports ``sign(cov) · ⌊1000·cov²/(var_a·
    var_b)⌋`` instead: the exact quantity r·|r| in milli, monotone in
    r, sign-preserving, and computable in pure fixed-point arithmetic
    (take a float sqrt offline if a display wants r itself). With
    S_a = Σa, Q_ab = Σab: cov = n·Q_ab − S_a·S_b and var_a = n·Q_aa −
    S_a², both BIGINT-exact; the final quotient runs in DECIMAL(38,0)
    because cov² reaches ~10^34 at corpus scale (Spark DECIMAL /
    DuckDB HUGEINT — same truncating integer division). Bound:
    1000·cov² < 10^38, i.e. n·|x|_max² ≲ 6·10^17 per scope.

    Scale: ONE map-side-combinable aggregate over the data (the
    k(k+1)/2 + k moment sums), then pure 1-row arithmetic — the same
    sufficient-statistics shape as the ridge Gram pass, and the same
    reason it holds at 100 TB. Zero-variance columns yield NULL (not a
    crash): association with a constant is undefined.
    """
    aggs = [F.count("*").cast("long").alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a).cast("long")).alias(f"s_{a}"))
        for b in cols[i:]:
            aggs.append(
                F.sum(F.col(a).cast("long") * F.col(b).cast("long"))
                .alias(f"q_{a}_{b}")
            )
    m = rows.agg(*aggs)
    pair_rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = f"(CAST(n AS DECIMAL(38,0)) * q_{a}_{b} - CAST(s_{a} AS DECIMAL(38,0)) * s_{b})"
            va = f"(CAST(n AS DECIMAL(38,0)) * q_{a}_{a} - CAST(s_{a} AS DECIMAL(38,0)) * s_{a})"
            vb = f"(CAST(n AS DECIMAL(38,0)) * q_{b}_{b} - CAST(s_{b} AS DECIMAL(38,0)) * s_{b})"
            pair_rows.append(
                m.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n"),
                    F.expr(
                        f"CAST(CASE WHEN {va} > 0 AND {vb} > 0 THEN "
                        f"CASE WHEN {cov} >= 0 THEN 1 ELSE -1 END * "
                        f"CAST((1000 * {cov} * {cov}) div ({va} * {vb})"
                        f" AS DECIMAL(38,0)) END AS BIGINT)"
                    ).alias("r2_milli"),
                )
            )
    out = pair_rows[0]
    for p in pair_rows[1:]:
        out = out.unionByName(p)
    return out


def corr_matrix_signed_r2_sql(rows_sql: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`corr_matrix_signed_r2` (HUGEINT carries
    the wide products; same truncating division and sign rule)."""
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i, a in enumerate(cols):
        sums.append(f"CAST(SUM({a}) AS BIGINT) AS s_{a}")
        for b in cols[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} AS BIGINT) * {b}) AS BIGINT)"
                f" AS q_{a}_{b}"
            )
    selects = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = (
                f"(CAST(n AS HUGEINT) * q_{a}_{b}"
                f" - CAST(s_{a} AS HUGEINT) * s_{b})"
            )
            va = (
                f"(CAST(n AS HUGEINT) * q_{a}_{a}"
                f" - CAST(s_{a} AS HUGEINT) * s_{a})"
            )
            vb = (
                f"(CAST(n AS HUGEINT) * q_{b}_{b}"
                f" - CAST(s_{b} AS HUGEINT) * s_{b})"
            )
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, "
                f"CAST(CASE WHEN {va} > 0 AND {vb} > 0 THEN "
                f"(CASE WHEN {cov} >= 0 THEN 1 ELSE -1 END) * "
                f"((1000 * {cov} * {cov}) // ({va} * {vb})) END"
                f" AS BIGINT) AS r2_milli FROM m"
            )
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM ({rows_sql}))\n"
        + "\nUNION ALL\n".join(selects)
    )


def trimmed_mean(
    rows: DataFrame,
    value_col: str,
    id_col: str,
    trim_permille: int = 50,
    n_partitions: int = 32,
) -> DataFrame:
    """Symmetrically trimmed mean — the robust location estimate
    between a13's exact percentiles and the medians: one row
    DataFrame[n_total, n_kept, mean_cents, trimmed_mean_cents].

    Exact rank semantics: drop the k = (n·trim_permille) div 1000
    smallest AND largest values under the (value, id) total order
    (ties are real rows — rank decides, not value equality), average
    the rest with the engine's floor convention. ``trim_permille``
    must stay below 500 — enforced eagerly, because 2k < n holds for
    every n exactly when the rate is below one half, so the keep-set
    can never silently empty out.

    Plan: skinny (value, id) rank shuffle, one filtered aggregate.
    """
    from .relational import global_rank

    if not 0 <= trim_permille < 500:
        raise ValueError(
            "trimmed_mean: trim_permille must be in [0, 500) — "
            f"{trim_permille} would discard every row"
        )
    ranked = global_rank(
        rows.select(
            F.col(value_col).cast("long").alias("v"),
            F.col(id_col).alias("i"),
        ),
        "v",
        "i",
        rank_col="rk",
        n_partitions=n_partitions,
    )
    tot = ranked.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("v").cast("long").alias("sum_all"),
    )
    kept = (
        ranked.crossJoin(F.broadcast(tot))
        .where(
            (F.col("rk") > F.expr(f"(n_total * {trim_permille}) div 1000"))
            & (
                F.col("rk")
                <= F.expr(
                    f"n_total - (n_total * {trim_permille}) div 1000"
                )
            )
        )
        .groupBy("n_total", "sum_all")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("v").cast("long").alias("sum_kept"),
        )
    )
    return kept.select(
        "n_total",
        "n_kept",
        F.expr("sum_all div n_total").alias("mean_cents"),
        F.expr("sum_kept div n_kept").alias("trimmed_mean_cents"),
    )


def trimmed_mean_sql(
    rows_sql: str,
    value_expr: str,
    id_expr: str,
    trim_permille: int = 50,
) -> str:
    """DuckDB twin of :func:`trimmed_mean`."""
    return f"""
WITH ranked AS (
  SELECT CAST({value_expr} AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST({value_expr} AS BIGINT),
                            {id_expr}) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_total,
         CAST(SUM(CAST({value_expr} AS BIGINT)) OVER () AS BIGINT)
           AS sum_all
  FROM ({rows_sql})
)
SELECT n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(sum_all // n_total AS BIGINT) AS mean_cents,
       CAST(CAST(SUM(v) AS BIGINT) // COUNT(*) AS BIGINT)
         AS trimmed_mean_cents
FROM ranked
WHERE rk > (n_total * {trim_permille}) // 1000
  AND rk <= n_total - (n_total * {trim_permille}) // 1000
GROUP BY n_total, sum_all
"""


def chi2_independence(
    rows: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square independence statistic for two categorical
    columns — one row: DataFrame[n, n_cells, dof, chi2_micro].

    The n-scaled exact form: with observed O_ij, row margins R_i,
    column margins C_j and total n,

        chi2 = Σ_ij (n·O_ij − R_i·C_j)² / (n·R_i·C_j)

    Each cell's contribution is floored at MICRO precision and the
    floors are summed — a documented ⌊·⌋-per-cell convention (exact
    rational summation would need an unbounded common denominator);
    both engines floor the same cells, so the statistic is
    bit-identical cross-engine, and the error vs the real χ² is below
    n_cells·10^-6. Only OBSERVED (a, b) pairs contribute a nonzero
    (n·O − R·C)² term... plus the structural-zero cells (O_ij = 0,
    margins positive), whose contribution R_i·C_j/n is NOT zero — the
    full cross product of margins is joined in, so absent cells are
    counted exactly, not skipped. DECIMAL(38,0)/HUGEINT carries
    (n·O − R·C)² ≲ 10^36; dof = (|A|−1)(|B|−1) as usual.
    ``v2_micro`` is Cramér's V², the [0, 1]-normalized effect size
    χ²/(n·min(|A|−1, |B|−1)) — the number comparable ACROSS tables,
    where raw χ² only compares against its own dof.

    Scale: one (a, b) count aggregate (map-side combined), two margin
    re-aggregations OF THAT TABLE, one margins cross join sized
    |A|·|B| (category space, not data), one broadcast total. The
    data-sized scan happens once.

    NULL contract: rows where either category is NULL are excluded at
    entry (both engines). NULL is not a category level here — the
    margins cross-product equi-join cannot match NULL keys, so an
    unfiltered NULL row would be counted in the margins but dropped
    from its observed cell, silently inflating chi2. Map NULLs to an
    explicit sentinel level upstream if missingness itself is the
    signal under test.
    """
    obs = (
        rows.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").cast("long").alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").cast("long").alias("r"))
    cb = obs.groupBy("b").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    cells = (
        ra.crossJoin(cb)
        .join(obs, ["a", "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            "r",
            "c",
        )
    )
    contrib = cells.select(
        "n",
        F.expr(
            "CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * o"
            " - CAST(r AS DECIMAL(38,0)) * c)"
            " * (CAST(n AS DECIMAL(38,0)) * o"
            " - CAST(r AS DECIMAL(38,0)) * c))"
            " div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"
        ).alias("x"),
    )
    dims = ra.agg(F.count("*").cast("long").alias("na")).crossJoin(
        cb.agg(F.count("*").cast("long").alias("nb"))
    )
    return (
        contrib.groupBy("n")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("x").cast("long").alias("chi2_micro"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "n",
            "n_cells",
            F.expr("(na - 1) * (nb - 1)").alias("dof"),
            "chi2_micro",
            F.expr(
                "chi2_micro div (n * LEAST(na - 1, nb - 1))"
            ).alias("v2_micro"),
        )
    )


def chi2_independence_sql(
    rows_sql: str, a_expr: str, b_expr: str
) -> str:
    """DuckDB twin of :func:`chi2_independence` — identical margins
    cross product, per-cell micro floors, and HUGEINT products."""
    return f"""
WITH obs AS (
  SELECT {a_expr} AS a, {b_expr} AS b,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM ({rows_sql})
  WHERE ({a_expr}) IS NOT NULL AND ({b_expr}) IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY a),
cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY b),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT t.n, COALESCE(obs.o, 0) AS o, ra.r, cb.c
  FROM ra CROSS JOIN cb
  LEFT JOIN obs USING (a, b)
  CROSS JOIN tot t
),
contrib AS (
  SELECT n,
         (1000000 * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
                  * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c))
         // (CAST(n AS HUGEINT) * r * c) AS x
  FROM cells
),
dims AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS na,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS nb
)
SELECT c.n, CAST(COUNT(*) AS BIGINT) AS n_cells,
       (d.na - 1) * (d.nb - 1) AS dof,
       CAST(SUM(c.x) AS BIGINT) AS chi2_micro,
       CAST(CAST(SUM(c.x) AS BIGINT)
            // (c.n * LEAST(d.na - 1, d.nb - 1)) AS BIGINT) AS v2_micro
FROM contrib c CROSS JOIN dims d
GROUP BY c.n, d.na, d.nb
"""


def pr_curve(
    rows: DataFrame,
    score_col: str,
    label_col: str,
    n_points: int = 10,
    n_partitions: int = 32,
) -> DataFrame:
    """Precision/recall operating points at score-distribution
    deciles: DataFrame[point, threshold, n_pred_pos, n_tp,
    precision_milli, recall_milli, f1_milli] for point = 1..n_points,
    where point k's threshold is the score at rank ⌈k·N/n_points⌉
    from the TOP — "what do I get if I keep the top k/n of the corpus
    by score?", the operating table a curation pipeline actually reads
    (AUC compresses it to one number; this is the dial).

    Exact integers end to end: cum_pos/cum_all come from one exclusive
    prefix sum over the distinct-score table in DESCENDING score order
    (relational.global_prefix_sum on the negated score — never a
    single-partition window); the crossing row for each k is found by
    an inequality join of an n_points-row literal frame against that
    skinny table. precision = tp/pred_pos and recall = tp/n_pos floor
    at milli; ``f1_milli = (2000·tp) div (pred_pos + n_pos)`` — one
    floor, no intermediate ratios.

    Ties share a score, so a decile boundary inside a tie run reports
    the whole run (pred_pos can exceed k·N/n_points by the tie width —
    the honest convention; a row cannot be half-kept).
    """
    from .relational import global_prefix_sum

    is_pos = F.col(label_col).cast("boolean").cast("long")
    per = (
        rows.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("s"))
        .agg(
            F.count("*").cast("long").alias("c"),
            F.sum(is_pos).alias("pos"),
        )
        .select("s", "c", "pos", (-F.col("s")).alias("neg_s"))
    )
    cum = global_prefix_sum(
        per, "c", "neg_s", out_col="above", n_partitions=n_partitions
    )
    cum = global_prefix_sum(
        cum, "pos", "neg_s", out_col="pos_above",
        n_partitions=n_partitions,
    ).select(
        "s",
        (F.col("above") + F.col("c")).alias("cum_all"),
        (F.col("pos_above") + F.col("pos")).alias("cum_pos"),
        "c",
    )
    tot = cum.agg(
        F.max("cum_all").cast("long").alias("n_total"),
        F.max("cum_pos").cast("long").alias("n_pos"),
    )
    pts = rows.sparkSession.range(1, n_points + 1).select(
        F.col("id").cast("long").alias("point")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(pts),
            (
                F.col("cum_all") - F.col("c")
                < F.expr(f"(point * n_total + {n_points - 1})"
                         f" div {n_points}")
            )
            & (
                F.expr(f"(point * n_total + {n_points - 1})"
                       f" div {n_points}")
                <= F.col("cum_all")
            ),
        )
        .select(
            "point",
            F.col("s").alias("threshold"),
            F.col("cum_all").alias("n_pred_pos"),
            F.col("cum_pos").alias("n_tp"),
            F.expr("(1000 * cum_pos) div cum_all").alias(
                "precision_milli"
            ),
            F.expr(
                "CASE WHEN n_pos > 0 THEN (1000 * cum_pos) div n_pos"
                " END"
            ).alias("recall_milli"),
            F.expr(
                "(2000 * cum_pos) div (cum_all + n_pos)"
            ).alias("f1_milli"),
        )
    )


def pr_curve_sql(
    rows_sql: str,
    score_expr: str,
    label_expr: str,
    n_points: int = 10,
) -> str:
    """DuckDB twin of :func:`pr_curve`."""
    return f"""
WITH per AS (
  SELECT {score_expr} AS s, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS BIGINT)
           AS pos
  FROM ({rows_sql})
  WHERE {score_expr} IS NOT NULL AND ({label_expr}) IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT s, c,
         SUM(c) OVER (ORDER BY s DESC) AS cum_all,
         SUM(pos) OVER (ORDER BY s DESC) AS cum_pos
  FROM per
),
tot AS (
  SELECT CAST(MAX(cum_all) AS BIGINT) AS n_total,
         CAST(MAX(cum_pos) AS BIGINT) AS n_pos
  FROM cum
),
pts AS (SELECT UNNEST(generate_series(1, {n_points})) AS point)
SELECT p.point, m.s AS threshold,
       CAST(m.cum_all AS BIGINT) AS n_pred_pos,
       CAST(m.cum_pos AS BIGINT) AS n_tp,
       CAST((1000 * m.cum_pos) // m.cum_all AS BIGINT)
         AS precision_milli,
       CAST(CASE WHEN t.n_pos > 0 THEN (1000 * m.cum_pos) // t.n_pos
            END AS BIGINT) AS recall_milli,
       CAST((2000 * m.cum_pos) // (m.cum_all + t.n_pos) AS BIGINT)
         AS f1_milli
FROM cum m CROSS JOIN tot t
JOIN pts p
  ON m.cum_all - m.c < (p.point * t.n_total + {n_points - 1})
                       // {n_points}
 AND (p.point * t.n_total + {n_points - 1}) // {n_points} <= m.cum_all
"""


def cvm_drift(
    rows: DataFrame,
    value_col: str,
    split_col: str,
    base_value: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Exact two-sample Cramér–von Mises criterion between the
    ``split_col == base_value`` slice and everything else — one row:
    DataFrame[n_base, n_comp, cvm_micro].

    The integrated companion of :func:`ks_drift`: KS is the SUP of the
    CDF gap and fires on one sharp local shift; CvM integrates the
    SQUARED gap over the pooled distribution and accumulates many
    small shifts KS's single supremum can miss. Tie-safe pooled form
    (the empirical integral ∫(F_a−F_b)² dH_pooled): with per-distinct-
    value counts (a_v, b_v), inclusive cumulatives (ca, cb), totals
    (n, m), N = n+m,

        cvm_micro = ⌊10^6 · Σ_v (a_v+b_v)·(ca_v·m − cb_v·n)²
                      / (N² · n · m)⌋

    — every factor an integer; the per-value squares run in
    DECIMAL(38,0)/HUGEINT ((ca·m)² reaches 10^22 at million-row
    slices; the final quotient needs n·m·N² < 10^38 − trivially true
    whenever the counts fit BIGINT).

    Scale shape: identical to ks_drift — one map-side-combinable
    aggregate to the distinct-value table, two distributed prefix
    sums over it, a 1-row reduction.
    """
    from .relational import global_prefix_sum

    is_base = (F.col(split_col) == base_value).cast("long")
    per = (
        rows.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(is_base).alias("na"),
            F.sum(F.lit(1) - is_base).alias("nb"),
        )
    )
    pa = global_prefix_sum(
        per, "na", "v", out_col="pa", n_partitions=n_partitions
    )
    pb = global_prefix_sum(
        pa, "nb", "v", out_col="pb", n_partitions=n_partitions
    ).select(
        "v",
        "na",
        "nb",
        (F.col("pa") + F.col("na")).alias("ca"),
        (F.col("pb") + F.col("nb")).alias("cb"),
    )
    tot = pb.agg(
        F.sum("na").cast("long").alias("n_base"),
        F.sum("nb").cast("long").alias("n_comp"),
    )
    return (
        pb.crossJoin(F.broadcast(tot))
        .select(
            "n_base",
            "n_comp",
            F.expr(
                "CAST((na + nb) AS DECIMAL(38,0)) * "
                "(CAST(ca AS DECIMAL(38,0)) * n_comp"
                " - CAST(cb AS DECIMAL(38,0)) * n_base) * "
                "(CAST(ca AS DECIMAL(38,0)) * n_comp"
                " - CAST(cb AS DECIMAL(38,0)) * n_base)"
            ).alias("term"),
        )
        .groupBy("n_base", "n_comp")
        .agg(F.sum("term").alias("u"))
        .select(
            "n_base",
            "n_comp",
            F.expr(
                "CAST((1000000 * u) div "
                "(CAST(n_base + n_comp AS DECIMAL(38,0))"
                " * (n_base + n_comp) * n_base * n_comp) AS BIGINT)"
            ).alias("cvm_micro"),
        )
    )


def cvm_drift_sql(
    rows_sql: str, value_expr: str, split_expr: str, base_value: str
) -> str:
    """DuckDB twin of :func:`cvm_drift` (window cum sums stand in for
    the distributed prefix passes; HUGEINT squares)."""
    return f"""
WITH pv AS (
  SELECT {value_expr} AS v,
         SUM(CASE WHEN {split_expr} = {sql_str(base_value)} THEN 1 ELSE 0 END)
           AS na,
         SUM(CASE WHEN {split_expr} = {sql_str(base_value)} THEN 0 ELSE 1 END)
           AS nb
  FROM ({rows_sql}) WHERE {value_expr} IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v, na, nb,
         SUM(na) OVER (ORDER BY v) AS ca,
         SUM(nb) OVER (ORDER BY v) AS cb
  FROM pv
),
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS n_base,
         CAST(SUM(nb) AS BIGINT) AS n_comp
  FROM pv
)
SELECT t.n_base, t.n_comp,
       CAST((1000000 * SUM(CAST(na + nb AS HUGEINT)
              * (CAST(ca AS HUGEINT) * t.n_comp
                 - CAST(cb AS HUGEINT) * t.n_base)
              * (CAST(ca AS HUGEINT) * t.n_comp
                 - CAST(cb AS HUGEINT) * t.n_base)))
            // (CAST(t.n_base + t.n_comp AS HUGEINT)
                * (t.n_base + t.n_comp) * t.n_base * t.n_comp)
            AS BIGINT) AS cvm_micro
FROM cum CROSS JOIN tot t
GROUP BY t.n_base, t.n_comp
"""
