"""Window-function and event-time-window operators.

The reference has no SQL window functions (SURVEY.md §2.5) and no
event-time windows (§2.9) — these are part of the engine's extended
surface (§7): ranking/top-per-group for batch analytics, tumbling-window
aggregation for event streams (batch twin here; the streaming form with
watermarks lives in streaming/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sqlsafe import sql_str


def event_time_us(df: DataFrame, ts_col: str = "ts") -> Column:
    """Event time as microseconds-since-epoch (long) — the engine's
    canonical unit for integer window math. The events fixture's
    ``timestamp[us]`` column (read as TIMESTAMP_NTZ) converts via the
    UTC-pinned session timezone, so the result equals DuckDB's
    ``epoch_us(ts)`` exactly; long columns are taken as micros as-is."""
    if dict(df.dtypes).get(ts_col) in ("bigint", "int", "long"):
        return F.col(ts_col).cast("long")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _floor_div_sql(us_expr: str, divisor: int) -> str:
    """Exact integer FLOOR division for generated DuckDB SQL: DuckDB's
    integer ``//`` truncates toward zero (probed: −1 // d = 0), so the
    twins subtract the non-negative pmod remainder first — the
    quotient operand is then an exact multiple and truncation equals
    floor, matching :func:`event_day` for all sign ranges."""
    return (
        f"({us_expr} - (({us_expr} % {divisor}) + {divisor})"
        f" % {divisor}) // {divisor}"
    )


def event_day(df: DataFrame, ts_col: str = "ts") -> Column:
    """Calendar-day index (long) of :func:`event_time_us` — exact
    FLOOR division for all sign ranges: subtract the always
    non-negative ``pmod`` remainder, then one BIGINT ``div``
    (IntegralDivide) of the exact multiple, matching the SQL twins'
    ``//``. (The previous double division truncated toward zero —
    diverging for pre-1970 timestamps — and an intermediate
    DECIMAL(30,0) form was exact but paid ~2.7× expression cost;
    ``div`` on longs is exact because the numerator is a multiple.)"""
    us = event_time_us(df, ts_col)
    day_us = F.lit(86_400_000_000)
    return F.call_function("div", us - F.pmod(us, day_us), day_us)


def _event_timestamp(df: DataFrame, ts_col: str) -> Column:
    """TIMESTAMP form of :func:`event_time_us` (same conventions)."""
    if dict(df.dtypes).get(ts_col) in ("bigint", "int", "long"):
        return F.timestamp_micros(F.col(ts_col))
    return F.col(ts_col).cast("timestamp")


def top_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    n: int = 1,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-n rows per group by order_col DESC (tiebreak ASC for a total,
    deterministic order). row_number over a partitioned window — one
    shuffle on the group keys, no global sort."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def tumbling_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_minutes: int = 60,
) -> DataFrame:
    """Tumbling event-time window aggregation (batch form):
    DataFrame[window_start, key, n_events, sum_value].

    Event time is normalized to MICROseconds since epoch (see
    :func:`event_time_us`) — both engines then window on identical
    integers.
    """
    micros = 60_000_000 * window_minutes
    ts_us = event_time_us(events, ts_col)
    wstart = (ts_us - (ts_us % F.lit(micros))).alias("window_start_us")
    return (
        events.groupBy(wstart, F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100)
            .cast("long")
            .alias("sum_value_cents"),
        )
    )


def tumbling_window_counts_sql(window_minutes: int = 60) -> str:
    micros = 60_000_000 * window_minutes
    return f"""
SELECT CAST(epoch_us(ts) - (epoch_us(ts) % {micros}) AS BIGINT)
         AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Session windows via the lag-gap-cumsum idiom:
    DataFrame[user_id, session_id, session_start_us, n_events].

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. One shuffle on user_id; the windows are
    per-user (bounded partitions), not global. Event time normalized to
    microseconds (see tumbling_window_counts).
    """
    gap_us = 60_000_000 * gap_minutes
    base = events.withColumn("_ts_us", event_time_us(events, ts_col))
    w_user = Window.partitionBy(user_col).orderBy("_ts_us")
    with_gap = base.withColumn(
        "_new",
        F.when(
            (F.col("_ts_us") - F.lag("_ts_us").over(w_user)) > gap_us, 1
        ).otherwise(0),
    )
    with_sess = with_gap.withColumn(
        "session_id",
        F.sum("_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.min("_ts_us").alias("session_start_us"),
        F.count("*").alias("n_events"),
    )


def session_window_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Session windows via Spark's NATIVE ``session_window`` operator:
    DataFrame[user_id, session_start_us, session_end_us, n_events].

    The built-in form of :func:`sessionize` (which uses the lag-gap-
    cumsum idiom): Catalyst plans an UpdatingSessionsExec + merge, the
    same operator Structured Streaming uses for watermarked session
    aggregation — so the batch query here is the exact batch twin of the
    streaming form. Boundary semantics (pinned empirically by test +
    oracle): an event exactly ``gap`` after the previous one MERGES into
    the running session (a new session requires diff > gap — the same
    rule as :func:`sessionize`); session_end = last event + gap.
    """
    base = events.select(
        F.col(user_col), _event_timestamp(events, ts_col).alias("_ets")
    )
    return (
        base.groupBy(
            F.session_window("_ets", f"{gap_minutes} minutes"),
            user_col,
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end")).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )


def session_window_counts_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin of :func:`session_window_counts` (islands with the
    native operator's measured boundary rule: new session when
    diff > gap, merge at exactly gap)."""
    gap_us = 60_000_000 * gap_minutes
    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS ts_us
  FROM events
),
g AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER
                (PARTITION BY user_id ORDER BY ts_us) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
s AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {gap_us} AS session_end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def sessionize_sql(gap_minutes: int = 30) -> str:
    gap_us = 60_000_000 * gap_minutes
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
),
g AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER
                (PARTITION BY user_id ORDER BY ts_us) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
s AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts_us) AS session_start_us,
       COUNT(*) AS n_events
FROM s GROUP BY 1, 2
"""


def band_join_pairs(
    events: DataFrame,
    delta_seconds: int = 60,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Temporal band self-join: pairs of same-``key_col`` events whose
    timestamps differ by at most ``delta_seconds`` —
    DataFrame[key, a_id, b_id, gap_us] with ``a_id < b_id``.

    The banded theta-join |ts_a − ts_b| ≤ Δ is turned into an exact
    equi-join by bucketing time into Δ-wide cells and exploding ONE side
    to its 3 neighboring buckets (the 1-D analog of the 2-D grid trick
    the engine's exact-outlier join uses, operators/outliers.py): a
    qualifying pair (a, b) with a_id < b_id is found exactly once — via
    left=a exploded into b's bucket — and never twice, because the
    id-ordering filter kills the mirrored match. Candidates are bounded
    by per-bucket density (events within Δ of each other), never n²;
    the shuffle key is (key, bucket), whose cardinality grows with the
    time span — no low-cardinality hot key. Skewed bursts inside one
    Δ-window are the residual risk; AQE skew-join handles them.
    """
    delta_us = int(delta_seconds) * 1_000_000
    ts_us = event_time_us(events, ts_col)
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("eid"),
        ts_us.alias("ts_us"),
    ).withColumn("bucket", F.floor(F.col("ts_us") / F.lit(delta_us)))
    left = base.select(
        "k",
        F.col("eid").alias("a_id"),
        F.col("ts_us").alias("a_us"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket"),
    )
    right = base.select(
        "k",
        F.col("eid").alias("b_id"),
        F.col("ts_us").alias("b_us"),
        "bucket",
    )
    return (
        left.join(right, ["k", "bucket"])
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= delta_us)
        )
        .select(
            F.col("k").alias(key_col),
            "a_id",
            "b_id",
            F.abs(F.col("a_us") - F.col("b_us")).alias("gap_us"),
        )
    )


def band_join_report(
    events: DataFrame, delta_seconds: int = 60, **kw
) -> DataFrame:
    """Oracle-facing aggregate of :func:`band_join_pairs`:
    DataFrame[event_type, n_pairs, sum_gap_us] — exact-integer sums, so
    the hash compare certifies every pair the banded join found."""
    pairs = band_join_pairs(events, delta_seconds, **kw)
    key = pairs.columns[0]
    return pairs.groupBy(key).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("gap_us").cast("long").alias("sum_gap_us"),
    )


def band_join_report_sql(delta_seconds: int = 60) -> str:
    """DuckDB twin of :func:`band_join_report` — the *unbucketed* theta
    join, deliberately: equality of the aggregates certifies the bucket
    blocking is exact (finds every pair, none twice)."""
    d = int(delta_seconds) * 1_000_000
    return f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS u FROM events
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(abs(a.u - b.u)) AS BIGINT) AS sum_gap_us
FROM e a JOIN e b
  ON a.event_type = b.event_type
 AND a.event_id < b.event_id
 AND abs(a.u - b.u) <= {d}
GROUP BY a.event_type
"""


def interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    bin_width_seconds: int = 1800,
    id_left: str = "a_id",
    id_right: str = "b_id",
    start: str = "s",
    end: str = "e",
) -> DataFrame:
    """Interval overlap join (the range join Spark has no native
    operator for; Databricks ships it as a hint, genomics engines as
    a dedicated join): pairs of closed intervals [s, e] from ``left``
    × ``right`` that overlap — DataFrame[a_id, b_id, overlap_us] with
    overlap_us = least(ends) − greatest(starts) (0 for touching).

    The theta join ``a.s <= b.e AND b.s <= a.e`` becomes an exact
    equi-join by exploding BOTH sides into the W-wide time bins each
    interval covers and joining on bin. The report-once rule removes
    duplicates without a distinct: a qualifying pair is emitted only
    at the bin containing ``greatest(a.s, b.s)`` — a point inside both
    intervals, so exactly one joined bin passes the filter. Candidates
    are bounded by per-bin density × interval span/W (pick W near the
    typical interval length); the shuffle key is the bin, whose
    cardinality grows with the time span — no hot key, never n².
    """
    w_us = int(bin_width_seconds) * 1_000_000
    def _binned(df, idc, tag):
        return df.select(
            F.col(idc),
            F.col(start).alias(f"{tag}s"),
            F.col(end).alias(f"{tag}e"),
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / F.lit(w_us)),
                    F.floor(F.col(end) / F.lit(w_us)),
                )
            ).alias("bin"),
        )

    la = _binned(left, id_left, "a")
    rb = _binned(right, id_right, "b")
    anchor = F.greatest(F.col("as"), F.col("bs"))
    return (
        la.join(rb, "bin")
        .where(
            (F.col("as") <= F.col("be"))
            & (F.col("bs") <= F.col("ae"))
            & (F.floor(anchor / F.lit(w_us)) == F.col("bin"))
        )
        .select(
            id_left,
            id_right,
            (
                F.least(F.col("ae"), F.col("be"))
                - F.greatest(F.col("as"), F.col("bs"))
            ).alias("overlap_us"),
        )
    )


def interval_overlap_sql(
    left_sql: str, right_sql: str, id_left: str = "a_id",
    id_right: str = "b_id",
) -> str:
    """DuckDB twin of :func:`interval_overlap_pairs` — the UNbinned
    inequality join (DuckDB's IEJoin), deliberately: agreement
    certifies the bin blocking finds every overlap exactly once."""
    return f"""
WITH a AS ({left_sql}), b AS ({right_sql})
SELECT a.{id_left}, b.{id_right},
       CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
"""


# ---------------------------------------------------------------------------
# Event-sequence analytics: funnel conversion + cohort retention
# ---------------------------------------------------------------------------

FUNNEL_HORIZON_US = 7 * 86_400_000_000  # 7 days
WEEK_US = 7 * 86_400_000_000


def funnel_report(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion counts: DataFrame[step, event_type,
    users] — how many users completed step i, where completing step i
    means a strictly-later occurrence of ``steps[i]`` after the user's
    step-(i-1) time, all within ``horizon_us`` of their step-1 time
    (the windowFunnel shape event-analytics engines expose).

    Semantics: step 1 anchors at the user's EARLIEST step-1 event; each
    later step takes the earliest qualifying occurrence (greedy-minimal
    completion times — the standard definition, and order-independent).

    Plan: one user-keyed aggregation per step, each a semi-join against
    the previous step's (user, t_prev, t_anchor) — k-1 user-keyed
    shuffle joins for a k-step funnel, no window over the full event
    stream and no per-user event-list materialization. All comparisons
    in integer micros (:func:`event_time_us`), so the DuckDB twin is
    bit-exact.
    """
    if len(steps) < 2:
        raise ValueError("funnel_report: need at least 2 steps")
    us = event_time_us(events, ts_col)
    typed = events.select(
        F.col("user_id"), F.col("event_type"), us.alias("u")
    )
    # each step table is used twice (its count + the next step's join):
    # checkpoint so neither re-derives the upstream filter-join chain.
    # Bounded: one (user, t, anchor) row per surviving user.
    cur = (
        typed.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("u").alias("t"))
        .withColumn("anchor", F.col("t"))
        .localCheckpoint(eager=False)
    )
    counts = [(1, steps[0], cur.count())]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            typed.where(F.col("event_type") == step)
            .join(cur.select("user_id", "t", "anchor"), "user_id")
            .where(
                (F.col("u") > F.col("t"))
                & (F.col("u") <= F.col("anchor") + F.lit(horizon_us))
            )
            .groupBy("user_id")
            .agg(
                F.min("u").alias("t"),
                F.min("anchor").alias("anchor"),  # unique per user
            )
            .localCheckpoint(eager=False)
        )
        counts.append((i, step, nxt.count()))
        cur = nxt
    spark = events.sparkSession
    return spark.createDataFrame(
        [(s, n, int(c)) for s, n, c in counts],
        "step int, event_type string, users bigint",
    )


def funnel_report_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
) -> str:
    """DuckDB twin of :func:`funnel_report` (chained min-aggregation
    CTEs, identical integer-micro comparisons)."""
    ctes = [
        f"""
s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t, MIN(epoch_us(ts)) AS anchor
  FROM events WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(f"""
s{i} AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t, MIN(p.anchor) AS anchor
  FROM events e JOIN s{i - 1} p ON p.user_id = e.user_id
  WHERE e.event_type = '{step}'
    AND epoch_us(e.ts) > p.t
    AND epoch_us(e.ts) <= p.anchor + {horizon_us}
  GROUP BY e.user_id
)"""
        )
    selects = [
        f"SELECT {i} AS step, {sql_str(s)} AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS users FROM s{i}"
        for i, s in enumerate(steps, start=1)
    ]
    return (
        "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
    )


def funnel_times(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert distribution per funnel step: DataFrame[step,
    event_type, users, median_gap_us, max_gap_us] for steps 2..k,
    where gap = completion time − the user's step-1 anchor (integer
    micros, same greedy-minimal semantics as :func:`funnel_report`).

    median is Spark's exact ``percentile`` ≡ DuckDB ``quantile_cont``
    (integer inputs: the even-count midpoint average is exact in a
    double — the a13 cross-engine pattern). Exact percentile gathers
    each step's gaps per group; with a handful of steps that is k tiny
    groups — the 100 TB approximation path is the t11 histogram sketch
    over the same gaps.
    """
    if len(steps) < 2:
        raise ValueError("funnel_times: need at least 2 steps")
    us = event_time_us(events, ts_col)
    typed = events.select(
        F.col("user_id"), F.col("event_type"), us.alias("u")
    )
    cur = (
        typed.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("u").alias("t"))
        .withColumn("anchor", F.col("t"))
        .localCheckpoint(eager=False)
    )
    gaps = None
    for i, step in enumerate(steps[1:], start=2):
        cur = (
            typed.where(F.col("event_type") == step)
            .join(cur.select("user_id", "t", "anchor"), "user_id")
            .where(
                (F.col("u") > F.col("t"))
                & (F.col("u") <= F.col("anchor") + F.lit(horizon_us))
            )
            .groupBy("user_id")
            .agg(
                F.min("u").alias("t"),
                F.min("anchor").alias("anchor"),
            )
            .localCheckpoint(eager=False)
        )
        g = cur.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            (F.col("t") - F.col("anchor")).alias("gap"),
        )
        gaps = g if gaps is None else gaps.unionByName(g)
    return (
        gaps.groupBy("step", "event_type")
        .agg(
            F.count("*").cast("long").alias("users"),
            F.percentile("gap", F.lit(0.5)).alias("median_gap_us"),
            F.max("gap").cast("long").alias("max_gap_us"),
        )
    )


def funnel_times_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
) -> str:
    """DuckDB twin of :func:`funnel_times` (same chained CTEs as the
    funnel oracle; quantile_cont for the exact median)."""
    ctes = [
        f"""
s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t, MIN(epoch_us(ts)) AS anchor
  FROM events WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(f"""
s{i} AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t, MIN(p.anchor) AS anchor
  FROM events e JOIN s{i - 1} p ON p.user_id = e.user_id
  WHERE e.event_type = '{step}'
    AND epoch_us(e.ts) > p.t
    AND epoch_us(e.ts) <= p.anchor + {horizon_us}
  GROUP BY e.user_id
)"""
        )
    selects = [
        f"SELECT {i} AS step, {sql_str(s)} AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS users, "
        f"quantile_cont(t - anchor, 0.5) AS median_gap_us, "
        f"CAST(MAX(t - anchor) AS BIGINT) AS max_gap_us FROM s{i}"
        for i, s in enumerate(steps[1:], start=2)
    ]
    return (
        "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
    )


def cohort_retention(
    events: DataFrame,
    anchor_type: str = "signup",
    max_offset: int = 3,
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: DataFrame[cohort_week, week_offset,
    users] — users are cohorted by the epoch week of their first
    ``anchor_type`` event; ``users`` counts how many of each cohort
    have ANY event in cohort_week + offset (offset 0..``max_offset``).

    The classic retention triangle. Weeks are integer epoch weeks
    (floor(micros / 7 days), pmod-floored so pre-epoch times cohort
    identically in both engines). Plan: one aggregation for cohorts,
    one distinct (user, week) projection of the activity stream, one
    user-keyed join — the (user, week) grain keeps the join input
    bounded by active-user-weeks, not raw events.
    """
    us = event_time_us(events, ts_col)
    wk = ((us - F.pmod(us, F.lit(WEEK_US))) / F.lit(WEEK_US)).cast(
        "long"
    )
    cohorts = (
        events.where(F.col("event_type") == anchor_type)
        .select("user_id", wk.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = events.select("user_id", wk.alias("week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .where(F.col("week_offset").between(0, max_offset))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
    )


def cohort_retention_sql(
    anchor_type: str = "signup", max_offset: int = 3
) -> str:
    """DuckDB twin of :func:`cohort_retention` (// floors like pmod)."""
    wk = f"({_floor_div_sql('epoch_us(ts)', WEEK_US)})"
    return f"""
WITH cohorts AS (
  SELECT user_id, MIN({wk}) AS cohort_week
  FROM events WHERE event_type = '{anchor_type}' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, {wk} AS week FROM events
)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users
FROM activity a JOIN cohorts c USING (user_id)
WHERE a.week - c.cohort_week BETWEEN 0 AND {max_offset}
GROUP BY 1, 2
"""


def event_transitions(
    events: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    stream: DataFrame[prev_type, next_type, n] — the behavioral
    transition matrix (what follows what), the summary path-analysis
    and next-event models start from.

    Per-user lead() over the deterministic total order (event-time
    micros, event_id tiebreak) — the window is partitioned by user, so
    state per partition is one user's events, never a global sort.
    """
    us = event_time_us(events, ts_col)
    w = Window.partitionBy("user_id").orderBy(
        us.asc(), F.col("event_id").asc()
    )
    nxt = F.lead("event_type").over(w)
    return (
        events.select(
            F.col("event_type").alias("prev_type"), nxt.alias("next_type")
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


def event_transitions_sql() -> str:
    """DuckDB twin of :func:`event_transitions`."""
    return """
WITH seq AS (
  SELECT event_type AS prev_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS next_type
  FROM events
)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def rfm_scores(
    events: DataFrame, tiles: int = 4, ts_col: str = "ts"
) -> DataFrame:
    """RFM segmentation: DataFrame[user_id, recency_us, frequency,
    monetary_cents, r_score, f_score, m_score] — each user scored
    1..``tiles`` (1 = best) by rank-quartile on recency (latest event
    time), frequency (event count), and monetary (summed value,
    integer cents).

    Scores come from the engine's two-pass distributed
    :func:`relational.global_rank` — never the single-partition
    ``NTILE() OVER (ORDER BY ...)`` degeneration — with the tile
    computed from the rank by exact integer ops
    (``(rank-1)·tiles // n + 1``), so the DuckDB twin (ROW_NUMBER +
    integer division) is bit-identical. Ties break on user_id: total
    order, deterministic on any cluster size.
    """
    from .relational import global_rank

    us = event_time_us(events, ts_col)
    per = events.groupBy("user_id").agg(
        F.max(us).alias("recency_us"),
        F.count("*").cast("long").alias("frequency"),
        F.round(F.sum("value") * 100).cast("long").alias(
            "monetary_cents"
        ),
    )
    n = per.count()
    scored = per
    for metric, score in (
        ("recency_us", "r_score"),
        ("frequency", "f_score"),
        ("monetary_cents", "m_score"),
    ):
        neg = f"_neg_{metric}"
        ranked = global_rank(
            scored.withColumn(neg, -F.col(metric)),
            neg,
            "user_id",
            rank_col="_rk",
        )
        t = (F.col("_rk") - 1) * tiles
        scored = ranked.withColumn(
            score,
            ((t - F.pmod(t, F.lit(n))) / F.lit(n) + 1).cast("int"),
        ).drop(neg, "_rk")
    return scored


def rfm_scores_sql(tiles: int = 4) -> str:
    """DuckDB twin of :func:`rfm_scores` (ROW_NUMBER under the same
    total orders; // floors exactly like the pmod form)."""
    return f"""
WITH per AS (
  SELECT user_id,
         MAX(epoch_us(ts)) AS recency_us,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS monetary_cents
  FROM events GROUP BY user_id
),
n AS (SELECT COUNT(*) AS n FROM per),
r AS (
  SELECT per.*,
    ROW_NUMBER() OVER (ORDER BY -recency_us, user_id) AS rr,
    ROW_NUMBER() OVER (ORDER BY -frequency, user_id) AS fr,
    ROW_NUMBER() OVER (ORDER BY -monetary_cents, user_id) AS mr
  FROM per
)
SELECT user_id, recency_us, frequency, monetary_cents,
       CAST((rr - 1) * {tiles} // n.n + 1 AS INT) AS r_score,
       CAST((fr - 1) * {tiles} // n.n + 1 AS INT) AS f_score,
       CAST((mr - 1) * {tiles} // n.n + 1 AS INT) AS m_score
FROM r, n
"""


def session_paths(
    events: DataFrame,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Top session paths: DataFrame[path, n_sessions] — each session's
    ordered event-type sequence joined with '>', counted across the
    corpus, top-``top`` by (count desc, path) total order.

    The "common journeys" report on top of :func:`sessionize` (same
    lag-gap-cumsum islands, same gap rule). Paths are rebuilt
    order-preservingly via sort_array(collect_list(struct(ts, id,
    type))) per session — per-session state only; the heavy grain is
    (user, session), never the corpus.
    """
    gap_us = 60_000_000 * gap_minutes
    base = events.withColumn("_ts_us", event_time_us(events, ts_col))
    w_user = Window.partitionBy(user_col).orderBy(
        "_ts_us", "event_id"
    )
    with_sess = base.withColumn(
        "_new",
        F.when(
            (F.col("_ts_us") - F.lag("_ts_us").over(w_user)) > gap_us, 1
        ).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = with_sess.groupBy(user_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("_ts_us", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top)
    )


def session_paths_sql(top: int = 20, gap_minutes: int = 30) -> str:
    """DuckDB twin of :func:`session_paths` (same islands; ordered
    string_agg rebuild)."""
    gap_us = 60_000_000 * gap_minutes
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
  FROM events
),
g AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER
                (PARTITION BY user_id ORDER BY ts_us, event_id) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
s AS (
  SELECT user_id, event_id, event_type, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id
           ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM s GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC LIMIT {top}
"""


def gapfill_locf(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Calendar gap-fill + last-observation-carried-forward resample —
    the hypertable/time_bucket_gapfill query every time-series store
    ships: DataFrame[event_type, day, n_events, sum_value_cents,
    observed] with one row for EVERY calendar day between a type's
    first and last observed day; missing days carry the most recent
    observed ``sum_value_cents`` forward (LOCF) and flag
    ``observed = 0`` (``n_events = 0``).

    Integer-exact: day = epoch_us div 86_400_000_000, values in
    round-to-cents BIGINTs (the engine convention).

    Plan shape for 100 TB: the only corpus-sized step is the
    (key, day) count/sum aggregate (map-side combined). The calendar
    spine is built per key from the aggregate's own min/max via
    ``sequence()`` — n_keys rows exploding to n_keys × n_days — and
    the LOCF window runs over that tiny daily series, never over raw
    events. No generator UDF, no driver loop.
    """
    day = event_day(events, ts_col)
    daily = (
        events.select(F.col(key_col).alias("key"), day.alias("day"), "value")
        .groupBy("key", "day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value") * 100)
            .cast("long")
            .alias("sum_value_cents"),
        )
    )
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "key",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = spine.join(daily, ["key", "day"], "left").select(
        F.col("key").alias(key_col),
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("sum_value_cents", ignorenulls=True)
        .over(w)
        .alias("sum_value_cents"),
        F.when(F.col("n_events").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("observed"),
    )
    return filled


def gapfill_locf_sql() -> str:
    """DuckDB twin of :func:`gapfill_locf` (identical integer day
    bucketing; the spine via generate_series, LOCF via the same
    IGNORE NULLS running window)."""
    return """
WITH daily AS (
  SELECT event_type AS key, (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT key, UNNEST(generate_series(MIN(day), MAX(day))) AS day
  FROM daily GROUP BY key
)
SELECT s.key AS event_type, s.day,
       CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
       LAST_VALUE(d.sum_value_cents IGNORE NULLS) OVER (
         PARTITION BY s.key ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS sum_value_cents,
       CAST(CASE WHEN d.n_events IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS observed
FROM spine s LEFT JOIN daily d USING (key, day)
"""


def mad_outliers(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    threshold_milli: int = 3000,
) -> DataFrame:
    """Robust per-key anomaly detection on the daily series: days whose
    count deviates from the key's MEDIAN by more than
    ``threshold_milli``/1000 MADs (median absolute deviation) — the
    median/MAD z-score that survives the skew and heavy tails a mean/
    stddev gate drowns in.

    Integer-exact across engines (no percentile interpolation floats):
    with n daily values sorted, ``med_x2`` = the sum of the two middle
    elements (positions ⌈n/2⌉ and ⌈(n+1)/2⌉ by row_number — equal for
    odd n, so med_x2 = 2·median exactly). Deviations are computed in
    doubled units ``dev_x2 = |2·x − med_x2|``, their median again by
    the middle-two-sum trick giving ``mad_x4 = 4·MAD``, and

        score_milli = (1000 · 2 · dev_x2) div mad_x4

    equals ⌊1000·|x−med|/MAD⌋ exactly. Zero-MAD keys (constant series)
    never alert — a documented gate, not a division crash.

    Plan: one corpus-sized (key, day) count, then three windows over
    the tiny n_keys × n_days daily series. 100 TB-safe for the same
    reason event_spikes is.
    """
    day = event_day(events, ts_col)
    daily = (
        events.select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    wn = Window.partitionBy("key")

    def _median_x2(df: DataFrame, val: str, out: str) -> DataFrame:
        # sum of the two middle elements of val within key (ties broken
        # by the value itself — positions only depend on the multiset)
        wo = Window.partitionBy("key").orderBy(val)
        ranked = df.select(
            "*",
            F.row_number().over(wo).alias("_rn"),
            F.count("*").over(wn).alias("_n"),
        )
        mid = ranked.where(
            (F.col("_rn") == F.expr("(_n + 1) div 2"))
            | (F.col("_rn") == F.expr("(_n + 2) div 2"))
        )
        # odd n: one row qualifies both predicates -> double it
        med = mid.groupBy("key").agg(
            (
                F.sum(val)
                * F.when(F.count("*") == 1, F.lit(2)).otherwise(F.lit(1))
            )
            .cast("long")
            .alias(out)
        )
        return med

    med = _median_x2(daily, "n_events", "med_x2")
    dev = daily.join(F.broadcast(med), "key").select(
        "key",
        "day",
        "n_events",
        "med_x2",
        F.abs(2 * F.col("n_events") - F.col("med_x2")).alias("dev_x2"),
    )
    mad = _median_x2(
        dev.select("key", "dev_x2"), "dev_x2", "mad_x4"
    )
    scored = dev.join(F.broadcast(mad), "key").where(F.col("mad_x4") > 0)
    return scored.select(
        F.col("key").alias(key_col),
        "day",
        "n_events",
        F.expr("med_x2 div 2").alias("median_count"),
        F.expr("(1000 * 2 * dev_x2) div mad_x4").alias("score_milli"),
    ).where(F.col("score_milli") >= threshold_milli)


def mad_outliers_sql(threshold_milli: int = 3000) -> str:
    """DuckDB twin of :func:`mad_outliers` — same middle-two-sum
    integer median, same doubled-unit deviations, same floor division."""
    return f"""
WITH daily AS (
  SELECT event_type AS key, (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY n_events)
              AS rn,
            COUNT(*) OVER (PARTITION BY key) AS n
  FROM daily
),
med AS (
  SELECT key, CAST(SUM(n_events) *
                   (CASE WHEN COUNT(*) = 1 THEN 2 ELSE 1 END)
              AS BIGINT) AS med_x2
  FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY key
),
dev AS (
  SELECT d.key, d.day, d.n_events, m.med_x2,
         ABS(2 * d.n_events - m.med_x2) AS dev_x2
  FROM daily d JOIN med m USING (key)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY dev_x2) AS rn,
            COUNT(*) OVER (PARTITION BY key) AS n
  FROM dev
),
mad AS (
  SELECT key, CAST(SUM(dev_x2) *
                   (CASE WHEN COUNT(*) = 1 THEN 2 ELSE 1 END)
              AS BIGINT) AS mad_x4
  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY key
)
SELECT d.key AS event_type, d.day, d.n_events,
       d.med_x2 // 2 AS median_count,
       (1000 * 2 * d.dev_x2) // m.mad_x4 AS score_milli
FROM dev d JOIN mad m USING (key)
WHERE m.mad_x4 > 0
  AND (1000 * 2 * d.dev_x2) // m.mad_x4 >= {threshold_milli}
"""


def event_spikes(
    events: DataFrame,
    horizon_days: int = 7,
    threshold_milli: int = 2000,
    ts_col: str = "ts",
) -> DataFrame:
    """Daily volume anomalies per event type — the monitoring query a
    pipeline runs over its own ingest: DataFrame[event_type, day,
    n_events, ratio_milli] for days whose count is >=
    ``threshold_milli``/1000 × the trailing ``horizon_days``-day mean.

    Integer-exact (the engine's cross-engine convention): day =
    epoch_us div 86_400_000_000 (integer day number), and

        ratio_milli = (1000 · n_events · days_observed)
                      div trailing_sum

    over a RANGE frame [-horizon_days, -1] on the integer day — RANGE,
    not ROWS, so calendar gaps don't stretch the horizon; days with an
    empty trailing window (the series' first day) never alert.

    Plan: one (event_type, day) count (map-side combined — the only
    corpus-sized aggregation), then a per-type window over the tiny
    daily series. At 100 TB the window input is n_types × n_days rows,
    thousands not billions.
    """
    day = event_day(events, ts_col)
    daily = (
        events.select(F.col("event_type"), day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-horizon_days, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.sum("n_events").over(w).alias("trail_sum"),
        F.count("n_events").over(w).alias("trail_days"),
    ).where(F.col("trail_sum").isNotNull() & (F.col("trail_sum") > 0))
    return scored.select(
        "event_type",
        "day",
        "n_events",
        F.expr("(1000 * n_events * trail_days) div trail_sum").alias(
            "ratio_milli"
        ),
    ).where(F.col("ratio_milli") >= threshold_milli)


def event_spikes_sql(
    horizon_days: int = 7, threshold_milli: int = 2000
) -> str:
    """DuckDB twin of :func:`event_spikes` (identical integer day
    bucketing, identical RANGE frame, identical floor division)."""
    return f"""
WITH daily AS (
  SELECT event_type, (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, day, n_events,
         SUM(n_events) OVER w AS trail_sum,
         COUNT(n_events) OVER w AS trail_days
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN {horizon_days} PRECEDING
                         AND 1 PRECEDING)
)
SELECT event_type, day, n_events,
       CAST((1000 * n_events * trail_days) // trail_sum AS BIGINT)
         AS ratio_milli
FROM scored
WHERE trail_sum IS NOT NULL AND trail_sum > 0
  AND (1000 * n_events * trail_days) // trail_sum >= {threshold_milli}
"""


def ab_funnel_report(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
    ts_col: str = "ts",
) -> DataFrame:
    """The experimentation readout: :func:`funnel_report` split by a
    deterministic 50/50 variant assignment (``user_id`` parity — the
    hash-bucket A/B split every event platform runs), with conversion
    against the variant's OWN step-1 cohort as an exact integer per
    mille. DataFrame[variant, step, event_type, users, conv_milli].

    Same plan as the plain funnel (k-1 user-keyed min-agg joins; the
    variant is a projection of the join key, so it adds no shuffle) —
    only the ≤ 2·k-row count collection differs.
    """
    if len(steps) < 2:
        raise ValueError("ab_funnel_report: need at least 2 steps")
    us = event_time_us(events, ts_col)
    variant = F.when(
        F.pmod(F.col("user_id"), F.lit(2)) == 0, "A"
    ).otherwise("B")
    typed = events.select(
        F.col("user_id"),
        variant.alias("variant"),
        F.col("event_type"),
        us.alias("u"),
    )
    cur = (
        typed.where(F.col("event_type") == steps[0])
        .groupBy("user_id", "variant")
        .agg(F.min("u").alias("t"))
        .withColumn("anchor", F.col("t"))
        .localCheckpoint(eager=False)
    )

    def counts_of(df):
        return {
            r["variant"]: r["n"]
            for r in df.groupBy("variant")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    base = counts_of(cur)
    rows = [
        (v, 1, steps[0], int(n), 1000)
        for v, n in sorted(base.items())
    ]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            typed.where(F.col("event_type") == step)
            .select("user_id", "u")
            .join(
                cur.select("user_id", "variant", "t", "anchor"),
                "user_id",
            )
            .where(
                (F.col("u") > F.col("t"))
                & (F.col("u") <= F.col("anchor") + F.lit(horizon_us))
            )
            .groupBy("user_id", "variant")
            .agg(
                F.min("u").alias("t"),
                F.min("anchor").alias("anchor"),
            )
            .localCheckpoint(eager=False)
        )
        got = counts_of(nxt)
        for v in sorted(base):
            n = int(got.get(v, 0))
            rows.append(
                (v, i, step, n, 1000 * n // base[v] if base[v] else 0)
            )
        cur = nxt
    return events.sparkSession.createDataFrame(
        rows,
        "variant string, step int, event_type string, "
        "users bigint, conv_milli bigint",
    )


def ab_funnel_report_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    horizon_us: int = FUNNEL_HORIZON_US,
) -> str:
    """DuckDB twin of :func:`ab_funnel_report`."""
    var = "CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END"
    ctes = [
        f"""
s1 AS (
  SELECT user_id, {var} AS variant,
         MIN(epoch_us(ts)) AS t, MIN(epoch_us(ts)) AS anchor
  FROM events WHERE event_type = '{steps[0]}' GROUP BY 1, 2
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(f"""
s{i} AS (
  SELECT e.user_id, p.variant,
         MIN(epoch_us(e.ts)) AS t, MIN(p.anchor) AS anchor
  FROM events e JOIN s{i - 1} p ON p.user_id = e.user_id
  WHERE e.event_type = '{step}'
    AND epoch_us(e.ts) > p.t
    AND epoch_us(e.ts) <= p.anchor + {horizon_us}
  GROUP BY 1, 2
)"""
        )
    ctes.append(
        "base AS (SELECT variant, COUNT(*) AS b FROM s1 GROUP BY 1)"
    )
    selects = [
        f"""
SELECT b.variant, {i} AS step, {sql_str(s)} AS event_type,
       CAST(COALESCE(n.n, 0) AS BIGINT) AS users,
       CAST(1000 * COALESCE(n.n, 0) // b.b AS BIGINT) AS conv_milli
FROM base b LEFT JOIN (
  SELECT variant, COUNT(*) AS n FROM s{i} GROUP BY 1
) n ON b.variant = n.variant"""
        for i, s in enumerate(steps, start=1)
    ]
    return (
        "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
    )


def scd2_history(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history of an attribute stream:
    DataFrame[<key>, status, valid_from_us, valid_to_us, is_current].

    Each update stream row says "entity ``key`` has attribute value
    ``attr`` as of ``ts``"; the SCD2 history keeps one row per
    VERSION — consecutive updates with the same value collapse into
    the version that first set it (gaps-and-islands change-point
    detection), ``valid_to_us`` is the next version's start (NULL for
    the open, current version). The total order inside an entity is
    (ts, seq) so ties are deterministic cross-engine.

    One window pass per step over (key)-partitioned data — no global
    window, scales with the number of entities. This is also the
    batch twin the incremental table-level merge
    (``sources/layout.scd2_merge``) must reproduce: applying the same
    stream in any time-ordered batch split yields bit-identical
    history (pinned in tests/test_layout.py).
    """
    us = event_time_us(events, ts_col)
    w = Window.partitionBy(key).orderBy("_ts_us", "_seq")
    chg = (
        events.select(
            F.col(key),
            F.col(attr).alias("status"),
            us.alias("_ts_us"),
            F.col(seq).alias("_seq"),
        )
        .withColumn("_prev", F.lag("status").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("status")))
    )
    w2 = Window.partitionBy(key).orderBy("_ts_us", "_seq")
    return (
        chg.withColumn("_next_us", F.lead("_ts_us").over(w2))
        .select(
            key,
            "status",
            F.col("_ts_us").alias("valid_from_us"),
            F.col("_next_us").alias("valid_to_us"),
            F.col("_next_us").isNull().alias("is_current"),
        )
    )


def scd2_history_sql(
    key: str = "user_id",
    attr: str = "event_type",
    seq: str = "event_id",
) -> str:
    """DuckDB twin of :func:`scd2_history` over the events table."""
    return f"""
WITH e AS (
  SELECT {key}, {attr} AS status, epoch_us(ts) AS ts_us, {seq} AS sq
  FROM events
),
ord AS (
  SELECT *, LAG(status) OVER (PARTITION BY {key} ORDER BY ts_us, sq)
            AS prev
  FROM e
),
chg AS (SELECT {key}, status, ts_us, sq FROM ord
        WHERE prev IS NULL OR prev <> status)
SELECT {key}, status, ts_us AS valid_from_us,
       LEAD(ts_us) OVER (PARTITION BY {key} ORDER BY ts_us, sq)
         AS valid_to_us,
       LEAD(ts_us) OVER (PARTITION BY {key} ORDER BY ts_us, sq) IS NULL
         AS is_current
FROM chg
"""


def supervised_daily_examples(
    events: DataFrame, lookback: int = 7, ts_col: str = "ts"
) -> DataFrame:
    """Per-(user, day) supervised training examples for next-day
    activity forecasting: DataFrame[user_id, day, cnt_today, cnt_7d,
    label_next] — today's event count, the trailing ``lookback``-day
    count (gap-safe RANGE frame), and tomorrow's count as the label.
    The feature-engineering-at-scale query a forecasting pipeline
    exports as training data; every value is an exact integer.

    The example grid is each user's DENSE day span (min..max active
    day, zero-filled): silent days are real training rows — a model
    that never sees zeros can't predict them. Grid rows = users ×
    span, a deliberate densification the caller controls via the data
    horizon; the explode is per-user and the windows are per-user
    (partitioned, never global). The last day of each span emits no
    row (its label is outside the data — withheld, not fabricated).
    """
    day = event_day(events, ts_col)
    daily = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            day.alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        "d1",
    )
    grid = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "d1",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias(
            "cnt_today"
        ),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-(lookback - 1), 0)
    )
    wl = Window.partitionBy("user_id").orderBy("day")
    return (
        grid.select(
            "user_id",
            "day",
            "d1",
            "cnt_today",
            F.sum("cnt_today").over(wr).cast("long").alias("cnt_7d"),
            F.lead("cnt_today").over(wl).alias("label_next"),
        )
        .where(F.col("day") < F.col("d1"))
        .select(
            "user_id", "day", "cnt_today", "cnt_7d",
            F.col("label_next").cast("long").alias("label_next"),
        )
    )


def supervised_daily_examples_sql(lookback: int = 7) -> str:
    """DuckDB twin of :func:`supervised_daily_examples`."""
    return f"""
WITH daily AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
  FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(d0, d1)) AS day, d1
  FROM spans
),
grid AS (
  SELECT s.user_id, s.day, s.d1,
         CAST(COALESCE(d.cnt, 0) AS BIGINT) AS cnt_today
  FROM spine s LEFT JOIN daily d
    ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, day, cnt_today,
       CAST(SUM(cnt_today) OVER (
         PARTITION BY user_id ORDER BY day
         RANGE BETWEEN {lookback - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cnt_7d,
       CAST(LEAD(cnt_today) OVER (
         PARTITION BY user_id ORDER BY day
       ) AS BIGINT) AS label_next
FROM grid
QUALIFY day < d1
"""


def wow_growth(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Week-over-week volume growth per event type:
    DataFrame[event_type, week, n_events, prev_week_events,
    growth_permille] — growth is the exact integer
    ``(n·1000) div prev`` ratio against the PREVIOUS CALENDAR week
    (lag over the per-type week series; a silent week breaks the
    chain, and chain-break rows are OMITTED — a type that
    vanished for a month never shows a flattering ratio against
    its last active week).
    The monitoring companion of w13's spike detector: spikes flag
    days against a trailing mean, this reports the weekly trend a
    human reads. Per-type windows only; weeks are epoch-based
    (epoch_us div (7·86400·10^6)), the cross-engine convention."""
    us = event_time_us(events, ts_col)
    wk_us = F.lit(7 * 86_400_000_000)
    wk = F.call_function("div", us - F.pmod(us, wk_us), wk_us)
    weekly = (
        events.select(F.col("event_type"), wk.alias("week"))
        .groupBy("event_type", "week")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.when(
        F.lag("week").over(w) == F.col("week") - 1,
        F.lag("n_events").over(w),
    )
    staged = weekly.select(
        "event_type",
        "week",
        "n_events",
        prev.alias("prev_week_events"),
    )
    return staged.where(F.col("prev_week_events").isNotNull()).select(
        "event_type",
        "week",
        "n_events",
        "prev_week_events",
        F.expr(
            "CAST(n_events * 1000 AS BIGINT) div prev_week_events"
        ).alias("growth_permille"),
    )


def wow_growth_sql() -> str:
    """DuckDB twin of :func:`wow_growth`."""
    return """
WITH weekly AS (
  SELECT event_type,
         CAST((epoch_us(ts) - ((epoch_us(ts) % 604800000000) + 604800000000) % 604800000000) // 604800000000 AS BIGINT) AS week,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
staged AS (
  SELECT event_type, week, n_events,
         CASE WHEN LAG(week) OVER w = week - 1
              THEN LAG(n_events) OVER w END AS prev_week_events
  FROM weekly
  WINDOW w AS (PARTITION BY event_type ORDER BY week)
)
SELECT event_type, week, n_events, prev_week_events,
       CAST(n_events * 1000 AS BIGINT) // prev_week_events
         AS growth_permille
FROM staged WHERE prev_week_events IS NOT NULL
"""


def _dense_daily(
    events: DataFrame, ts_col: str, key_col: str
) -> DataFrame:
    """Zero-filled dense daily counts per key: DataFrame[key, day,
    n_events] with one row for EVERY calendar day between a key's
    first and last observed day (the :func:`gapfill_locf` spine,
    zero-fill instead of LOCF — lag arithmetic needs a uniform grid,
    not carried values)."""
    day = event_day(events, ts_col)
    daily = (
        events.select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "key",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    return spine.join(daily, ["key", "day"], "left").select(
        "key",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


_DENSE_DAILY_SQL = """
daily AS (
  SELECT event_type AS key, (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT key, UNNEST(generate_series(MIN(day), MAX(day))) AS day
  FROM daily GROUP BY key
),
dense AS (
  SELECT s.key, s.day,
         CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN daily d USING (key, day)
)"""


def ewma_daily(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: int = 8,
) -> DataFrame:
    """Truncated α=½ exponential smoothing of the per-key daily count
    series: DataFrame[event_type, day, n_events, ewma_milli,
    ratio_milli] — the seasonal-blind trend line a monitoring pipeline
    draws, with today's count as a milli ratio against it.

    Integer-exact exponential weights: over the last ``window`` days
    (dense zero-filled grid — :func:`_dense_daily` — so a silent day
    PULLS THE TREND DOWN instead of being skipped), lag j carries
    weight 2^(window−1−j), i.e. exactly the (1/2)^j decay truncated at
    ``window`` lags; the head of each series divides by the weights
    actually available, so day 0 is its own EWMA rather than a zero
    artifact.

        ewma_milli = (1000 · Σ_j 2^(w−1−j)·x_{t−j})
                       div (Σ_j available 2^(w−1−j))
        ratio_milli = (1_000_000 · x_t) div ewma_milli   (0 when flat)

    Plan: one corpus-sized (key, day) count, an n_keys-row min/max +
    sequence explode, then ``window`` LAGs over the tiny daily grid —
    all per-key partitioned windows, never a single-partition one.
    """
    dense = _dense_daily(events, ts_col, key_col)
    wk = Window.partitionBy("key").orderBy("day")
    num = None
    den = None
    for j in range(window):
        wgt = 1 << (window - 1 - j)
        xj = F.lag("n_events", j).over(wk)
        term = F.when(xj.isNotNull(), xj * wgt).otherwise(F.lit(0))
        avail = F.when(xj.isNotNull(), F.lit(wgt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    out = dense.select(
        F.col("key").alias(key_col),
        "day",
        "n_events",
        (F.lit(1000) * num).alias("_num"),
        den.alias("_den"),
    ).select(
        key_col,
        "day",
        "n_events",
        F.expr("_num div _den").alias("ewma_milli"),
        F.expr(
            "CASE WHEN _num div _den > 0 THEN "
            "(1000000 * n_events) div (_num div _den) ELSE 0 END"
        ).alias("ratio_milli"),
    )
    return out


def ewma_daily_sql(window: int = 8) -> str:
    """DuckDB twin of :func:`ewma_daily` — same dense grid, same
    power-of-two weights, same head normalization and floors."""
    num_terms = " + ".join(
        f"COALESCE(LAG(n_events, {j}) OVER w * {1 << (window - 1 - j)}, 0)"
        for j in range(window)
    )
    den_terms = " + ".join(
        f"(CASE WHEN LAG(n_events, {j}) OVER w IS NULL THEN 0 "
        f"ELSE {1 << (window - 1 - j)} END)"
        for j in range(window)
    )
    return f"""
WITH {_DENSE_DAILY_SQL},
sm AS (
  SELECT key, day, n_events,
         (1000 * ({num_terms})) AS num, ({den_terms}) AS den
  FROM dense
  WINDOW w AS (PARTITION BY key ORDER BY day)
)
SELECT key AS event_type, day, n_events,
       CAST(num // den AS BIGINT) AS ewma_milli,
       CAST(CASE WHEN num // den > 0
            THEN (1000000 * n_events) // (num // den)
            ELSE 0 END AS BIGINT) AS ratio_milli
FROM sm
"""


def acf_daily(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    max_lag: int = 7,
) -> DataFrame:
    """Exact lag-k autocorrelation of the per-key daily count series:
    DataFrame[event_type, lag, n_pairs, acf_milli] for lags 1..max_lag
    — the weekly-seasonality fingerprint (a lag-7 spike on a business
    metric) computed without a single float.

    Integer-exact centering: with n days and S = Σx, the n-scaled
    residual x'_t = n·x_t − S is an integer, and

        acf_milli = (1000 · Σ_t x'_t · x'_{t+k}) div (Σ_t x'²_t)

    equals ⌊1000·ACF_k⌋ with truncation toward zero on both engines
    (Spark div / DuckDB //). Denominator-zero keys (constant series,
    ACF undefined) are dropped. Bound: n·(n·max|x|)² < 2^63 — at a
    million days of million-count magnitudes shard the series first.

    Plan: one corpus-sized (key, day) count; the residual table and
    the lag join (dense grid against itself shifted k days, k from a
    max_lag-row literal explode) touch only n_keys × n_days rows.
    """
    dense = _dense_daily(events, ts_col, key_col)
    stats = dense.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_events").cast("long").alias("s"),
    )
    resid = dense.join(F.broadcast(stats), "key").select(
        "key",
        "day",
        (F.col("n") * F.col("n_events") - F.col("s")).alias("r"),
    )
    denom = resid.groupBy("key").agg(
        F.sum(F.col("r") * F.col("r")).cast("long").alias("den")
    )
    lags = resid.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    shifted = resid.select(
        F.col("key").alias("key2"),
        F.col("day").alias("day2"),
        F.col("r").alias("r2"),
    )
    pairs = (
        resid.crossJoin(F.broadcast(lags))
        .join(
            shifted,
            (F.col("day") + F.col("lag") == F.col("day2"))
            & (F.col("key") == F.col("key2")),
        )
        .select("key", "lag", (F.col("r") * F.col("r2")).alias("p"))
    )
    return (
        pairs.groupBy("key", "lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("p").cast("long").alias("num"),
        )
        .join(F.broadcast(denom), "key")
        .where(F.col("den") > 0)
        .select(
            F.col("key").alias(key_col),
            "lag",
            "n_pairs",
            F.expr("(1000 * num) div den").alias("acf_milli"),
        )
    )


def acf_daily_sql(max_lag: int = 7) -> str:
    """DuckDB twin of :func:`acf_daily` — identical n-scaled integer
    residuals, identical truncating division."""
    return f"""
WITH {_DENSE_DAILY_SQL},
st AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_events) AS BIGINT) AS s
  FROM dense GROUP BY key
),
resid AS (
  SELECT d.key, d.day, d.n_events * st.n - st.s AS r
  FROM dense d JOIN st USING (key)
),
den AS (
  SELECT key, CAST(SUM(r * r) AS BIGINT) AS den FROM resid GROUP BY key
),
lags AS (SELECT UNNEST(generate_series(1, {max_lag})) AS lag),
pairs AS (
  SELECT a.key, l.lag, a.r * b.r AS p
  FROM resid a CROSS JOIN lags l
  JOIN resid b ON b.key = a.key AND b.day = a.day + l.lag
)
SELECT p.key AS event_type, p.lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST((1000 * SUM(p.p)) // MAX(d.den) AS BIGINT) AS acf_milli
FROM pairs p JOIN den d USING (key)
WHERE d.den > 0
GROUP BY p.key, p.lag
"""
