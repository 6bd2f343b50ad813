"""Distributed suffix-array construction by prefix doubling
(Manber & Myers 1990) — the index structure behind exact-substring
deduplication at corpus scale (Lee et al. 2022 build suffix arrays of
the whole training set to find long verbatim repeats; the engine's
dup_spans operator is the hash-based variant of the same signal).

Not in the reference (whose only string op is ``"x,y".split(',')`` —
big_data_computing_2.py:10-12); this is a training-data-pipeline
extension, and the canonical example of an algorithm whose SEQUENTIAL
form (O(n) SA-IS) does not distribute: the Spark-first shape is the
doubling recurrence, where round k sorts (rank[i], rank[i+2^k]) pairs
— every step is a relational operation (a shifted self-join + the
engine's two-pass global_bucket_rank), so the whole construction is
O(log n) rounds of joins/aggregations over (pos, rank) rows with NO
single-partition window and NO driver-side text. Plus the two
measured accelerations (STRESS.md): an 8-char warm start (skips the
all-tied heaviest rounds) and Larsson-Sadakane tied-only refinement
(late rounds touch only the duplicate remnant). 100 TB shape: the
corpus string never exists in one place — characters carry global
positions computed with the distributed prefix sum; a full round
shuffles n small rows, a refinement round only the still-tied ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from .relational import global_bucket_rank, global_prefix_sum

#: tied-only refinement kicks in once the tied fraction drops below
#: this: early rounds (huge tied groups) use the skew-safe range-
#: partitioned full re-rank; late rounds touch only the remaining
#: tied rows (Larsson-Sadakane), whose groups are small enough for a
#: per-group window
TIED_FRACTION_SWITCH = 3  # tied-only when n_tied < n // SWITCH

CORPUS_SEP = "#"  # never appears in the fixtures' [a-z ] text


def _docs_with_offsets(
    docs: DataFrame, text_col: str, sep: str
) -> DataFrame:
    """(doc_id, t, w, off): each document's sep-terminated text, its
    length, and its global start offset from the two-pass distributed
    prefix sum — the shared front-end of the corpus-as-one-string
    views below."""
    lens = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.col(text_col), F.lit(sep)).alias("t"),
    ).withColumn("w", F.length("t"))
    return global_prefix_sum(lens, "w", "doc_id", out_col="off")


def corpus_chars(
    docs: DataFrame, text_col: str = "text", sep: str = CORPUS_SEP
) -> DataFrame:
    """The corpus as one virtual string: DataFrame[pos, ch] with
    ``pos`` the 0-based GLOBAL character position in
    ``concat(doc_1 + sep, doc_2 + sep, ...)`` ordered by doc_id.

    The string is never materialized anywhere: per-document offsets
    come from the engine's two-pass distributed prefix sum over
    (len + 1), and characters explode per document with
    pos = offset + local index. One narrow explode + one tiny
    prefix-sum pass at any corpus size."""
    off = _docs_with_offsets(docs, text_col, sep)
    return off.select(
        F.posexplode(
            F.expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))")
        ).alias("i", "ch"),
        "off",
    ).select((F.col("off") + F.col("i")).cast("long").alias("pos"), "ch")


def corpus_char_windows(
    docs: DataFrame,
    width: int,
    text_col: str = "text",
    sep: str = CORPUS_SEP,
) -> DataFrame:
    """Fixed-width character windows of the virtual corpus string:
    DataFrame[pos, key] where ``key`` = the ``width`` characters
    starting at global position ``pos`` (shorter at the corpus end —
    and string comparison then orders exactly like suffix order, a
    proper prefix sorting first).

    Windows that cross a document boundary are completed by joining
    each document to its successor VIA THE PREFIX-SUM OFFSETS
    (successor = the doc whose off equals off + w — doc_ids may be
    sparse after a filter, so arithmetic on doc_id would be wrong) and
    extending the text by the successor's first ``width − 1``
    characters. Raises if any successor is too short to complete its
    predecessor's windows while not being the corpus-final document
    (window would need a THIRD document — pick a smaller width).

    This is the classic doubling warm start: ranking by ``width``-char
    keys up front skips the ⌈log₂ width⌉ heaviest (all-tied) rounds.
    """
    off = _docs_with_offsets(docs, text_col, sep)
    nxt = off.select(
        F.col("off").alias("noff"),
        F.substring("t", 1, width - 1).alias("npref"),
        F.col("w").alias("nw"),
    )
    ext = off.join(
        nxt, F.col("off") + F.col("w") == F.col("noff"), "left"
    )
    last_off = off.agg(F.max("off").alias("m")).collect()[0]["m"]
    n_bad = ext.where(
        F.col("npref").isNotNull()
        & (F.col("nw") < width - 1)
        & (F.col("noff") != last_off)
    ).count()
    if n_bad:
        raise ValueError(
            f"corpus_char_windows: {n_bad} document(s) shorter than "
            f"width-1={width - 1} chars sit between longer ones — "
            "windows would span a third document; use a smaller width"
        )
    return ext.select(
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(t)), i -> "
                f"substring(concat(t, coalesce(npref, '')), i, {width}))"
            )
        ).alias("i", "key"),
        "off",
    ).select((F.col("off") + F.col("i")).cast("long").alias("pos"), "key")


#: doubling warm-start width: rank by INIT_WIDTH-char windows up
#: front, skipping the ⌈log₂ w⌉ heaviest all-tied rounds (the
#: measured sf0.1 trace stays ≥98% tied through length-8 prefixes)
INIT_WIDTH = 8


def _doubling_levels(
    docs: DataFrame,
    text_col: str,
    sep: str,
    max_rounds: int,
    keep_levels: bool,
):
    """The shared prefix-doubling engine: returns (final_state, n,
    tables) with RANK (bucket-start) semantics — rank = 1 + count of
    strictly-smaller suffixes, so a tied group's ranks occupy the
    gap-free interval [start, start+size) and converged ranks ARE the
    1..n permutation.

    Two round shapes, switched by the measured tied volume:

    - full re-rank (``global_bucket_rank`` over (rank, rank2)) while
      most rows are still tied — range partitioning keeps the huge
      early groups skew-safe;
    - tied-only refinement (Larsson & Sadakane 1999) once ties are the
      minority: rows whose rank is already unique are FINAL (their
      group can never split again), so the round touches only tied
      rows — new_rank = group_start + RANK()-1 within the group by
      rank2, a per-group window over the tied minority, with the
      rank2 lookup semi-filtered to exactly the |tied| needed
      positions. Per-round cost falls from O(n) shuffled rows to
      O(tied), which is what turns the long tail of a repetitive
      corpus (duplicate documents tie deep) from 19 full re-ranks
      into a few full rounds + cheap refinements.

    ``keep_levels`` retains every level's merged (pos, rank) table for
    the LCP ladder. Stale ranks of already-unique rows stay CORRECT
    for the ladder's equality tests: a unique rank equals nothing
    else (the interval invariant above guarantees refined groups can
    never collide into it), and unique rows' prefixes genuinely
    differ from every other suffix at every longer length.

    Warm start: ranks initialize from ``INIT_WIDTH``-char window keys
    (:func:`corpus_char_windows`), so the loop begins at k=INIT_WIDTH
    — the skipped rounds are exactly the all-tied heaviest ones. The
    LCP ladder fills the missing sub-INIT_WIDTH levels with window
    KEYS directly (string equality == rank equality at those
    lengths).
    """
    width = INIT_WIDTH
    while True:
        try:
            windows = corpus_char_windows(docs, width, text_col, sep)
            break
        except ValueError:
            # documents too short for this window — halve (width 1
            # needs no continuation, so this always terminates)
            width //= 2
    if keep_levels:
        # pin the window keys: the LCP ladder derives its
        # sub-init-width levels from substrings of these (lazy — the
        # range sampler of the initial ranking materializes it)
        windows = windows.localCheckpoint(eager=False)
    ranked = global_bucket_rank(windows, "key", rank_col="r")
    # LAZY checkpoint + count-as-materializer: one job where the r9
    # shape paid an eager-checkpoint job plus a count job; same
    # pattern per round below, where the tied-volume aggregate is the
    # materializing action (r10 round-overhead fix, guide §1.2)
    state = ranked.select(
        "pos", F.col("r").cast("long").alias("rank")
    ).localCheckpoint(eager=False)
    n = state.count()
    tables = [(width, state)] if keep_levels else []
    k = width

    def _tied_volume(st: DataFrame) -> int:
        # tied volume straight off the group counts — the r9 form
        # re-joined tied_ranks against grp to sum the same counts.
        # This aggregate is also the action that materializes the
        # lazily-checkpointed round chain behind `st`.
        grp = st.groupBy("rank").agg(F.count("*").alias("c"))
        return (
            grp.where(F.col("c") > 1)
            .agg(F.sum("c").alias("s"))
            .collect()[0]["s"]
        ) or 0

    def _tied_round(st: DataFrame, kk: int) -> DataFrame:
        grp = st.groupBy("rank").agg(F.count("*").alias("c"))
        tr = F.broadcast(grp.where(F.col("c") > 1).select("rank"))
        tied = st.join(tr, "rank")
        need = F.broadcast(
            tied.select((F.col("pos") + F.lit(kk)).alias("pos"))
        )
        lookup = st.join(need, "pos", "left_semi").select(
            (F.col("pos") - F.lit(kk)).alias("pos"),
            F.col("rank").alias("rank2"),
        )
        t2 = tied.join(lookup, "pos", "left").select(
            "pos",
            "rank",
            F.coalesce("rank2", F.lit(0)).cast("long").alias("rank2"),
        )
        w = Window.partitionBy("rank").orderBy("rank2")
        updated = t2.select(
            "pos",
            (F.col("rank") + F.rank().over(w) - 1)
            .cast("long")
            .alias("rank"),
        )
        untouched = st.join(tr, "rank", "left_anti")
        return untouched.unionByName(updated).localCheckpoint(
            eager=False
        )

    # r11 (guide §1.2): once the loop enters TIED-ONLY refinement it
    # never leaves (ranks only split, so the tied volume is monotone
    # non-increasing), and a tied-only round over zero ties is a no-op
    # (updated empty, untouched = state) — so tied-only rounds chain
    # lazily in windows with ONE materializing tied-volume aggregate
    # per boundary. The full-re-rank phase keeps per-round aggregates
    # (global_bucket_rank's range sampler is an eager driver action
    # anyway), and keep_levels keeps per-round windows of ONE so the
    # LCP ladder never acquires post-convergence duplicate levels.
    unroll = 1 if keep_levels else 4
    rounds_done = 0
    n_tied = _tied_volume(state)
    while rounds_done < max_rounds:
        if n_tied == 0:
            return state, n, tables, windows
        if n_tied >= n // TIED_FRACTION_SWITCH:
            shifted = state.select(
                (F.col("pos") - F.lit(k)).alias("pos"),
                F.col("rank").alias("rank2"),
            )
            pairs = state.join(shifted, "pos", "left").select(
                "pos",
                "rank",
                F.coalesce("rank2", F.lit(0))
                .cast("long")
                .alias("rank2"),
            )
            state = (
                global_bucket_rank(
                    pairs, "rank", "rank2", rank_col="nr"
                )
                .select("pos", F.col("nr").cast("long").alias("rank"))
                .localCheckpoint(eager=False)
            )
            k *= 2
            rounds_done += 1
            if keep_levels:
                tables.append((k, state))
        else:
            for _ in range(min(unroll, max_rounds - rounds_done)):
                state = _tied_round(state, k)
                k *= 2
                rounds_done += 1
                if keep_levels:
                    tables.append((k, state))
        n_tied = _tied_volume(state)
    if n_tied == 0:
        return state, n, tables, windows
    raise RuntimeError(
        f"prefix doubling did not converge in {max_rounds} rounds"
    )


def suffix_array(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = CORPUS_SEP,
    max_rounds: int = 48,
) -> DataFrame:
    """Suffix array of the corpus string: DataFrame[rank, pos] —
    ``rank`` is the 1-based lexicographic rank of the suffix starting
    at global position ``pos`` (ranks are a permutation; shorter
    suffixes that prefix longer ones sort first, the standard
    sentinel-free convention via rank2 = 0 padding).

    Prefix doubling with RANK (bucket-start) semantics and tied-only
    refinement — see :func:`_doubling_levels` for the round shapes and
    why converged ranks are exactly the 1..n permutation.
    ``localCheckpoint`` per round (iterative-loop rule); raises on an
    exhausted round budget rather than returning partial ranks.
    Equivalence to a sequential sorted-suffixes reference is pinned in
    tests (including repetitive strings where doubling does real
    work); the registered query (x_suffix_array_sample) carries a
    computed DuckDB twin that sorts the suffixes directly."""
    state, _n, _, _w = _doubling_levels(
        docs, text_col, sep, max_rounds, keep_levels=False
    )
    return state.select("rank", "pos")


def suffix_array_sample_sql(
    doc_filter: str, sample_mod: int = 97, key_len: int = 4096
) -> str:
    """DuckDB twin of the sampled suffix-array query: concatenates the
    same corpus string (string_agg ordered by doc_id) and sorts the
    suffixes DIRECTLY — an algorithm-independent oracle for the
    doubling construction. ``key_len`` caps the sort key; sound
    whenever the corpus's maximum LCP is below it (the fixtures'
    longest repeat is one duplicated document, ≤ 553 chars at sf0.01 —
    margin ~7×; a tie under a too-short key would produce a
    nondeterministic order and fail the hash loudly, never silently)."""
    return f"""
WITH s AS (
  SELECT string_agg(text || '{CORPUS_SEP}', '' ORDER BY doc_id) AS doc
  FROM documents WHERE {doc_filter}
),
p AS (
  SELECT doc,
         CAST(unnest(range(1, length(doc) + 1)) AS BIGINT) AS pos1
  FROM s
),
r AS (
  SELECT pos1,
         row_number() OVER (
           ORDER BY substr(doc, CAST(pos1 AS INT), {key_len})
         ) AS rank
  FROM p
)
SELECT CAST(rank AS BIGINT) AS rank,
       CAST(pos1 - 1 AS BIGINT) AS pos
FROM r WHERE rank % {sample_mod} = 1
"""


def _suffix_tables(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = CORPUS_SEP,
    max_rounds: int = 48,
):
    """Prefix-doubling construction keeping every level's rank table:
    returns (final_state[pos, rank], n, [(L, table[pos, rank]), ...])
    where table L ranks positions by their length-L prefix — the
    sparse-table ladder :func:`adjacent_lcp` walks. Same engine as
    :func:`suffix_array` (:func:`_doubling_levels`); the ladder's
    equality tests stay valid under tied-only refinement because a
    unique rank can never be collided into (interval invariant).
    Returns (final_state, n, tables, windows) — ``windows`` is the
    checkpointed init-width key table the ladder derives its
    sub-init-width levels from."""
    return _doubling_levels(docs, text_col, sep, max_rounds, True)


def adjacent_lcp(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = CORPUS_SEP,
) -> DataFrame:
    """Longest-common-prefix of every ADJACENT suffix pair in the
    suffix array: DataFrame[rank, pos_a, pos_b, lcp] — rank r pairs
    the r-th and (r+1)-th suffixes. Adjacent LCPs are the whole LCP
    array (any two suffixes' LCP is the min over the ranks between
    them), and the array's maxima ARE the longest duplicated
    substrings of the corpus — the signal Lee et al.'s exact-substring
    dedup thresholds at 50 tokens.

    Distribution shape: no per-pair character scanning anywhere —
    the construction's rank-table ladder (prefix lengths 2^j) is
    walked top-down: at level L a pair advances (lcp += L, both
    positions += L) iff its positions' length-L ranks agree; ⌈log n⌉
    levels, each ONE broadcast-sized state join per side against the
    level's n-row table. Total work O(n log n) rows joined — the
    sparse-table LCP bound — with per-pair work independent of how
    long the actual match is (the per-character oracle twin is
    O(Σ lcp) and only viable at validation scale)."""
    state, n, tables, windows = _suffix_tables(docs, text_col, sep)
    sa = state.select("rank", "pos")
    adj = (
        sa.alias("x")
        .join(
            sa.select(
                (F.col("rank") - 1).alias("rank"),
                F.col("pos").alias("pos_b"),
            ).alias("y"),
            "rank",
        )
        .select(
            "rank",
            F.col("pos").alias("pos_a"),
            "pos_b",
            F.lit(0).cast("long").alias("lcp"),
            F.col("pos").alias("a"),
            F.col("pos_b").alias("b"),
        )
        .localCheckpoint()
    )
    # the ladder walk has NO data-dependent control flow (the level
    # list is fixed once construction ends), so the whole descent is
    # declared as ONE Catalyst plan — 2·levels joins against the
    # already-checkpointed tables, no per-level materialization or
    # driver round-trip (the checkpointed variant measured 3× slower:
    # per-level job overhead dominated the 29k-row state)
    for L, tab in sorted(tables, key=lambda t: -t[0]):
        ta = tab.select(
            F.col("pos").alias("a"), F.col("rank").alias("ra")
        )
        tb = tab.select(
            F.col("pos").alias("b"), F.col("rank").alias("rb")
        )
        stepped = (
            adj.join(ta, "a", "left")
            .join(tb, "b", "left")
        )
        advance = (
            F.col("ra").isNotNull()
            & F.col("rb").isNotNull()
            & (F.col("ra") == F.col("rb"))
        )
        adj = stepped.select(
            "rank",
            "pos_a",
            "pos_b",
            F.when(advance, F.col("lcp") + L)
            .otherwise(F.col("lcp"))
            .alias("lcp"),
            F.when(advance, F.col("a") + L).otherwise(F.col("a")).alias("a"),
            F.when(advance, F.col("b") + L).otherwise(F.col("b")).alias("b"),
        )
    # sub-init-width levels collapsed into ONE window-key join per side
    # (r11; was 2 joins per level = 2·(log2 W) joins): every remaining
    # advance reads inside the W-char key fetched at the positions held
    # HERE — the level offsets within the sub-ladder sum to at most
    # W/2 + W/4 + … + 1 = W−1, so offset+w ≤ W−1 < W and
    # substring(key@a₀, δ+1, w) is char-identical to the per-level
    # lookup substring(key@(a₀+δ), 1, w) (both read chars
    # [a₀+δ, min(a₀+δ+w, n)); the key is truncated only by the corpus
    # end). Equality on truncated keys still implies equal remaining
    # length — i.e. the same position, which adjacent suffix pairs
    # never share — so an advance never overshoots the corpus end,
    # exactly the warm-start argument the per-level form used.
    w0 = tables[0][0]
    if w0 >= 2:
        ka = windows.select(
            F.col("pos").alias("a"), F.col("key").alias("ka")
        )
        kb = windows.select(
            F.col("pos").alias("b"), F.col("key").alias("kb")
        )
        adj = adj.join(ka, "a", "left").join(kb, "b", "left")
        lcp_col = F.col("lcp")
        off = F.lit(0)
        w = w0 // 2
        while w >= 1:
            adv = (
                F.col("ka").isNotNull()
                & F.col("kb").isNotNull()
                & (
                    F.col("ka").substr(off + F.lit(1), F.lit(w))
                    == F.col("kb").substr(off + F.lit(1), F.lit(w))
                )
            )
            lcp_col = F.when(adv, lcp_col + w).otherwise(lcp_col)
            off = F.when(adv, off + w).otherwise(off)
            w //= 2
        return adj.select("rank", "pos_a", "pos_b", lcp_col.alias("lcp"))
    return adj.select("rank", "pos_a", "pos_b", "lcp")


def adjacent_lcp_top_sql(
    doc_filter: str, k: int = 20, key_len: int = 4096
) -> str:
    """DuckDB twin of the top-k adjacent-LCP query: direct suffix
    sort, each pair's LCP computed by BINARY DESCENT over its two
    ``key_len``-char windows — log₂(key_len) substring equality tests
    per pair (if the segment [acc+1, acc+step] matches, the common
    prefix extends by step), so the oracle is O(pairs · log key_len)
    comparisons on small strings. Naive forms that scanned characters
    or cross-joined the corpus string measured 40-90 s at sf0.01;
    this runs in ~3 s. Sound for LCPs below ``key_len`` — the same
    bound, margin, and loud-failure property as the suffix-sort key
    (suffix_array_sample_sql)."""
    steps = []
    st = key_len // 2
    while st >= 1:
        steps.append(st)
        st //= 2
    inner = (
        "SELECT rank, a, b, wa, wb, CAST(0 AS BIGINT) AS acc "
        "FROM adj WHERE b IS NOT NULL"
    )
    for step in steps:
        inner = f"""SELECT rank, a, b, wa, wb,
       acc + CASE WHEN substr(wa, CAST(acc + 1 AS INT), {step})
                     = substr(wb, CAST(acc + 1 AS INT), {step})
                  THEN {step} ELSE 0 END AS acc
FROM ({inner})"""
    return f"""
WITH s AS MATERIALIZED (
  SELECT string_agg(text || '{CORPUS_SEP}', '' ORDER BY doc_id) AS doc
  FROM documents WHERE {doc_filter}
),
p AS (
  SELECT doc,
         CAST(unnest(range(1, length(doc) + 1)) AS BIGINT) AS pos1
  FROM s
),
r AS (
  SELECT pos1, substr(doc, CAST(pos1 AS INT), {key_len}) AS w,
         row_number() OVER (
           ORDER BY substr(doc, CAST(pos1 AS INT), {key_len})
         ) AS rank
  FROM p
),
adj AS (
  SELECT rank, pos1 AS a, w AS wa,
         lead(pos1) OVER (ORDER BY rank) AS b,
         lead(w) OVER (ORDER BY rank) AS wb
  FROM r
),
lcps AS ({inner})
SELECT CAST(acc AS BIGINT) AS lcp,
       CAST(a - 1 AS BIGINT) AS pos_a,
       CAST(b - 1 AS BIGINT) AS pos_b
FROM lcps
ORDER BY lcp DESC, pos_a
LIMIT {k}
"""
