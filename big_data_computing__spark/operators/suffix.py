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
— every step is a relational operation (shifted self-join + distinct +
the engine's two-pass global_rank), so the whole construction is
O(log n) rounds of joins/aggregations over (pos, rank) rows with NO
single-partition window and NO driver-side text. 100 TB shape: the
corpus string never exists in one place — characters carry global
positions computed with the distributed prefix sum; each round
shuffles exactly n small rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import global_dense_rank, global_prefix_sum, global_rank

CORPUS_SEP = "#"  # never appears in the fixtures' [a-z ] text


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
    lens = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.col(text_col), F.lit(sep)).alias("t"),
    ).withColumn("w", F.length("t"))
    off = global_prefix_sum(lens, "w", "doc_id", out_col="off")
    return off.select(
        F.posexplode(
            F.expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))")
        ).alias("i", "ch"),
        "off",
    ).select((F.col("off") + F.col("i")).cast("long").alias("pos"), "ch")


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

    Prefix doubling: ranks start as the dense rank of the character;
    round k re-ranks each position by the pair
    (rank[pos], rank[pos + 2^k] or 0) — a shifted equi-join, a
    distinct, the two-pass global_rank over the ≤ n distinct pairs,
    and a join back — doubling the compared prefix each round, so
    ⌈log₂ n⌉ rounds total, each a constant number of n-row shuffles.
    ``localCheckpoint`` per round (iterative-loop rule); raises on an
    exhausted round budget rather than returning partial ranks.
    Equivalence to a sequential sorted-suffixes reference is pinned in
    tests (including repetitive strings where doubling does real
    work); the registered query (x_suffix_array_sample) carries a
    computed DuckDB twin that sorts the suffixes directly."""
    chars = corpus_chars(docs, text_col, sep)
    ch_rank = global_rank(
        chars.select("ch").distinct(), "ch", rank_col="r"
    )
    state = (
        chars.join(ch_rank, "ch")
        .select("pos", F.col("r").cast("long").alias("rank"))
        .localCheckpoint()
    )
    n = state.count()
    k = 1
    for _ in range(max_rounds):
        n_ranks = state.agg(
            F.countDistinct("rank").alias("d")
        ).collect()[0]["d"]
        if n_ranks == n:
            return state.select("rank", "pos")
        shifted = state.select(
            (F.col("pos") - F.lit(k)).alias("pos"),
            F.col("rank").alias("rank2"),
        )
        pairs = (
            state.join(shifted, "pos", "left")
            .select(
                "pos",
                "rank",
                F.coalesce("rank2", F.lit(0)).cast("long").alias("rank2"),
            )
        )
        # dense re-rank of the pairs IN PLACE (equal pairs share the
        # new rank) — global_dense_rank saves the distinct + join-back
        # pair of shuffles every round
        state = (
            global_dense_rank(pairs, "rank", "rank2", rank_col="nr")
            .select("pos", F.col("nr").cast("long").alias("rank"))
            .localCheckpoint()
        )
        k *= 2
    raise RuntimeError(
        f"suffix_array did not converge in {max_rounds} doubling rounds"
    )


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
