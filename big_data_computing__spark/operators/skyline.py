"""Skyline (Pareto-dominance) operators.

A row dominates another when it is <= on every skyline dimension and
strictly < on at least one (dimensions are MINIMIZED; flip a column's
sign to maximize it). The skyline is the set of non-dominated rows —
the classic multi-criteria "best offers" operator (Borzsony, Kossmann,
Stocker, ICDE'01) that the reference's relational surface has no direct
equivalent for; it extends the engine's top-k family (relational.top_k)
from one total order to a dominance partial order.

Two plans, both exact:

- :func:`skyline_2d` — fully declarative. In two dimensions a row is
  in the skyline iff its y is the minimum within its x AND strictly
  below every y at a smaller x, so the operator is a per-x window min
  plus an EXCLUSIVE global prefix min over x order — the two-pass
  range-partitioned idiom (relational.global_prefix_min), never a
  single-partition window, no self-join. Scales to any row count.

- :func:`skyline_nd` — d dimensions via sort-filter-skyline (SFS,
  Chomicki et al.) local passes: each partition computes its local
  skyline with a monotone-score presort (a dominating row always
  precedes the rows it dominates, so one forward pass suffices), then
  survivor unions are re-skylined through a shrinking partition
  cascade down to one. Dominance is partition-invariant, so the
  result is exact regardless of the initial split. Executor memory
  holds one partition's rows (the same contract as every pandas-kernel
  operator here); the final stage holds only the union of local
  skylines, which real workloads keep tiny (anti-correlated worst
  cases are the known skyline pathology and are documented, not
  hidden).

Duplicate rows that tie on every dimension dominate nothing and are
never dominated, so all copies are kept — both plans and the SQL twin
(:func:`skyline_sql`) agree on that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import global_prefix_min


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Exact 2-D skyline (minimize both columns), all input columns kept.

    Plan: (1) per-x window min keeps only rows achieving their x-group's
    minimal y (parallel window, many groups); (2) the distinct (x, y)
    frontier candidates get an exclusive prefix min of y over ascending
    x; a candidate survives iff no smaller x reached a y <= its own;
    (3) survivors join back to re-attach payload columns and duplicate
    rows. Only frontier candidates (<= one per distinct x) enter the
    prefix pass, and the join key is the two skyline columns.
    """
    per_x_min = F.min(y_col).over(Window.partitionBy(x_col))
    cand = (
        df.withColumn("_ymin", per_x_min)
        .where(F.col(y_col) == F.col("_ymin"))
        .drop("_ymin")
    )
    dist = cand.select(x_col, y_col).distinct()
    ranked = global_prefix_min(
        dist, y_col, x_col, out_col="_pmin", n_partitions=n_partitions
    )
    survivors = ranked.where(
        F.col("_pmin").isNull() | (F.col(y_col) < F.col("_pmin"))
    ).select(x_col, y_col)
    return cand.join(survivors, on=[x_col, y_col], how="left_semi")


def _local_skyline_kernel(cols: list[str]):
    """Partition-local SFS skyline over the named (minimized) columns.

    Exactness contract: all-integer dimension sets compare in int64
    with EXACT (arbitrary-precision Python int) presort sums, so the
    SFS invariant — a dominator's sum is strictly smaller, hence it is
    visited first — holds bit-for-bit at any int64 magnitude (the old
    float64 cast let (1, 10^17) survive next to (0, 10^17): both
    coordinates rounded to the same float and the sums tied). Float
    (or mixed) dimension sets compare on the stored float64 values —
    exact for float inputs — and their sums CAN round-tie even when a
    dominance pair exists, so sum-tie groups get a pairwise backward
    re-check (transitivity makes within-group elimination sufficient:
    any dominator outside the group has a strictly smaller key and was
    already visited). Integer columns mixed with float ones inherit
    float64's 2^53 integer-exactness bound — use all-integer
    dimensions beyond that.
    """

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        all_int = all(
            pd.api.types.is_integer_dtype(pdf[c].dtype) for c in cols
        )
        if all_int:
            vals = pdf[cols].to_numpy(dtype="int64")
            # object dtype => Python-int sums: exact, no int64 overflow
            sums = vals.astype(object).sum(axis=1)
        else:
            vals = pdf[cols].to_numpy(dtype="float64")
            sums = vals.sum(axis=1)
        order = np.argsort(sums, kind="stable")
        kept_idx: list[int] = []
        kept = np.empty((0, vals.shape[1]), dtype=vals.dtype)
        for i in order:
            row = vals[i]
            if kept_idx:
                le = (kept <= row).all(axis=1)
                lt = (kept < row).any(axis=1)
                if bool((le & lt).any()):
                    continue
            kept_idx.append(int(i))
            kept = np.vstack([kept, row[None, :]])
        if not all_int:
            # float sums round: a dominator can share its dominatee's
            # sort key, arrive second, and leave the dominatee kept —
            # re-check each sum-tie group pairwise (groups are tiny)
            by_key: dict = {}
            for pos, i in enumerate(kept_idx):
                by_key.setdefault(float(sums[i]), []).append(pos)
            dominated: set = set()
            for group in by_key.values():
                if len(group) < 2:
                    continue
                for a in group:
                    for b in group:
                        if a == b or b in dominated:
                            continue
                        le = bool((kept[b] <= kept[a]).all())
                        lt = bool((kept[b] < kept[a]).any())
                        if le and lt:
                            dominated.add(a)
                            break
            if dominated:
                kept_idx = [
                    i
                    for pos, i in enumerate(kept_idx)
                    if pos not in dominated
                ]
        yield pdf.iloc[sorted(kept_idx)]

    return _kernel


def skyline_nd(
    df: DataFrame,
    cols: list[str],
    cascade: tuple[int, ...] = (8, 1),
) -> DataFrame:
    """Exact d-dimensional skyline (minimize every column in ``cols``),
    all input columns kept.

    Local SFS skylines per partition, then each ``cascade`` stage
    repartitions the surviving union and re-skylines, ending at one
    partition so cross-partition dominance is fully resolved. Any row
    dominated globally is dominated inside SOME stage's partition once
    its dominator co-locates — the cascade guarantees co-location by
    the final single partition, and survivors only ever shrink.
    """
    if not cols:
        raise ValueError("skyline needs at least one dimension column")
    kernel = _local_skyline_kernel(list(cols))
    cur = df.mapInPandas(kernel, schema=df.schema)
    for width in cascade:
        cur = cur.repartition(width).mapInPandas(kernel, schema=df.schema)
    return cur


def skyline_sql(
    rel_sql: str,
    minimize: list[str],
    maximize: list[str] | None = None,
    out_cols: list[str] | None = None,
) -> str:
    """ANSI-SQL NOT EXISTS twin of the skyline contract (DuckDB oracle)."""
    maximize = maximize or []
    dims = [(c, "<=", "<") for c in minimize] + [
        (c, ">=", ">") for c in maximize
    ]
    weak = " AND ".join(f"o.{c} {op} t.{c}" for c, op, _ in dims)
    strict = " OR ".join(f"o.{c} {op} t.{c}" for c, _, op in dims)
    cols = ", ".join(out_cols) if out_cols else "*"
    return (
        f"WITH rel AS ({rel_sql}) SELECT {cols} FROM rel t "
        f"WHERE NOT EXISTS (SELECT 1 FROM rel o "
        f"WHERE {weak} AND ({strict}))"
    )
