"""Z-order write layout + per-file min/max manifest pruning.

The data-skipping story in two halves, the way Delta/Iceberg do it:

1. **Layout** (`write_zordered` / `write_lexicographic`): cluster rows
   into files by Morton key (``operators/outliers.zorder_key``) so each
   file covers a small axis-aligned box in (x, y) — what
   ``OPTIMIZE ... ZORDER BY (x, y)`` produces. A lexicographic (x, y)
   sort is the strawman: files are thin x-slabs spanning ALL of y, so
   min/max stats can prune only the leading column.
2. **Manifest** (`_file_manifest.json`, `read_pruned`): after the write,
   one narrow scan over the hidden ``_metadata.file_path`` column
   aggregates per-file min/max of the layout columns — the same stats a
   Delta transaction log / Iceberg manifest file records. A range query
   loads the manifest (tiny: one row per file, driver-side by design,
   exactly like a table format's planning step), keeps only files whose
   box intersects the predicate box, and hands Spark just those paths.
   The residual filter still applies, so pruning is purely an
   optimization — never a correctness change.

At 100 TB the manifest is the only part a driver touches (#files rows);
the stats scan is a metadata-column aggregation Spark evaluates without
reading data pages for the non-projected columns. The reference has no
write path at all (driver stdout only, big_data_computing_1.py:109-114);
this extends the engine's parquet sink the way its own queries (p2/c6's
range predicates) would want at scale.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_file_manifest.json"


def _write_manifest(
    spark: SparkSession, path: str, x: str, y: str
) -> list[dict]:
    """Scan the just-written files' metadata column and record per-file
    min/max of the layout columns. Returns the manifest entries."""
    stats = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"), x, y)
        .groupBy("file")
        .agg(
            F.min(x).alias("min_x"),
            F.max(x).alias("max_x"),
            F.min(y).alias("min_y"),
            F.max(y).alias("max_y"),
            F.count("*").alias("n_rows"),
        )
    )
    entries = [r.asDict() for r in stats.collect()]
    entries.sort(key=lambda e: e["file"])
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump({"x": x, "y": y, "files": entries}, fh, indent=1)
    return entries


def write_zordered(
    df: DataFrame,
    path: str,
    x: str = "x",
    y: str = "y",
    n_files: int = 16,
    cell: float = 1.0,
    bits: int = 20,
) -> list[dict]:
    """Write ``df`` as ``n_files`` parquet files clustered by Morton
    key of the ``cell``-quantized (x, y), plus the min/max manifest.

    repartitionByRange on the key gives contiguous, balanced key ranges
    (range partitioner samples the key distribution), so each file is a
    compact Z-curve segment ≈ a small box in both dimensions. The key
    is a transient column — dropped before the write.
    """
    from ..operators.outliers import zorder_key

    ci = F.floor(F.col(x) / cell).cast("long")
    cj = F.floor(F.col(y) / cell).cast("long")
    mins = df.agg(
        F.min(ci).alias("_mci"), F.min(cj).alias("_mcj")
    )
    keyed = df.crossJoin(F.broadcast(mins)).withColumn(
        "_zkey",
        zorder_key(ci - F.col("_mci"), cj - F.col("_mcj"), bits),
    ).drop("_mci", "_mcj")
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return _write_manifest(df.sparkSession, path, x, y)


def write_lexicographic(
    df: DataFrame,
    path: str,
    x: str = "x",
    y: str = "y",
    n_files: int = 16,
) -> list[dict]:
    """The comparison layout: files are contiguous (x, y)-lexicographic
    ranges — thin slabs in x spanning the full y extent, so y min/max
    stats are useless for pruning. Same manifest contract."""
    (
        df.repartitionByRange(n_files, x, y)
        .sortWithinPartitions(x, y)
        .write.mode("overwrite")
        .parquet(path)
    )
    return _write_manifest(df.sparkSession, path, x, y)


def prune_files(
    path: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
) -> tuple[list[str], int]:
    """Manifest planning step: (files whose stats box intersects the
    query box, total file count). Pure driver-side metadata — no data
    files are opened."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    xs, xe = x_range
    ys, ye = y_range
    keep = [
        e["file"]
        for e in manifest["files"]
        if e["max_x"] >= xs
        and e["min_x"] <= xe
        and e["max_y"] >= ys
        and e["min_y"] <= ye
    ]
    return keep, len(manifest["files"])


def read_pruned(
    spark: SparkSession,
    path: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    x: str = "x",
    y: str = "y",
) -> tuple[DataFrame, int, int]:
    """Range query through the manifest: returns (result DataFrame over
    ONLY the intersecting files with the exact residual filter applied,
    n_files_read, n_files_total). Falls back to every file listed in
    the manifest when the predicate box covers the table."""
    files, total = prune_files(path, x_range, y_range)
    if not files:
        # empty selection: preserve schema via a zero-file read of the
        # full table filtered to false
        df = spark.read.parquet(path).where(F.lit(False))
        return df, 0, total
    df = spark.read.parquet(*files)
    res = df.where(
        (F.col(x) >= x_range[0])
        & (F.col(x) <= x_range[1])
        & (F.col(y) >= y_range[0])
        & (F.col(y) <= y_range[1])
    )
    return res, len(files), total
