"""Z-order layout + manifest min/max file pruning (sources/layout.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_computing__spark.sources import layout as L
from big_data_computing__spark.sources.readers import customer_points

N_FILES = 64
# Small square box in the middle of the fixture's coordinate space
# (customer_points: x = acctbal ∈ [-999, 9999], y = Knuth-scatter
# ∈ [0, 10000)) — the 2-D range shape p2/c6's grid predicates take.
BOX_X = (4000.0, 5000.0)
BOX_Y = (4000.0, 5000.0)


def _layouts(spark, sf_dir, tmp_path):
    pts = customer_points(spark, sf_dir)
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "lexicographic")
    L.write_zordered(pts, zpath, n_files=N_FILES, cell=200.0)
    L.write_lexicographic(pts, lpath, n_files=N_FILES)
    return pts, zpath, lpath


def test_manifest_written_and_covers_all_rows(spark, sf_dir, tmp_path):
    pts, zpath, lpath = _layouts(spark, sf_dir, tmp_path)
    n = pts.count()
    for path in (zpath, lpath):
        assert os.path.exists(os.path.join(path, L.MANIFEST_NAME))
        files, total = L.prune_files(
            path, (-1e18, 1e18), (-1e18, 1e18)
        )
        assert len(files) == total == N_FILES
        assert spark.read.parquet(path).count() == n


def test_zorder_prunes_more_files_than_lexicographic(
    spark, sf_dir, tmp_path
):
    """The point of the layout: for a 2-D box predicate the Z-order
    manifest must skip MORE files than the lexicographic one, and for a
    trailing-column (y-only) band the gap must be dramatic — lex files
    span all of y, so y stats prune almost nothing there."""
    _, zpath, lpath = _layouts(spark, sf_dir, tmp_path)
    z_files, z_total = L.prune_files(zpath, BOX_X, BOX_Y)
    l_files, l_total = L.prune_files(lpath, BOX_X, BOX_Y)
    assert z_total == l_total == N_FILES
    assert len(z_files) < len(l_files), (len(z_files), len(l_files))
    # the box is ~1/100 of the area: Z-order should read a small
    # minority of files, not just "one fewer"
    assert len(z_files) <= N_FILES // 4

    full_x = (-1e18, 1e18)
    zb, _ = L.prune_files(zpath, full_x, BOX_Y)
    lb, _ = L.prune_files(lpath, full_x, BOX_Y)
    # lex layout is blind on the trailing column: it keeps the large
    # majority of files, Z-order keeps a small minority
    assert len(zb) < len(lb)
    assert len(zb) <= N_FILES // 4 < N_FILES // 2 <= len(lb)


def test_pruned_read_is_exact(spark, sf_dir, tmp_path):
    """Pruning is an optimization, never a correctness change: the
    manifest-pruned read must return exactly the full-scan filter's
    rows, under both layouts."""
    pts, zpath, lpath = _layouts(spark, sf_dir, tmp_path)
    want = sorted(
        (r["x"], r["y"])
        for r in pts.where(
            (F.col("x").between(*BOX_X)) & (F.col("y").between(*BOX_Y))
        ).collect()
    )
    assert want, "fixture box must be non-empty for the test to bite"
    for path in (zpath, lpath):
        res, n_read, n_total = L.read_pruned(spark, path, BOX_X, BOX_Y)
        got = sorted((r["x"], r["y"]) for r in res.collect())
        assert got == want
        assert 0 < n_read <= n_total


def test_empty_box_reads_zero_files(spark, sf_dir, tmp_path):
    _, zpath, _ = _layouts(spark, sf_dir, tmp_path)
    res, n_read, _ = L.read_pruned(
        spark, zpath, (1e17, 2e17), (1e17, 2e17)
    )
    assert n_read == 0
    assert res.count() == 0
