"""ZTable writable branches: create/open/fast-forward/delete
(sources/layout.py). Branches generalize the WAP staging flow to
arbitrary history — the tests pin isolation, the fast-forward-only
adoption rule, hardlink lifetime decoupling, the DV-over-renamed-file
refusal with its compact() escape hatch, and the unmerged-delete
guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.sources import layout as L
from big_data_computing__spark.sources.readers import customer_points

BOX_X = (4000.0, 5000.0)
BOX_Y = (0.0, 5000.0)


def _seed(spark, sf_dir, tmp_path):
    pts = customer_points(spark, sf_dir)
    base = pts.where(F.col("y") < 5000.0)
    extra = pts.where(F.col("y") >= 5000.0)
    t = L.ZTable.create(
        base, str(tmp_path / "main"), n_files=4, cell=200.0
    )
    return t, base, extra


def test_branch_create_open_list_and_isolation(
    spark, sf_dir, tmp_path
):
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    assert t.branches() == {"dev": {"fork_version": 0, "head": 0}}
    # a second create of the same name refuses
    with pytest.raises(FileExistsError):
        t.create_branch("dev")
    # the branch reads the fork snapshot
    assert br.read(spark).count() == base.count()
    # branch commits are invisible to main
    br.append(extra)
    assert t.branch("dev").read(spark).count() == base.count() + (
        extra.count()
    )
    assert t.read(spark).count() == base.count()
    assert t.latest_version() == 0
    assert t.branches()["dev"]["head"] == 1
    # the fork point is pinned against main's vacuum
    assert "clone-dev-v0" in t.tags()
    with pytest.raises(FileNotFoundError):
        t.branch("nope")


def test_fast_forward_append_and_hardlink_decoupling(
    spark, sf_dir, tmp_path
):
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    br.append(extra)
    v = t.fast_forward("dev")
    assert v == 1
    snap = t.snapshot()
    assert snap["operation"] == "fast_forward"
    assert snap["fast_forwarded_from"] == "dev"
    assert t.read(spark).count() == base.count() + extra.count()
    # adopted entries live under MAIN's directory, not the branch's
    bdir = os.path.abspath(br.path)
    assert all(
        not os.path.abspath(
            e["file"].replace("file:", "")
        ).startswith(bdir + os.sep)
        for e in snap["files"]
    )
    # merged branch deletes without force; main still reads (hardlinks)
    t.delete_branch("dev")
    assert not os.path.exists(bdir)
    assert "clone-dev-v0" not in t.tags()
    assert t.read(spark).count() == base.count() + extra.count()


def test_fast_forward_refuses_diverged_main(spark, sf_dir, tmp_path):
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    br.append(extra.limit(10))
    t.append(extra)  # main advances past the fork
    with pytest.raises(L.ConcurrentWriteConflict, match="advanced"):
        t.fast_forward("dev")


def test_fast_forward_empty_branch_is_noop(spark, sf_dir, tmp_path):
    t, _, _ = _seed(spark, sf_dir, tmp_path)
    t.create_branch("dev")
    assert t.fast_forward("dev") == 0
    assert t.latest_version() == 0


def test_fast_forward_cow_delete_and_change_feed(
    spark, sf_dir, tmp_path
):
    """Arbitrary branch history adopts: a branch COW delete lands on
    main as one commit whose change feed reports exactly the deleted
    rows."""
    t, base, _ = _seed(spark, sf_dir, tmp_path)
    n_del = base.where(
        (F.col("x") >= BOX_X[0]) & (F.col("x") <= BOX_X[1])
        & (F.col("y") >= BOX_Y[0]) & (F.col("y") <= BOX_Y[1])
    ).count()
    assert n_del > 0
    br = t.create_branch("dev")
    _, n_rewritten, _ = br.delete_where(spark, BOX_X, BOX_Y)
    assert n_rewritten > 0
    v = t.fast_forward("dev")
    assert t.read(spark).count() == base.count() - n_del
    feed = t.changes(spark, 0, v)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_type.get("delete", 0) == n_del
    assert by_type.get("insert", 0) == 0


def test_fast_forward_dv_over_inherited_files(spark, sf_dir, tmp_path):
    """A branch DV that tombstones fork-inherited (main-path) files
    adopts cleanly: the tombstone parquet is hardlinked, positions
    still resolve, reads subtract."""
    t, base, _ = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    _, n_del, _ = br.delete_where_dv(spark, BOX_X, BOX_Y)
    assert n_del > 0
    t.fast_forward("dev")
    snap = t.snapshot()
    bdir = os.path.abspath(br.path)
    assert snap.get("dvs")
    assert all(
        not os.path.abspath(p).startswith(bdir + os.sep)
        for p in snap["dvs"]
    )
    assert t.read(spark).count() == base.count() - n_del
    t.delete_branch("dev")
    assert t.read(spark).count() == base.count() - n_del


def test_fast_forward_dv_over_branch_files_refuses_then_compact(
    spark, sf_dir, tmp_path
):
    """Position tombstones cannot survive the adoption rename: a DV
    addressing a branch-WRITTEN file refuses with the compact() escape
    hatch, after which the fast-forward carries the branch state."""
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    br.append(extra)
    # the upper y band exists only in branch-written files
    _, n_del, _ = br.delete_where_dv(
        spark, (-1e18, 1e18), (5000.0, 1e18)
    )
    assert n_del > 0
    with pytest.raises(ValueError, match="compact"):
        t.fast_forward("dev")
    br = t.branch("dev")
    br.compact(spark, n_files=4)
    t.fast_forward("dev")
    want = base.count() + extra.count() - n_del
    assert t.read(spark).count() == want


def test_delete_branch_unmerged_guard(spark, sf_dir, tmp_path):
    t, _, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("dev")
    br.append(extra)
    with pytest.raises(ValueError, match="unmerged"):
        t.delete_branch("dev")
    t.delete_branch("dev", force=True)
    assert t.branches() == {}


def test_in_commit_timestamps_and_as_of_read(spark, sf_dir, tmp_path):
    """Commits carry monotone in-commit timestamps; TIMESTAMP AS OF
    resolves to the last commit at-or-before the bound and raises
    outside the stamped range."""
    import time

    t, base, extra = _seed(spark, sf_dir, tmp_path)
    ts0 = t.snapshot(0)["committed_at_us"]
    time.sleep(0.01)
    mid = int(time.time() * 1_000_000)
    time.sleep(0.01)
    t.append(extra)
    ts1 = t.snapshot(1)["committed_at_us"]
    assert ts0 < ts1  # monotone even under quick successive commits

    assert t.version_as_of(mid) == 0
    assert t.version_as_of(ts1) == 1
    assert t.read_as_of(spark, mid).count() == base.count()
    assert (
        t.read_as_of(spark, ts1 + 1).count()
        == base.count() + extra.count()
    )
    with pytest.raises(ValueError, match="at or before"):
        t.version_as_of(ts0 - 1)
    # a restore copies source metadata wholesale but must get a FRESH
    # stamp, later than every prior commit's
    t.restore(0)
    assert t.snapshot(2)["committed_at_us"] > ts1


def test_streaming_ingest_into_branch_then_fast_forward(
    spark, sf_dir, tmp_path
):
    """The WAP streaming flow on branches: exactly-once micro-batch
    appends land on a branch (main untouched), the audit reads the
    branch, and ONE fast-forward publishes the whole ingest."""
    from big_data_computing__spark.streaming.table_stream import (
        table_append_stream,
    )

    t, base, extra = _seed(spark, sf_dir, tmp_path)
    br = t.create_branch("ingest")

    data = str(tmp_path / "stream_rows")
    extra.repartition(3).write.parquet(data)
    src = (
        spark.readStream.schema(extra.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data)
    )
    q = (
        table_append_stream(
            src, br, str(tmp_path / "ingest_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert br.latest_version() > 1  # genuinely incremental batches
    assert t.latest_version() == 0  # main never saw the stream
    assert (
        t.branch("ingest").read(spark).count()
        == base.count() + extra.count()
    )
    t.fast_forward("ingest")
    assert t.read(spark).count() == base.count() + extra.count()
    t.delete_branch("ingest")
    assert t.read(spark).count() == base.count() + extra.count()


def test_analyze_histograms_and_selectivity(spark, sf_dir, tmp_path):
    """ANALYZE records per-file histograms; the estimator is exact on
    full/disjoint ranges, close on partial ranges, reports coverage
    staleness after an append, and old versions stay hist-free."""
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    n = base.count()
    v = t.analyze_histograms(spark, ["x"], bins=8)
    assert t.snapshot(v)["operation"] == "analyze"

    full, n_hist, n_total = t.estimate_range_count(
        "x", -1e18, 1e18
    )
    assert n_hist == n_total and round(full) == n
    zero, _, _ = t.estimate_range_count("x", 1e17, 1e18)
    assert zero == 0.0

    lo, hi = 2000.0, 6000.0
    exact = base.where(
        (F.col("x") >= lo) & (F.col("x") <= hi)
    ).count()
    est, _, _ = t.estimate_range_count("x", lo, hi)
    assert exact > 0
    assert 0.5 * exact <= est <= 2.0 * exact, (est, exact)

    # histograms ride their entries through an append; the new files
    # lack them and the estimator says so
    t.append(extra)
    _, n_hist2, n_total2 = t.estimate_range_count("x", -1e18, 1e18)
    assert n_hist2 == n_hist and n_total2 > n_total
    # pre-analyze version has no histograms at all
    assert all(
        "hist_x" not in e for e in t.snapshot(0)["files"]
    )
    # the change feed ignores the metadata-only analyze commit
    assert t.changes(spark, 0, v).count() == 0


def test_incremental_analyze_covers_only_new_files(
    spark, sf_dir, tmp_path
):
    """Incremental ANALYZE recomputes nothing for already-analyzed
    files, fills the gap after an append, no-ops when fresh, and
    refuses a bin-count mismatch."""
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    t.analyze_histograms(spark, ["x"], bins=8)
    old_hists = {
        e["file"]: e["hist_x"] for e in t.snapshot()["files"]
    }
    t.append(extra)
    v = t.analyze_histograms(spark, ["x"], bins=8, incremental=True)
    snap = t.snapshot(v)
    assert all("hist_x" in e for e in snap["files"])
    # carried entries keep their recorded histograms verbatim
    for e in snap["files"]:
        if e["file"] in old_hists:
            assert e["hist_x"] == old_hists[e["file"]]
    est, n_hist, n_total = t.estimate_range_count("x", -1e18, 1e18)
    assert n_hist == n_total
    assert round(est) == base.count() + extra.count()
    # fresh table: incremental is a no-op commit-wise
    assert (
        t.analyze_histograms(spark, ["x"], bins=8, incremental=True)
        == v
    )
    import pytest

    with pytest.raises(ValueError, match="re-run full"):
        t.analyze_histograms(
            spark, ["x"], bins=4, incremental=True
        )


def test_metadata_tables_files_and_history(spark, sf_dir, tmp_path):
    """files_df/history_df expose the log as queryable DataFrames with
    zero data read: file rows match the manifest, analyze flips the
    hist flag, and history rows carry the operation metrics and
    monotone timestamps."""
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    t.append(extra)
    t.analyze_histograms(spark, ["x"], bins=8)

    fdf = t.files_df(spark)
    snap = t.snapshot()
    assert fdf.count() == len(snap["files"])
    assert (
        fdf.agg(F.sum("n_rows")).collect()[0][0]
        == base.count() + extra.count()
    )
    assert fdf.where(F.array_contains("hist_cols", "x")).count() == (
        len(snap["files"])
    )
    # pre-analyze version: no hist flags
    assert (
        t.files_df(spark, version=1)
        .where(F.array_contains("hist_cols", "x"))
        .count()
        == 0
    )

    hdf = t.history_df(spark).orderBy("version").collect()
    assert [r["operation"] for r in hdf] == [
        "create", "append", "analyze",
    ]
    ts = [r["committed_at_us"] for r in hdf]
    assert ts == sorted(ts) and ts[0] > 0
    assert hdf[1]["n_rows_added"] == extra.count()
    # analyze mutates entry CONTENT only — the path-diff metrics
    # correctly report a no-op commit
    assert hdf[2]["n_files_added"] == 0
    assert hdf[2]["n_rows_removed"] == 0


def test_incremental_analyze_all_null_column_converges(
    spark, sf_dir, tmp_path
):
    """Regression (round-7 advice): a file whose analyzed column is
    entirely NULL used to stay in the incremental todo set forever —
    every maintenance tick rescanned it and committed a new identical
    version. It now records an explicit empty histogram, the next
    incremental run is a commit-free no-op, and the estimator counts
    the file as analyzed with zero matching rows."""
    t, base, extra = _seed(spark, sf_dir, tmp_path)
    nulls = extra.withColumn("x", F.lit(None).cast("double"))
    t.append(nulls)
    v = t.analyze_histograms(spark, ["x"], bins=8, incremental=True)
    snap = t.snapshot(v)
    assert all("hist_x" in e for e in snap["files"])
    empty = [
        e["hist_x"]
        for e in snap["files"]
        if e["hist_x"]["lo"] is None
    ]
    assert empty and all(sum(h["counts"]) == 0 for h in empty)
    # converged: the next tick neither rescans nor commits
    assert (
        t.analyze_histograms(spark, ["x"], bins=8, incremental=True)
        == v
    )
    # estimator: full coverage, and the all-NULL files contribute 0
    est, n_hist, n_total = t.estimate_range_count("x", -1e18, 1e18)
    assert n_hist == n_total == len(snap["files"])
    assert round(est) == base.count()


def test_detect_outliers_analyzed_gate(spark, sf_dir, tmp_path):
    """The ANALYZE-driven cost gate: mode decided from recorded
    histograms with zero data read, estimates close to truth, results
    identical to running the chosen operator directly."""
    from big_data_computing__spark.operators.outliers import (
        approx_outliers_summary,
        detect_outliers_analyzed,
        exact_outliers,
    )

    t, base, extra = _seed(spark, sf_dir, tmp_path)
    with pytest.raises(ValueError, match="analyze_histograms"):
        detect_outliers_analyzed(
            t, spark, 500.0, 3, (0.0, 1e4), (0.0, 1e4)
        )
    t.analyze_histograms(spark, ["x", "y"], bins=16)

    full_x = (-1e9, 1e9)
    full_y = (-1e9, 1e9)
    n = base.count()
    # threshold below the table size => approx side
    mode, est, df = detect_outliers_analyzed(
        t, spark, 500.0, 3, full_x, full_y, exact_threshold=n // 2
    )
    assert mode == "approx"
    assert abs(est - n) / n < 0.01  # full-range estimate is near-exact
    pts = t.read(spark).select("id", "x", "y")
    want = approx_outliers_summary(pts, 500.0, 3).collect()
    assert df.collect() == want

    # threshold above => exact side, same rows as the direct operator
    mode, est, df = detect_outliers_analyzed(
        t, spark, 500.0, 3, full_x, full_y, exact_threshold=2 * n
    )
    assert mode == "exact"
    got = sorted(tuple(r) for r in df.collect())
    wantx = sorted(
        tuple(r) for r in exact_outliers(pts, 500.0, 3).collect()
    )
    assert got == wantx

    # a selective box gates exact under a threshold the full table
    # would fail — the histogram sees the box, not the table
    xs = [r["x"] for r in base.select("x").collect()]
    ys = [r["y"] for r in base.select("y").collect()]
    xlo, xhi = min(xs), min(xs) + (max(xs) - min(xs)) * 0.2
    ylo, yhi = min(ys), min(ys) + (max(ys) - min(ys)) * 0.2
    in_box = base.where(
        (F.col("x") >= xlo) & (F.col("x") <= xhi)
        & (F.col("y") >= ylo) & (F.col("y") <= yhi)
    ).count()
    mode, est, df = detect_outliers_analyzed(
        t, spark, 500.0, 3, (xlo, xhi), (ylo, yhi),
        exact_threshold=n // 2,
    )
    # estimate within 3x of the boxed truth (independence assumption)
    assert in_box == 0 or (est <= 3 * in_box + n * 0.02)
    if in_box <= n // 6:
        assert mode == "exact"
