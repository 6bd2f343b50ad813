"""Window operators and the composed HW2 pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators import pipelines as P
from big_data_computing__spark.operators import windows as W
from big_data_computing__spark.sources.readers import (
    customer_points,
    read_table,
)


def test_top_per_group(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 30.0),
        ("a", 3, 30.0),
        ("b", 4, 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = W.top_per_group(df, ["g"], "v", "id", n=1).collect()
    got = {(r["g"], r["id"]) for r in out}
    assert got == {("a", 2), ("b", 4)}  # tie at 30.0 → lower id wins


def test_tumbling_windows_partition_events(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    win = W.tumbling_window_counts(events)
    total = win.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # window starts are aligned to the hour (in microseconds)
    misaligned = win.where(
        F.col("window_start_us") % (3600 * 1_000_000) != 0
    ).count()
    assert misaligned == 0


def test_sessionize_counts_preserved(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    sess = W.sessionize(events)
    assert sess.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # session ids are dense per user starting at 0
    firsts = sess.groupBy("user_id").agg(
        F.min("session_id").alias("mn")
    )
    assert firsts.where(F.col("mn") != 0).count() == 0


def test_fft_radius_outliers_pipeline(spark, sf_dir):
    res = P.fft_radius_outliers(
        customer_points(spark, sf_dir), k=4, l=2, m=5, seed=3
    )
    assert res.radius > 0
    row = res.summary.collect()[0]
    assert row["sure_outliers"] >= 0
    assert row["uncertain_points"] >= 0
    assert "r1_coreset" in res.timings_ms


def test_session_window_boundary_semantics(spark):
    """Native session_window: an event exactly `gap` after the previous
    one MERGES (measured — a new session requires diff > gap), and
    session_end = last event + gap. Pinned so the DuckDB oracle's
    islands rule can never silently diverge."""
    from big_data_computing__spark.operators.windows import (
        session_window_counts,
    )

    gap_ns = 30 * 60_000_000_000
    rows = [
        (1, 0),
        (1, gap_ns),              # exactly gap after -> merges
        (1, 2 * gap_ns + 1000),   # gap + 1us after -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = sorted(
        (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in session_window_counts(df).collect()
    )
    gap_us = gap_ns // 1000
    assert out == [
        (0, gap_us + gap_us, 2),
        (2 * gap_us + 1, 3 * gap_us + 1, 1),
    ]
