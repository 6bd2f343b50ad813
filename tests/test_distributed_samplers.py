"""Distributed (state-store) streaming samplers must be bit-identical
to the batch operators on the same stream prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators import frequent as FR
from big_data_computing__spark.sources.readers import event_stream_table
from big_data_computing__spark.streaming.distributed_samplers import (
    reservoir_stream,
    sticky_stream,
)
from big_data_computing__spark.streaming.frequent_stream import file_items


@pytest.fixture(scope="module")
def replay(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist_samplers")
    data = str(tmp / "data")
    event_stream_table(spark, sf_dir).orderBy("seq").coalesce(1).write.parquet(
        data
    )
    return tmp


def _run(stream_df, tmp, name):
    query = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query


def test_reservoir_stream_matches_batch(spark, sf_dir, replay):
    phi, seed = 0.02, 5
    m = FR.reservoir_size(phi)
    items = file_items(spark, str(replay / "data"))
    _run(reservoir_stream(items, m, seed), replay, "res_stream")
    # latest emission per slot == final reservoir
    got = {
        r["slot"]: r["item"]
        for r in spark.sql(
            "SELECT slot, max_by(item, seq) AS item FROM res_stream "
            "GROUP BY slot"
        ).collect()
    }
    batch = event_stream_table(spark, sf_dir)
    expected = {
        r["slot"]: r["item"]
        for r in FR.reservoir_sample(batch, m, seed).collect()
    }
    assert got == expected


def test_sticky_stream_matches_batch(spark, sf_dir, replay):
    seed, r = 7, 50.0
    batch = event_stream_table(spark, sf_dir)
    n = batch.count()
    items = file_items(spark, str(replay / "data"))
    _run(sticky_stream(items, n, r, seed), replay, "stk_stream")
    got = {
        row["item"]: row["est_cnt"]
        for row in spark.sql(
            "SELECT item, max(est_cnt) AS est_cnt FROM stk_stream "
            "GROUP BY item"
        ).collect()
    }
    expected = {
        row["item"]: row["est_cnt"]
        for row in FR.sticky_counts(batch, n, r, seed).collect()
    }
    assert got == expected


def test_weighted_reservoir_stream_matches_batch(spark, sf_dir, replay):
    """Union of the buckets' final top-m states, cut to the global
    top-m, must equal the batch A-Res sample exactly (same keys, same
    tie-break)."""
    from big_data_computing__spark.streaming.distributed_samplers import (
        weighted_reservoir_stream,
    )

    m, seed = 8, 7
    # weighted rows derived from the replayed stream: weight = item%9+1
    src = spark.readStream.schema("seq long, item long").parquet(
        str(replay / "data")
    )
    # no stream-side dropDuplicates (a second stateful op is not
    # supported in update mode); the state update dedups by item
    rows = src.select(
        "item", (F.col("item") % 9 + 1).cast("long").alias("w")
    )
    _run(
        weighted_reservoir_stream(rows, m, n_buckets=4, seed=seed),
        replay,
        "wres_stream",
    )
    got = [
        (r["rank"], r["item"], r["w"])
        for r in spark.sql(
            """
            WITH latest AS (
              SELECT bucket, MAX(epoch) AS e FROM wres_stream GROUP BY bucket
            ),
            final AS (
              SELECT s.item, s.w, s.key FROM wres_stream s
              JOIN latest l ON s.bucket = l.bucket AND s.epoch = l.e
            ),
            cut AS (
              SELECT item, w, key FROM final
              ORDER BY key DESC, item LIMIT 8
            )
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY key DESC, item) AS INT)
                     AS rank, item, w
            FROM cut
            """
        ).collect()
    ]
    batch_rows = (
        event_stream_table(spark, sf_dir)
        .select("item")
        .dropDuplicates(["item"])
        .select("item", (F.col("item") % 9 + 1).cast("long").alias("w"))
    )
    want = [
        (r["rank"], r["item"], r["w"])
        for r in FR.weighted_reservoir_sample(
            batch_rows, m, seed=seed
        ).collect()
    ]
    assert got == want and len(got) == m
