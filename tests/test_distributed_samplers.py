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
