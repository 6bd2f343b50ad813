"""applyInPandasWithState: per-key state store counts must converge to
the batch ground truth after replaying the stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.frequent import item_counts
from big_data_computing__spark.sources.readers import event_stream_table
from big_data_computing__spark.streaming.frequent_stream import file_items
from big_data_computing__spark.streaming.stateful import running_item_counts


def test_stateful_running_counts(spark, sf_dir, tmp_path):
    batch = event_stream_table(spark, sf_dir).cache()
    data_dir = str(tmp_path / "data")
    batch.write.parquet(data_dir)

    stream = file_items(spark, data_dir)
    counts = running_item_counts(stream)
    query = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    # last emitted count per item == exact batch count
    got = {
        r["item"]: r["cnt"]
        for r in spark.sql(
            "SELECT item, max(cnt) AS cnt FROM running_counts GROUP BY item"
        ).collect()
    }
    truth = {r["item"]: r["cnt"] for r in item_counts(batch).collect()}
    assert got == truth


def test_streaming_transitions_replay_parity(spark, sf_dir, tmp_path):
    """The O(1)-state streaming transition twin: replaying the events
    fixture through time-ordered micro-batches and aggregating the
    emitted pairs equals the batch transition matrix bit-for-bit —
    including the pairs that straddle batch boundaries."""
    from big_data_computing__spark.operators.windows import (
        event_time_us,
        event_transitions,
    )
    from big_data_computing__spark.sources.readers import read_table
    from big_data_computing__spark.streaming.stateful import (
        streaming_transitions,
    )

    events = read_table(spark, sf_dir, "events")
    typed = events.select(
        "user_id",
        "event_id",
        "event_type",
        event_time_us(events).alias("u"),
    ).cache()
    data_dir = str(tmp_path / "tdata")
    # three time-ordered chunks, one file each (the in-order arrival
    # contract every replay twin documents)
    rows = typed.orderBy("u", "event_id").collect()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for part in chunks:
        spark.createDataFrame(
            part, "user_id long, event_id long, event_type string, u long"
        ).coalesce(1).write.mode("append").parquet(data_dir)

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, u long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    q = (
        streaming_transitions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_t"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n "
            "FROM trans_stream GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(events).collect()
    }
    assert got == want and len(got) > 0
