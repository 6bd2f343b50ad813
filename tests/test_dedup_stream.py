"""Streaming dedup: replay a corpus with planted duplicates; exactly the
batch survivors must come out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.dedup import exact_dedup_groups
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.dedup_stream import dedup_stream


def test_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    # plant duplicates: every doc appears twice (ids offset by 10_000)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    data = str(tmp_path / "docs")
    doubled.write.parquet(data)

    stream = spark.readStream.schema(doubled.schema).parquet(data)
    out = dedup_stream(stream)
    query = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    survivors = spark.sql("SELECT fingerprint FROM dedup_out").collect()
    fps = [r["fingerprint"] for r in survivors]
    # one survivor per distinct fingerprint
    assert len(fps) == len(set(fps))
    batch_groups = exact_dedup_groups(doubled)
    assert len(fps) == batch_groups.count()
    # every group emitted exactly one representative
    assert set(fps) == {
        r["fingerprint"] for r in batch_groups.collect()
    }
