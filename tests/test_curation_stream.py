"""Streaming curation: file-source replay must equal the batch
operators bit-for-bit (the stages are stateless per-row maps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing__spark.operators.curation import redact_pii
from big_data_computing__spark.operators.textstats import quality_scores
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.streaming.curation_stream import (
    quality_gate_stream,
    redact_pii_stream,
)


def test_streaming_curation_matches_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    # plant PII so redaction has real work
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" contact bob@example.com at 10.1.2.3")
            ),
        ).otherwise(F.col("text")),
    )
    data = str(tmp_path / "docs")
    seeded.write.parquet(data)

    stream = spark.readStream.schema(seeded.schema).parquet(data)
    out = quality_gate_stream(redact_pii_stream(stream), min_quality=0.45)
    query = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curation_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"], r["quality_score"])
        for r in spark.sql(
            "SELECT doc_id, text, quality_score FROM curation_out"
        ).collect()
    }

    # batch equivalent: redact, then score + filter
    red = redact_pii(seeded)
    scores = quality_scores(red).select("doc_id", "quality_score")
    want = {
        (r["doc_id"], r["text"], r["quality_score"])
        for r in red.join(scores, "doc_id")
        .where(F.col("quality_score") >= 0.45)
        .collect()
    }
    assert got == want and len(got) > 0
    # redaction actually fired on the planted rows that survived
    planted = [t for (d, t, q) in got if d % 7 == 0]
    assert planted and all(
        "<EMAIL>" in t and "<IP>" in t and "bob@" not in t for t in planted
    )
