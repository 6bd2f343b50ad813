"""Structured Streaming operators (the reference's DStream surface,
re-expressed on spark.readStream / writeStream)."""
