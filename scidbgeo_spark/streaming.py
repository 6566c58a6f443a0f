"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.11) — this module is the
engine's Spark-completeness addition for the web-page ingest path: the
same hourly event rollup as the batch ``events_hourly`` query, expressed
as a streaming aggregation with a watermark, so a Common-Crawl-style feed
can be processed incrementally with exactly-once sinks (foreachBatch +
the lineage module's idempotent writes).

Tests drive it with the parquet source + a memory sink and assert
equality with the batch result (``processAllAvailable`` makes that
synchronous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over a directory of event parquet files -> watermarked
    hourly windowed aggregate.  Returns the (unstarted) streaming
    DataFrame.  (File streaming sources take a directory: new files
    arriving in it are the stream.)"""
    schema = spark.read.parquet(events_dir).schema
    events = spark.readStream.schema(schema).parquet(events_dir)
    # parquet TIMESTAMP_NTZ is not a valid event-time column; wall clock is UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "min_value",
            "max_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming aggregation to completion synchronously and
    return the materialized result (test/demo harness)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {name}")
