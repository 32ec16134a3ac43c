"""Watermarked windowed streaming aggregation over the events stream.

SURVEY §2-B "Streaming" row: the index build itself is deliberately batch
(+ the segment-append stream in incremental.py); this module covers the
classic watermark/window/late-data surface on the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_counts(spark: SparkSession, input_dir: str,
                          checkpoint_dir: str, queryName: str = "win_out",
                          window: str = "5 minutes",
                          slide: str | None = None,
                          watermark: str = "10 minutes") -> StreamingQuery:
    """readStream(parquet) -> watermark -> window agg -> memory sink.

    Late rows beyond the watermark are dropped by Spark's state cleanup;
    the memory sink + availableNow trigger make this synchronously
    testable (and swap to kafka/files in production unchanged).
    """
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .parquet(input_dir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", window, slide or window), "event_type")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("value"), 4).alias("total_value")))
    return (agg.writeStream.outputMode("append")
            .format("memory").queryName(queryName)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def batch_equivalent(spark: SparkSession, input_dir: str,
                     window: str = "5 minutes") -> DataFrame:
    """The batch query the streaming result must agree with on closed
    windows (used by the test as the oracle)."""
    ev = spark.read.parquet(input_dir).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    return (ev.groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value")))
