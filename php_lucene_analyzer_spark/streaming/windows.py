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


def running_user_totals(spark: SparkSession, input_dir: str,
                        checkpoint_dir: str,
                        queryName: str = "user_totals") -> StreamingQuery:
    """Custom STATEFUL operator: per-user running event count + value sum
    maintained across micro-batches via applyInPandasWithState (the
    arbitrary-state surface — what windowed aggs can't express).
    Emits the updated cumulative row per user per batch (update mode)."""
    import pandas as pd

    def update(key, pdfs, state):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                            "total_value": [round(total, 4)]})

    # one file per micro-batch: state continuity is exercised across many
    # batches within the run (cross-RESTART continuity needs a replayable
    # sink — see incremental.py; the memory sink here is for testability)
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(input_dir))
    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout")
    return (out.writeStream.outputMode("update")
            .format("memory").queryName(queryName)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def batch_equivalent(spark: SparkSession, input_dir: str,
                     window: str = "5 minutes",
                     slide: str | None = None) -> DataFrame:
    """The batch query the streaming result must agree with on closed
    windows (used by the test as the oracle).  ``slide`` must match the
    streaming side's — a sliding stream against a tumbling oracle
    mismatches on every non-aligned window."""
    ev = spark.read.parquet(input_dir).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (ev.groupBy(win, "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value")))
