"""Structured Streaming surface.

The reference has no true streaming dataflow (SURVEY.md §2.10) — its crawl
is bounded BFS and its 15s/30s tickers are observability loops. The crawl
therefore runs as iterative batch rounds. This module provides the
streaming-native equivalents of the metrics aggregations (A8) for deployments
that tail an event log: watermarked event-time windows over an append
stream, runnable to completion in tests with the available-now trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    query_name: str = "goprowl_windowed_counts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type over a parquet-backed
    stream, driven to completion synchronously (availableNow) and returned
    as a batch DataFrame.

    Production shape: readStream from Kafka/log-bucket, writeStream to an
    Iceberg metrics table with checkpointing; identical plan.
    """
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource needs a directory; glob-filter down to the one file
    base_dir, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(base_dir)
    )
    # parquet NTZ timestamps → event-time watermarks need TIMESTAMP (session
    # TZ is pinned to UTC, so the wall-clock instant is unchanged)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
