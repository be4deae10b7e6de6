"""Structured Streaming analogs.

The reference is strictly batch (SURVEY §2.10: no streaming operators
anywhere in its tree); temporal "windows" there are batch interval
aggregations. This module adds the Spark-native streaming counterpart for
continuous ingestion scenarios: file-source streams with event-time windows
+ watermarks, so the same aggregate_temporal_period semantics run
incrementally. Deliberately small — checkpoint-resume for the batch engine
lives in runtime/checkpoint.py, not in streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_event_stats(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """readStream over a parquet directory -> event-time tumbling-window
    aggregation with a watermark for late data. Returns the streaming
    DataFrame (attach a sink with run_stream_to_memory or writeStream)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str = "stream_out", timeout_sec: int = 120
) -> DataFrame:
    """Drain the stream with an availableNow trigger into an in-memory table
    (complete mode) and return the materialized result — the batch-equivalence
    harness used by tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stream_df.sparkSession.table(name)
