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



def sessionized_event_stats(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Gap-based SESSIONIZATION via Spark's native session window (merges
    events whose [ts, ts+gap) windows overlap; a session ends when the next
    event arrives >= gap after the previous one). Works on a batch OR
    streaming DataFrame — in streaming, add a watermark first and drain in
    append mode (sessions emit once the watermark passes their end).

    -> (user_id, session_start, session_end, n_events, sum_value,
    first_event_id), session_end = last event + gap (the session-window
    upper bound). One shuffle on (user_id) at any scale; session state is
    bounded per user by the gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
            "first_event_id",
        )
    )


def sessionized_stream(
    spark: SparkSession,
    source_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming sessionization: file-source stream + watermark + the SAME
    session-window aggregation as the batch path (append mode — a session
    emits exactly once, when the watermark passes its end; sessions still
    open against the watermark are withheld, so a drained availableNow run
    yields the batch result restricted to watermark-closed sessions)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return sessionized_event_stats(stream.withWatermark("ts", watermark), gap)


def stream_static_enriched_stats(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a small static
    dimension (broadcast — Spark re-plans the static side per micro-batch,
    so at cluster scale the join never shuffles the stream) before the
    event-time windowed aggregation. ``dim`` must carry (event_type, weight).
    -> streaming DF (window_start, event_type, n, wsum)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    enriched = stream.join(F.broadcast(dim), "event_type")
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("wsum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n",
            "wsum",
        )
    )


def stream_spatial_join_stats(
    spark: SparkSession,
    source_dir: str,
    features: DataFrame,
    res: int = 7,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """The engine's headline operator under Structured Streaming: a point
    stream cell-joins the STATIC feature cover (broadcast per micro-batch —
    the stream side never shuffles for the join) and PIP-refines through the
    same stateless Arrow ``mapInPandas`` used in batch, then a watermarked
    event-time windowed aggregation per containing feature.

    Points: x/y are derived arithmetically from ``event_id`` (exact integer
    ops, engine-portable so a batch SQL oracle can mirror them). At scale the
    per-micro-batch work is identical to the batch plan — cover derivation is
    O(features) and re-broadcast per batch; only the agg keeps state.
    -> streaming DF (window_start, feature_index, n, sum_value)."""
    from ..operators.spatial_join import spatial_join_points

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    pts = stream.select(
        "ts",
        "value",
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0).alias("rep_x"),
        ((F.col("event_id") * 104729 % 18000) / 100.0 - 90.0).alias("rep_y"),
    )
    joined = spatial_join_points(pts, features, res=res)
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "feature_index")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "feature_index",
            "n",
            "sum_value",
        )
    )


def _await_drained(q, name: str, timeout_sec: int) -> None:
    """Wait until the availableNow query has processed ALL source data, then
    ensure it is stopped — never return a partially-populated memory table.

    Plain awaitTermination is not enough: a stateful query with
    processing-time timeouts armed keeps scheduling timer-only micro-batches
    after the data is exhausted (observed: hundreds of empty epochs), so the
    query never self-terminates. Data-drained is instead detected as a
    COMPLETED batch with numInputRows == 0 — under availableNow, batches
    carry data until the source is exhausted, so the first empty batch marks
    the drain; the query is then stopped explicitly. On a genuine timeout
    (data still flowing) stop and raise instead of returning partial
    results."""
    import time

    deadline = time.monotonic() + timeout_sec
    while time.monotonic() < deadline:
        if q.awaitTermination(1):
            return  # terminated on its own (no timers armed)
        progress = q.recentProgress
        if progress and progress[-1]["numInputRows"] == 0:
            q.stop()
            q.awaitTermination(max(1, int(deadline - time.monotonic())))
            return
    q.stop()
    raise TimeoutError(f"stream '{name}' did not drain within {timeout_sec}s")


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
    _await_drained(q, name, timeout_sec)
    return stream_df.sparkSession.table(name)


_DURATION_UNITS_MS = {
    "ms": 1, "millisecond": 1, "milliseconds": 1,
    "s": 1000, "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _duration_ms(d: str | int) -> int:
    """'1 hour' / '30 seconds' / 5000 -> milliseconds (PySpark's
    setTimeoutDuration only takes ints)."""
    if isinstance(d, int):
        return d
    n, unit = d.strip().split()
    return int(float(n) * _DURATION_UNITS_MS[unit.lower()])


def streaming_dedup_first_seen(
    spark: SparkSession,
    source_dir: str,
    key_expr: str = "md5(regexp_replace(lower(trim(props)), '\\\\s+', ' '))",
    state_timeout: str | None = None,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): emit each event
    whose content hash was NOT seen in any earlier micro-batch — streaming
    exact dedup with first-seen-wins semantics, the incremental counterpart
    of pipeline.dedup.dedup_exact. State per content hash stores the first
    event_id; duplicates within AND across micro-batches are dropped.
    Grouping on the hash makes state access one shuffle per batch, the same
    key layout a 1000-node cluster would partition by.

    ``state_timeout``: optional processing-time TTL (e.g. '1 hour') — each
    key's state expires that long after it was last touched, bounding state
    size for unbounded streams at the cost of re-admitting a duplicate that
    arrives after the window (the standard streaming-dedup tradeoff)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    keyed = stream.withColumn("h", F.expr(key_expr))

    out_schema = StructType(
        [
            StructField("h", StringType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("first_id", LongType())])

    ttl = _duration_ms(state_timeout) if state_timeout is not None else None

    def dedup_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # TTL expired: drop the key's state entirely
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        fresh = not state.exists
        if ttl is not None:
            state.setTimeoutDuration(ttl)  # (re)arm the TTL on every touch
        if fresh:  # hash seen before -> drop silently (no yield)
            first = batch.sort_values("event_id").iloc[0]
            state.update((int(first["event_id"]),))
            yield pd.DataFrame(
                [
                    {
                        "h": key[0],
                        "event_id": int(first["event_id"]),
                        "ts": first["ts"],
                        "value": float(first["value"]),
                    }
                ]
            )

    timeout = (
        GroupStateTimeout.NoTimeout
        if state_timeout is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("h").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def stream_to_resumable(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    name: str = "stream_sink",
    timeout_sec: int = 120,
):
    """Exactly-once streaming file sink on the commit-log checkpoint writer
    (runtime/checkpoint.py): each micro-batch writes through a
    ``ResumableWriter`` with bucket = the batch id, so a foreachBatch REPLAY
    after a failure (Structured Streaming's at-least-once contract) finds
    its bucket already committed and becomes a no-op — idempotent rewrite
    turns at-least-once replays into exactly-once file output, without any
    rename-dependent output committer (object-store-safe end to end).

    Returns the writer (``.read(spark)`` gives the reconciled output,
    ``.metrics()`` the per-batch lineage/metrics the north rule asks for).
    """
    from pyspark.sql import functions as F

    from ..runtime.checkpoint import ResumableWriter

    writer = ResumableWriter(
        out_dir, partition_col="batch_bucket", lineage={"stream": name}
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        writer.run(
            batch_df.withColumn("batch_bucket", F.lit(f"b{batch_id:012d}"))
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, name, timeout_sec)
    return writer


def run_stream_append_to_memory(
    stream_df: DataFrame, name: str = "stream_append", timeout_sec: int = 120
) -> DataFrame:
    """Drain an append-mode stream (stateful operators) with availableNow."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, name, timeout_sec)
    return stream_df.sparkSession.table(name)
