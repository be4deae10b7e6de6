"""Structured Streaming windowed aggregation == its batch equivalent."""

import shutil

from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.streaming.events import (
    run_stream_to_memory,
    windowed_event_stats,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    shutil.copytree(SF, src, ignore=shutil.ignore_patterns("[!e]*"))
    # copytree with pattern keeps only events.parquet
    stream = windowed_event_stats(spark, src, window="1 day", watermark="2 days")
    got = run_stream_to_memory(stream, name="t_stream").collect()
    assert len(got) > 0

    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("window_start"),
                 "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .collect()
    )
    a = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in got}
    b = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch}
    assert a == b


def test_streaming_sessionize_is_batch_subset(spark, tmp_path):
    """Session windows under Structured Streaming (append + watermark): a
    drained availableNow run must emit EXACTLY the batch sessionization
    restricted to sessions the final watermark closed — same rows, none
    extra, and the withheld remainder are precisely the late-tail
    sessions."""
    from openeo_geotrellis_extensions_spark.streaming.events import (
        run_stream_append_to_memory,
        sessionized_event_stats,
        sessionized_stream,
    )

    src = str(tmp_path / "events_sess")
    shutil.copytree(SF, src, ignore=shutil.ignore_patterns("[!e]*"))
    stream = sessionized_stream(spark, src, gap="30 minutes", watermark="1 hour")
    got = {
        tuple(r)
        for r in run_stream_append_to_memory(stream, name="t_sess").collect()
    }
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = sessionized_event_stats(events, gap="30 minutes")
    wm = events.agg(
        F.date_format(
            F.max("ts") - F.expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss"
        ).alias("w")
    ).collect()[0]["w"]
    closed = {
        tuple(r) for r in batch.where(F.col("session_end") < F.lit(wm)).collect()
    }
    assert got  # stream emitted real sessions
    assert got == closed  # exactly the watermark-closed batch sessions
    assert batch.count() > len(closed)  # the open tail was withheld, exists


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: one output row per
    distinct content hash across ALL micro-batches (duplicates dropped both
    within and across batches), matching the batch dedup group count."""
    import hashlib
    import re

    import duckdb

    from openeo_geotrellis_extensions_spark.streaming.events import (
        run_stream_append_to_memory,
        streaming_dedup_first_seen,
    )

    d = tmp_path / "ev_chunks"
    d.mkdir()
    con = duckdb.connect()
    # 8 chunk files -> 2 micro-batches at maxFilesPerTrigger=4; chunks share
    # duplicate props so the cross-batch state path is exercised
    for i in range(8):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('/root/testdata/sf0.01/events.parquet') "
            f"WHERE event_id % 8 = {i}) TO '{d}/part_{i}.parquet' (FORMAT PARQUET)"
        )
    out = run_stream_append_to_memory(
        streaming_dedup_first_seen(spark, str(d)), name="dedup_stream"
    ).toPandas()

    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet").toPandas()
    src["h"] = src["props"].map(lambda p: re.sub(r"\s+", " ", p.strip().lower()))
    by_hash = src.groupby("h")["event_id"].agg(set)
    assert len(out) == len(by_hash)           # one row per distinct hash
    assert out["h"].nunique() == len(by_hash)
    groups_by_md5 = {
        hashlib.md5(h.encode()).hexdigest(): ids for h, ids in by_hash.items()
    }
    for rec in out.itertuples(index=False):
        assert rec.event_id in groups_by_md5[rec.h]


def test_stream_to_resumable_exactly_once(spark, tmp_path):
    """Exactly-once file sink: micro-batches write through the commit-log
    ResumableWriter keyed by batch id, a simulated foreachBatch REPLAY of an
    already-committed batch is a no-op, and the reconciled read equals the
    batch source exactly (no dupes, no gaps). Restarting the drained stream
    on the same checkpoint also writes nothing new."""
    import duckdb

    from openeo_geotrellis_extensions_spark.streaming.events import (
        stream_to_resumable,
    )

    d = tmp_path / "ev_src"
    d.mkdir()
    con = duckdb.connect()
    for i in range(4):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF}/events.parquet') "
            f"WHERE event_id % 4 = {i}) TO '{d}/part_{i}.parquet' (FORMAT PARQUET)"
        )
    schema = spark.read.parquet(str(d)).schema
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")  # -> 2 micro-batches
            .parquet(str(d))
        )
        return stream_to_resumable(stream, out_dir, ckpt, name="ev_sink")

    writer = start()
    n_src = spark.read.parquet(f"{SF}/events.parquet").count()
    got = writer.read(spark)
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
    assert len(writer.commits()) >= 2  # one commit per micro-batch

    # simulated replay of batch 0 (at-least-once delivery): no-op
    from pyspark.sql import functions as F

    replay = spark.read.parquet(str(d)).withColumn(
        "batch_bucket", F.lit("b000000000000")
    )
    s = writer.run(replay)
    assert s["written"] == 0 and s["skipped"] >= 2
    assert writer.read(spark).count() == n_src

    # restart on the same checkpoint: source exhausted, nothing new written
    w2 = start()
    assert w2.read(spark).count() == n_src


def test_streaming_dedup_with_state_ttl(spark, tmp_path):
    """TTL-armed variant (ProcessingTimeTimeout): with a TTL far beyond the
    run, output matches the untimed semantics — one row per distinct hash."""
    import duckdb

    from openeo_geotrellis_extensions_spark.streaming.events import (
        run_stream_append_to_memory,
        streaming_dedup_first_seen,
    )

    d = tmp_path / "ev_ttl"
    d.mkdir()
    con = duckdb.connect()
    for i in range(8):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('/root/testdata/sf0.01/events.parquet') "
            f"WHERE event_id % 8 = {i}) TO '{d}/part_{i}.parquet' (FORMAT PARQUET)"
        )
    out = run_stream_append_to_memory(
        streaming_dedup_first_seen(spark, str(d), state_timeout="1 hour"),
        name="dedup_stream_ttl",
    ).toPandas()
    n_hashes = con.execute(
        r"SELECT COUNT(DISTINCT md5(regexp_replace(lower(trim(props)), '\s+', ' ', 'g'))) "
        "FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).fetchone()[0]
    assert len(out) == n_hashes


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    """The headline spatial join under streaming == the same join in batch:
    broadcast cover join + stateless PIP mapInPandas inside micro-batches,
    watermarked windowed agg on top."""
    import shutil as _shutil

    from openeo_geotrellis_extensions_spark.operators.spatial_join import (
        spatial_join_points,
    )
    from openeo_geotrellis_extensions_spark.streaming.events import (
        stream_spatial_join_stats,
    )

    src = str(tmp_path / "events_stream_sj")
    _shutil.copytree(SF, src, ignore=_shutil.ignore_patterns("[!e]*"))
    feats = spark.createDataFrame(
        [
            (0, '{"type":"Polygon","coordinates":[[[-50.00005,-30.00005],'
                '[30.00005,-30.00005],[30.00005,40.00005],[-50.00005,40.00005],'
                '[-50.00005,-30.00005]]]}'),
        ],
        "feature_index int, geojson string",
    )
    stream = stream_spatial_join_stats(spark, src, feats, res=7)
    got = run_stream_to_memory(stream, name="t_stream_sj").collect()
    assert len(got) > 0

    pts = spark.read.parquet(f"{SF}/events.parquet").select(
        "ts", "value",
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0).alias("rep_x"),
        ((F.col("event_id") * 104729 % 18000) / 100.0 - 90.0).alias("rep_y"),
    )
    batch = (
        spatial_join_points(pts, feats, res=7)
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "window_start"
            ),
            "feature_index",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .collect()
    )
    a = {(r.window_start, r.feature_index): (r.n, r.sum_value) for r in got}
    b = {(r.window_start, r.feature_index): (r.n, r.sum_value) for r in batch}
    assert a == b
