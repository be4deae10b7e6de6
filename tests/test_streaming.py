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
