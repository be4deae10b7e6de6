"""As-of join (operators/asof.py) — the union + sorted-window formulation
must match a brute-force per-row scan, handle tolerance, resolve exact-ts
ties deterministically, and never plan a theta join."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def test_asof_matches_bruteforce_and_tolerance(spark):
    left = spark.createDataFrame(
        [(i, 1 + (i % 3), _ts(i * 7)) for i in range(60)],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100 + i, 1 + (i % 4), _ts(i * 11 + 3), float(i)) for i in range(40)],
        ["event_id", "user_id", "ts", "value"],
    )
    got = {
        r.event_id: (r.event_id_r, r.value_r)
        for r in asof_join(
            left, right, on="user_id", value_cols=["event_id", "value"]
        ).collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    assert len(got) == len(lrows)
    for lr in lrows:
        cand = [
            rr for rr in rrows if rr.user_id == lr.user_id and rr.ts <= lr.ts
        ]
        want = max(cand, key=lambda r: (r.ts, r.event_id), default=None)
        if want is None:
            assert got[lr.event_id] == (None, None)
        else:
            assert got[lr.event_id] == (want.event_id, want.value)

    # tolerance: matches staler than 30 minutes are nulled
    tol = {
        r.event_id: r.event_id_r
        for r in asof_join(
            left, right, on="user_id", value_cols=["event_id", "value"],
            tolerance_expr="INTERVAL 30 MINUTES",
        ).collect()
    }
    for lr in lrows:
        cand = [
            rr for rr in rrows if rr.user_id == lr.user_id and rr.ts <= lr.ts
        ]
        want = max(cand, key=lambda r: (r.ts, r.event_id), default=None)
        if want is None or lr.ts - want.ts > timedelta(minutes=30):
            assert tol[lr.event_id] is None
        else:
            assert tol[lr.event_id] == want.event_id


def test_asof_exact_tie_is_inclusive_and_deterministic(spark):
    """right.ts == left.ts matches (backward INCLUSIVE); duplicate right
    rows at one (key, ts) resolve to the max value_cols tuple."""
    left = spark.createDataFrame([(1, 9, _ts(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(50, 9, _ts(10), 1.0), (51, 9, _ts(10), 2.0)],
        ["event_id", "user_id", "ts", "value"],
    )
    (row,) = asof_join(
        left, right, on="user_id", value_cols=["event_id", "value"]
    ).collect()
    assert row.event_id_r == 51 and row.value_r == 2.0
    assert row.ts_r == _ts(10)


def test_asof_plan_has_no_theta_join(spark):
    """The scale property: one shuffle on the key, no Cartesian/
    nested-loop join anywhere in the physical plan."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("event_id"),
        F.rand(1).alias("value"),
    )
    df = asof_join(left, right, on="user_id", value_cols=["event_id", "value"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert df.count() == 100


def test_interval_point_join_matches_bruteforce(spark):
    """Bucketed range join == the raw inequality join, including half-open
    boundaries and intervals spanning many buckets; the plan stays an
    equi-join (no nested-loop/theta join)."""
    from openeo_geotrellis_extensions_spark.operators.asof import (
        interval_point_join,
    )

    points = spark.createDataFrame(
        [(i, 1 + (i % 3), _ts(i * 13)) for i in range(80)],
        ["event_id", "user_id", "ts"],
    )
    ivs = spark.createDataFrame(
        [
            (j, 1 + (j % 4), _ts(j * 29), _ts(j * 29 + 60 + (j % 5) * 90))
            for j in range(25)
        ],
        ["interval_id", "user_id", "start", "end"],
    )
    df = interval_point_join(points, ivs, on="user_id", bucket_seconds=1800)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r.event_id, r.interval_id) for r in df.collect()}
    want = {
        (p.event_id, iv.interval_id)
        for p in points.collect()
        for iv in ivs.collect()
        if p.user_id == iv.user_id and iv.start <= p.ts < iv.end
    }
    assert got == want and want  # non-trivial overlap set

    # half-open boundary: ts == start matches, ts == end does not
    pts = spark.createDataFrame(
        [(1, 5, _ts(10)), (2, 5, _ts(70))], ["event_id", "user_id", "ts"]
    )
    one = spark.createDataFrame(
        [(9, 5, _ts(10), _ts(70))], ["interval_id", "user_id", "start", "end"]
    )
    rows = interval_point_join(pts, one, on="user_id").collect()
    assert [r.event_id for r in rows] == [1]


def test_asof_rejects_keyless_join(spark):
    from openeo_geotrellis_extensions_spark.operators.asof import asof_join

    df = spark.range(3).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one key"):
        asof_join(df, df, on=[], value_cols=["event_id"])


def test_interval_join_guards_degenerate_span(spark):
    """r6 guard: a year-long interval at the default 1 h width would
    silently explode into ~8.8k candidate rows per interval; now it
    raises with a message, and bucket_seconds='auto' derives a sane width
    from the median interval length and succeeds with identical rows."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from openeo_geotrellis_extensions_spark.operators.asof import (
        interval_point_join,
    )

    ev = spark.createDataFrame(
        [("e1", "2024-06-01 12:00:00"), ("e2", "2024-01-01 00:30:00")],
        ["event_id", "ts"],
    ).select("event_id", F.to_timestamp("ts").alias("ts"))
    iv = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "2025-01-01 00:00:00"),
         (1, "2024-06-01 00:00:00", "2024-06-02 00:00:00")],
        ["interval_id", "s", "e"],
    ).select(
        "interval_id",
        F.to_timestamp("s").alias("start"),
        F.to_timestamp("e").alias("end"),
    )
    with pytest.raises(Exception) as exc:
        interval_point_join(ev, iv, on=[]).count()
    assert "max_buckets_per_row" in str(exc.value)
    # auto width: median interval length spans few buckets -> succeeds
    got = interval_point_join(ev, iv, on=[], bucket_seconds="auto")
    rows = {(r.event_id, r.interval_id) for r in got.collect()}
    assert rows == {("e1", 0), ("e2", 0), ("e1", 1)}
    # explicit wide width also passes and agrees
    got2 = interval_point_join(ev, iv, on=[], bucket_seconds=864000)
    assert {(r.event_id, r.interval_id) for r in got2.collect()} == rows


def test_asof_join_rejects_reserved_and_colliding_names(spark):
    """ADVICE r5 closure: inputs carrying the join's internal column names
    (or a left column equal to a suffixed output) raise instead of being
    silently corrupted."""
    import pytest
    from pyspark.sql import functions as F

    from openeo_geotrellis_extensions_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 0)], ["k", "ts", "_side"]
    ).select("k", F.to_timestamp("ts").alias("ts"), "_side")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], ["k", "ts", "v"]
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    with pytest.raises(ValueError, match="reserved internal names"):
        asof_join(left, right, on="k")
    left2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0)], ["k", "ts", "v_r"]
    ).select("k", F.to_timestamp("ts").alias("ts"), "v_r")
    with pytest.raises(ValueError, match="suffixed right outputs"):
        asof_join(left2, right, on="k")
