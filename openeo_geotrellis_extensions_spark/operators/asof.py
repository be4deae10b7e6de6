"""Temporal joins Spark's join zoo lacks: as-of (nearest-preceding) join
and bucketed interval/range join (DataFrames offer equi joins and
theta-join range predicates only; pandas has merge_asof, DuckDB/kdb have
ASOF JOIN, range joins need manual bucketing everywhere).

Spark-first formulation: instead of a per-key loop or an O(L*R)
inequality join, UNION the two sides tagged left/right, sort each key
partition by (ts, side) once, and carry the latest right-side payload
forward with a last_value(ignorenulls) running window. One shuffle on the
key, O(L + R) rows total, no theta join anywhere — survives any key
cardinality because a hot key is a single sorted partition stream, not a
quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_expr: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` within the same ``on`` key(s) (backward
    inclusive, the pandas merge_asof / DuckDB ``ASOF JOIN ... ON l.ts >=
    r.ts`` semantics). Left rows keep all their columns; the matched right
    ``value_cols`` arrive suffixed, NULL when no right row precedes.

    ``tolerance_expr`` (an INTERVAL SQL string, e.g. ``"INTERVAL 1
    HOUR"``) null-outs matches staler than the tolerance — pandas
    merge_asof's ``tolerance``.

    Right rows sharing an exact (key, ts) are reduced to ONE deterministic
    winner (max over ``value_cols`` tuple order — engines disagreeing on
    which duplicate wins would make the join nondeterministic).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError(
            "asof_join needs at least one key column: a keyless as-of would"
            " sort the whole union in ONE partition (Window.partitionBy of"
            " nothing) — add a coarse time-bucket key if the data is truly"
            " global"
        )
    # reserved internal names (ADVICE r5): an input column named like the
    # tagging/carry columns would be silently corrupted — fail loudly
    reserved = {"_side", "_rv", "_lrow", "_match", "_match_ts"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join: input columns {sorted(clash)} collide with the"
            " join's reserved internal names — rename them first"
        )
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != ts_col
        ]
    dup_out = {f"{c}{suffix}" for c in [*value_cols, ts_col]} & set(left.columns)
    if dup_out:
        raise ValueError(
            f"asof_join: left columns {sorted(dup_out)} collide with the"
            f" suffixed right outputs (suffix={suffix!r}) — pass a"
            " different suffix"
        )
    # deterministic winner among exact-tie right rows
    r_unique = right.groupBy(*keys, ts_col).agg(
        F.max(F.struct(*value_cols)).alias("_rv")
    )
    tagged_r = r_unique.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col("_rv"),
    )
    tagged_l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[c for c in left.columns]).alias("_lrow"),
    )
    tagged_r = tagged_r.withColumn(
        "_lrow", F.lit(None).cast(tagged_l.schema["_lrow"].dataType)
    )
    both = tagged_l.unionByName(tagged_r)
    # right rows (side 0) sort BEFORE left rows at equal ts -> inclusive <=
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    ).withColumn(
        "_match_ts", F.last(F.when(F.col("_side") == 0, F.col(ts_col)), True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_expr is not None:
        fresh = F.col(ts_col) - F.expr(tolerance_expr) <= F.col("_match_ts")
        out = out.withColumn("_match", F.when(fresh, F.col("_match"))).withColumn(
            "_match_ts", F.when(fresh, F.col("_match_ts"))
        )
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in value_cols],
        F.col("_match_ts").alias(f"{ts_col}{suffix}"),
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int | str = 3600,
    max_buckets_per_row: int | None = 4096,
) -> DataFrame:
    """Range join: every point row pairs with every interval of the same
    key(s) whose half-open [start, end) contains its timestamp.

    Scale shape: Spark would plan the raw inequality predicate as a
    broadcast-nested-loop / theta join (O(P*I) per key). Instead both
    sides map onto fixed-width time BUCKETS — a point to the one bucket
    containing it, an interval to the buckets it spans — and candidates
    come from a plain equi-join on (key, bucket), refined by the exact
    predicate. A point lives in exactly ONE bucket, so there are no
    duplicate candidates and no distinct; cost is O(P + I * span/width)
    with the width tuned to typical interval length. Returns the points'
    columns + the intervals' non-key columns.

    Guards (any bucket width yields the same result rows — width only
    sizes the candidate explosion): ``bucket_seconds="auto"`` derives the
    width from the MEDIAN interval length (one tiny aggregation over the
    interval side only), and ``max_buckets_per_row`` fails fast — a
    row-level raise inside the bucket expression, no extra job — when one
    degenerate interval would silently explode into more candidate rows
    than the cap (e.g. a year-long interval at the default 1 h width)."""
    keys = [on] if isinstance(on, str) else list(on)
    if bucket_seconds == "auto":
        med = intervals.select(
            F.percentile_approx(
                F.unix_timestamp(F.col(end_col))
                - F.unix_timestamp(F.col(start_col)),
                0.5,
            ).alias("m")
        ).collect()[0]["m"]
        w = max(1, int(med or 3600))
    else:
        w = int(bucket_seconds)
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    )
    lo_b = F.floor(F.unix_timestamp(F.col(start_col)) / w).cast("long")
    hi_b = F.floor(F.unix_timestamp(F.col(end_col)) / w).cast("long")
    if max_buckets_per_row is not None:
        n_b = hi_b - lo_b + F.lit(1).cast("long")
        lo_b = lo_b + F.when(
            n_b > max_buckets_per_row,
            F.raise_error(
                F.concat(
                    F.lit("interval_point_join: an interval spans "),
                    n_b.cast("string"),
                    F.lit(
                        f" buckets > max_buckets_per_row={max_buckets_per_row}"
                        f" at bucket_seconds={w}; pass a wider bucket_seconds"
                        " (or 'auto'), or raise max_buckets_per_row"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    ib = (
        intervals.withColumn("_bs", F.sequence(lo_b, hi_b))
        .withColumn("_b", F.explode("_bs"))
        .drop("_bs")
    )
    out = pb.join(ib, keys + ["_b"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("_b")
