"""Skew handling: explicit salting for hot cells (BASELINE north_star:
"salting for skewed coastal/urban cells").

The reference hand-rolls sparse partitioners that cap tiles/partition
(DatacubeSupport.scala:145-188, SparseSpaceOnlyPartitioner shift-8
package.scala:53-56). Ours: measure per-key frequency with one cheap
aggregation, then give each hot key ``ceil(count / target)`` salt slots;
downstream groupBy/repartition on (key, salt) splits the hot key across
executors. AQE's skew-join split covers shuffle JOINS automatically — this
utility covers aggregations and partitioned writes, where AQE cannot split a
single key.

Salt assignment is deterministic (hash of a row-id column, not rand()), so
retries/resume produce identical placement — required for checkpoint-resume
idempotency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_counts(df: DataFrame, key_col: str, target_rows_per_salt: int) -> DataFrame:
    """(key, n_salt): number of salt slots per key — 1 for cold keys,
    ceil(count/target) for hot ones. One partial-agg count job."""
    return df.groupBy(key_col).agg(
        F.greatest(
            F.lit(1),
            F.ceil(F.count("*") / F.lit(target_rows_per_salt)),
        ).cast("int").alias("n_salt")
    )


def with_salt(
    df: DataFrame,
    key_col: str,
    id_col: str,
    target_rows_per_salt: int = 100_000,
    salts: DataFrame | None = None,
) -> DataFrame:
    """Adds a deterministic ``salt`` column: pmod(xxhash64(id), n_salt(key)).
    Cold keys get salt 0; a hot key spreads over its n_salt slots.
    ``repartition(key, salt)`` / ``groupBy(key, salt)`` then distributes the
    hot key across executors."""
    salts = salts or salt_counts(df, key_col, target_rows_per_salt)
    return df.join(F.broadcast(salts), key_col, "left").withColumn(
        "salt",
        F.when(F.col("n_salt") <= 1, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col(id_col)), F.col("n_salt")).cast("int")
        ),
    ).drop("n_salt")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list,
    id_col: str,
    target_rows_per_salt: int = 100_000,
) -> DataFrame:
    """Two-stage aggregation for algebraic aggregates on skewed keys:
    groupBy(keys + salt) partial, then groupBy(keys) final. ``aggs`` are
    (partial_expr, final_fn) pairs, e.g. (F.sum(c).alias(n), lambda: F.sum(n))
    — for self-decomposable aggs (sum/count/min/max) partial == final."""
    salted = with_salt(df, key_cols[0], id_col, target_rows_per_salt)
    partial = salted.groupBy(*key_cols, "salt").agg(*[p for p, _ in aggs])
    finals = [f() for _, f in aggs]
    return partial.groupBy(*key_cols).agg(*finals)
