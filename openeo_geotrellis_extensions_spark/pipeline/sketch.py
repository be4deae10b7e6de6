"""Mergeable frequency sketches for corpus statistics.

Misra-Gries heavy hitters: each partition maintains a bounded summary of
``capacity`` counters (the classic streaming algorithm — decrement all
counters when a new item finds no slot); per-partition summaries then
merge by plain summation. The deterministic guarantee, independent of data
order or partitioning:

    true_count - N / capacity  <=  estimate  <=  true_count

and every item with frequency > N / capacity is PRESENT in the merged
summary. Memory is O(partitions * capacity) rows into the final
aggregation — never O(vocabulary) on any single node — which is what makes
top-k over a 100 TB corpus with an unbounded vocabulary tractable: the
shuffle carries sketch rows, not the full word-count table.

With ``capacity`` >= the partition's distinct-item count, no decrements
ever fire and the summary degenerates to EXACT counts — the configuration
the driver oracle pins (exact SQL top-k); the error-bound behavior is
pinned by property tests at small capacity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_update(counters: dict, item: str, inc: int, capacity: int) -> None:
    """One Misra-Gries update (textbook): bump an existing counter, claim a
    free slot, else decrement ALL counters by the new item's weight (and
    drop the ones that hit zero)."""
    if item in counters:
        counters[item] += inc
        return
    if len(counters) < capacity:
        counters[item] = inc
        return
    dec = min(inc, min(counters.values()))
    dead = []
    for k in counters:
        counters[k] -= dec
        if counters[k] <= 0:
            dead.append(k)
    for k in dead:
        del counters[k]
    if inc > dec:
        counters[item] = inc - dec


def mg_partition_sketches(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """One Misra-Gries summary per partition -> (item, est) rows, at most
    ``capacity`` per partition (Arrow-batched; the dict lives across the
    partition's batches)."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # pre-aggregate the Arrow batch (C-speed hash count) and feed
            # WEIGHTED MG updates per DISTINCT item — the Python loop
            # shrinks from every token to the batch's distinct items.
            # With capacity >= vocabulary no decrement ever fires and the
            # result is the same exact counts as per-token updates; in the
            # bounded regime the counter values may differ from per-token
            # order but every MG guarantee is preserved (each decrement
            # round discards dec*(capacity+1) total mass, so the
            # undercount stays <= N/capacity and heavy items survive).
            vc = pdf[item_col].value_counts(dropna=False)
            for item, cnt in zip(vc.index, vc.to_numpy()):
                _mg_update(counters, item, int(cnt), capacity)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        sketch, schema="item string, est long"
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Approximate top-k items by frequency: per-partition Misra-Gries
    summaries, merged by summation (summing per-partition estimates keeps
    the MG bound: each partition under-counts by at most N_p/capacity, so
    the merged estimate under-counts by at most N/capacity and never
    over-counts). -> (item, est, rank), rank by (est desc, item asc).

    The top-k itself goes through orderBy().limit(k) — Spark plans that as
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge), so
    no single task ever sorts the full partitions*capacity sketch table (a
    global-window row_number would); the rank column is then assigned over
    just the k survivors."""
    partials = mg_partition_sketches(df, item_col, capacity)
    merged = partials.groupBy("item").agg(F.sum("est").alias("est"))
    top = merged.orderBy(F.desc("est"), F.asc("item")).limit(k)
    w = Window.orderBy(F.desc("est"), F.asc("item"))  # k rows only
    return top.withColumn("rank", F.row_number().over(w)).select(
        "item", "est", F.col("rank").cast("int").alias("rank")
    )


def word_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Corpus-level top-k WORDS via the MG sketch (normalization matches
    the rest of the text pipeline: lower, trim, whitespace split)."""
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    words = df.select(F.explode(F.split(t, " ")).alias("w")).where(
        F.col("w") != ""
    )
    return heavy_hitters(words, "w", k=k, capacity=capacity)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Deterministic mergeable quantile sketch: a fixed-bin histogram over
    [lo, hi). Bin counts are plain integers that merge by summation —
    exact under any partitioning/order — and the q-quantile estimate is
    the LEFT EDGE of the first bin whose cumulative count reaches
    ceil(q * N). Error is bounded by one bin width ((hi-lo)/n_bins), and
    unlike percentile_approx's GK sketch the result is bit-reproducible
    across engines (the SQL oracle replays the identical arithmetic).
    Values outside [lo, hi) clamp into the edge bins. -> (q, est, n).

    Scale shape: one map-side-combined groupBy over at most n_bins keys;
    the cumulative pass and quantile pick run over <= n_bins rows."""
    span = float(hi) - float(lo)
    if span <= 0 or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value_col).cast("double") - F.lit(float(lo)))
                / F.lit(span)
                * F.lit(float(n_bins))
            ),
        ),
    ).cast("long")
    hist = df.where(F.col(value_col).isNotNull()).groupBy(b.alias("bin")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    totals = hist.agg(F.sum("c").alias("n"))
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], ["q"])
    hit = (
        qdf.crossJoin(F.broadcast(totals))
        .join(
            F.broadcast(cum),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy("q", "n")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        "q",
        (F.lit(float(lo)) + F.col("bin") * F.lit(span) / F.lit(float(n_bins))).alias(
            "est"
        ),
        F.col("n").cast("long").alias("n"),
    )
