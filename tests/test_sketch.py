"""Misra-Gries heavy hitters (pipeline/sketch.py): the deterministic sketch
guarantee — estimates within [true - N/capacity, true], every item above
the N/capacity threshold present, exactness when capacity covers the
vocabulary — and the summation merge preserving the bound across
partitions."""

import random

from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.pipeline.sketch import (
    _mg_update,
    heavy_hitters,
    word_heavy_hitters,
)


def _zipf_items(n, n_items, seed):
    rng = random.Random(seed)
    # Zipf-ish: item i with weight ~ 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_items)]
    return rng.choices([f"it{i:03d}" for i in range(n_items)], weights, k=n)


def test_mg_update_textbook_invariants():
    """Pure-python MG core: never more than capacity counters, estimates
    never exceed true counts, undercount bounded by N/capacity."""
    items = _zipf_items(5000, 200, seed=1)
    cap = 24
    counters: dict[str, int] = {}
    for it in items:
        _mg_update(counters, it, 1, cap)
        assert len(counters) <= cap
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    bound = len(items) / cap
    for it, est in counters.items():
        assert est <= true[it]
        assert est >= true[it] - bound
    # every genuinely heavy item is present
    for it, c in true.items():
        if c > bound:
            assert it in counters, it


def test_heavy_hitters_bound_and_merge_across_partitions(spark):
    """Distributed path: per-partition sketches merged by summation keep
    the global bound whatever the partitioning, and heavy items survive."""
    items = _zipf_items(20000, 300, seed=7)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    cap = 64
    bound = len(items) / cap
    for parts in (1, 7):
        df = spark.createDataFrame(
            [(it,) for it in items], ["item"]
        ).repartition(parts)
        got = {
            r.item: r.est
            for r in heavy_hitters(df, "item", k=300, capacity=cap).collect()
        }
        for it, est in got.items():
            assert est <= true[it]
            assert est >= true[it] - bound
        for it, c in true.items():
            if c > bound:
                assert it in got, (parts, it)


def test_heavy_hitters_exact_when_capacity_covers_vocab(spark):
    """capacity >= distinct items -> no decrements -> EXACT counts in any
    partitioning (the driver-oracle configuration)."""
    items = _zipf_items(5000, 40, seed=3)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    df = spark.createDataFrame([(it,) for it in items], ["item"]).repartition(5)
    got = {
        r.item: r.est
        for r in heavy_hitters(df, "item", k=40, capacity=256).collect()
    }
    assert got == true


def test_word_heavy_hitters_normalization(spark):
    """Text front-end matches the pipeline normalization (lower/trim/ws)."""
    docs = spark.createDataFrame(
        [(1, "  The THE the  fox "), (2, "fox fox\tfox")], ["doc_id", "text"]
    )
    got = {
        r.item: (r.est, r.rank)
        for r in word_heavy_hitters(docs, k=5, capacity=64).collect()
    }
    assert got == {"fox": (4, 1), "the": (3, 2)}
