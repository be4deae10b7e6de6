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


def test_histogram_quantiles_bound_and_partition_invariance(spark):
    """Fixed-bin quantile sketch: estimate within one bin width of the
    exact quantile, identical under repartitioning, exact N, and clamped
    edge bins for out-of-range values."""
    import numpy as np

    from openeo_geotrellis_extensions_spark.pipeline.sketch import (
        histogram_quantiles,
    )

    rng = np.random.RandomState(5)
    vals = np.concatenate(
        [rng.gamma(4.0, 50.0, 9000), [-50.0, 5000.0]]  # plus out-of-range
    )
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    qs = (0.1, 0.5, 0.9, 0.99)
    lo, hi, nb = 0.0, 1000.0, 250
    width = (hi - lo) / nb
    got = {
        r.q: (r.est, r.n)
        for r in histogram_quantiles(df, "v", lo, hi, nb, qs).collect()
    }
    assert all(n == len(vals) for _, n in got.values())
    clamped = np.clip(vals, lo, np.nextafter(hi, lo))
    for q in qs:
        exact = float(np.quantile(clamped, q, method="inverted_cdf"))
        assert got[q][0] <= exact <= got[q][0] + width, (q, got[q][0], exact)
    again = {
        r.q: r.est
        for r in histogram_quantiles(
            df.repartition(13), "v", lo, hi, nb, qs
        ).collect()
    }
    assert {q: e for q, (e, _) in got.items()} == again
