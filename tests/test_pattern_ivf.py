"""Pattern cube fixture (F4 / buildSpatioTemporalDataCubePattern) + IVF ANN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
from openeo_geotrellis_extensions_spark.operators.merge import merge_cubes
from openeo_geotrellis_extensions_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    ivf_params_for,
    ivf_topk,
    ivf_topk_det,
)
from openeo_geotrellis_extensions_spark.sources.datacube import pattern_cube

# 8 horizontal tiles (LayerFixtures.scala:122-148)
LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 8.0, 1.0), 8, 1, 8, 8)


def test_pattern_cube_alternation(spark):
    cube = pattern_cube(spark, LAYOUT, pattern_scale=1)
    tiles = {
        r.col: decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        for r in cube.df.collect()
    }
    assert len(tiles) == 8
    for i in range(8):
        if i % 2 == 0:
            assert np.isnan(tiles[i]).all()  # empty tiles
        else:
            assert not np.isnan(tiles[i]).any()
            assert (tiles[i] >= 20).all() and (tiles[i] <= 120).all()


def test_pattern_cube_merge_fills_gaps(spark):
    """F4 use: merging two offset patterns fills each other's gaps
    (MergeCubesSpec RGB-with-different-nodata-layouts semantics)."""
    a = pattern_cube(spark, LAYOUT, pattern_scale=1)
    # shift: scale-2 pattern has a different empty set (tiles 0,1,4,5 empty)
    b = pattern_cube(spark, LAYOUT, pattern_scale=2)
    m = merge_cubes(a, b, "sum")
    tiles = {
        r.col: decode_tile_float(list(r.bands), m.meta.cell_type, (8, 8))[0]
        for r in m.df.collect()
    }
    # tile 2: a empty (2%2=0... a empty at even), b data (2//2=1 odd) -> data
    assert not np.isnan(tiles[2]).any()
    # tile 0: both empty -> nodata
    assert np.isnan(tiles[0]).all()
    # tile 3: both data -> sum (>= 40)
    assert (tiles[3] >= 40).all()


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, k=3, n_lists=16, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random vectors = worst case for IVF too; 6/16 lists probed
    assert recall >= 0.5, f"IVF recall {recall:.2f}"
    # determinism (seeded kmeans)
    approx2 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, k=3, n_lists=16, n_probe=6).collect()
    }
    assert approx == approx2


def test_ivf_det_recall_vs_bruteforce(spark):
    """Deterministic IVF (md5-seeded fixed-Lloyd quantizer, the registered
    oracle-checked path) keeps a recall floor vs exact brute force and is
    run-to-run deterministic."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_det(emb, k=3, n_lists=8, n_probe=2, iters=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 2/8 lists probed on random vectors (IVF worst case)
    assert recall >= 0.4, f"deterministic IVF recall {recall:.2f}"
    approx2 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_det(emb, k=3, n_lists=8, n_probe=2, iters=2).collect()
    }
    assert approx == approx2


def test_ivf_two_level_probe(spark):
    """Hierarchical (coarse-of-coarse) probe: (a) probing ALL coarse groups
    reproduces the flat path exactly; (b) a real 2-of-sqrt probe keeps a
    recall floor vs exact; (c) the plan stays equi-join only — no cartesian
    or nested-loop join anywhere."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

    flat = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk_det(emb, k=3, n_lists=9, n_probe=2, iters=2).collect()
    }
    # coarse_probe >= n_coarse => candidate set is every list => identical
    full = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk_det(
            emb, k=3, n_lists=9, n_probe=2, iters=2,
            two_level=True, n_coarse=3, coarse_probe=3,
        ).collect()
    }
    assert full == flat

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    df = ivf_topk_det(
        emb, k=3, n_lists=9, n_probe=2, iters=2,
        two_level=True, n_coarse=3, coarse_probe=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    approx = {(r.query_id, r.neighbor_id) for r in df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"two-level IVF recall {recall:.2f}"
    # deterministic across runs
    again = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_det(
            emb, k=3, n_lists=9, n_probe=2, iters=2,
            two_level=True, n_coarse=3, coarse_probe=2,
        ).collect()
    }
    assert approx == again


def test_ivf_params_switch_to_two_level():
    """Web-scale corpora get hierarchical-probe params; small ones stay flat."""
    big = ivf_params_for(10**12)
    assert big["two_level"] and big["n_coarse"] >= 1000
    assert big["two_level_assign"]  # assignment is hierarchical too (r4 ask)
    assert "two_level" not in ivf_params_for(500)


def test_two_level_assignment_equals_flat(spark):
    """Hierarchical ASSIGNMENT (branch-and-bound over coarse groups with the
    triangle-inequality radius band) must agree with the flat argmax on
    every vector — on the driver fixture AND on an adversarial clustered set
    whose groups overlap (where a bound bug would misassign)."""
    import numpy as np
    import pandas as pd

    from openeo_geotrellis_extensions_spark.pipeline.similarity import (
        _assign_two_level_udf,
        _assign_udf,
        _list_score_matrix,
        _quantize_rows,
        coarse_of_coarse,
        ivf_centroids_det,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    C = ivf_centroids_det(emb, n_lists=9, iters=2)
    Cc, group_of = coarse_of_coarse(C, 3)
    got = emb.select(
        "vec_id",
        _assign_udf(C)(F.col("embedding")).alias("flat"),
        _assign_two_level_udf(C, Cc, group_of)(F.col("embedding")).alias("two"),
    ).collect()
    assert got and all(r.flat == r.two for r in got)

    # adversarial: overlapping clusters + near-tie vectors, checked against
    # a direct numpy argmax (no Spark, exercises the pruning band hard)
    rng = np.random.RandomState(11)
    C2 = np.floor(rng.uniform(-3, 3, (24, 6)) * 1e6)
    C2[7] = C2[19] + 1.0  # nearly coincident fine centroids across groups
    Cc2, g2 = coarse_of_coarse(C2, 5)
    V = rng.uniform(-3, 3, (500, 6)).astype(np.float64)
    series = pd.Series(list(V))
    # .func = the raw python function behind the pandas_udf wrapper
    two = _assign_two_level_udf(C2, Cc2, g2).func(series).to_numpy()
    S = _list_score_matrix(_quantize_rows(series), C2)
    flat = np.argmax(S, axis=1)
    assert (two == flat).all()


def test_ivf_hier_assign_end_to_end_matches_flat(spark):
    """two_level_assign=True changes only WHERE assignment cost is spent —
    results are identical to the flat path (the registered ivf_ann_hier
    query rides this equality through its flat-SQL oracle)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    flat = {
        tuple(r)
        for r in ivf_topk_det(emb, k=3, n_lists=9, n_probe=2, iters=2).collect()
    }
    hier = {
        tuple(r)
        for r in ivf_topk_det(
            emb, k=3, n_lists=9, n_probe=2, iters=2,
            two_level_assign=True,
        ).collect()
    }
    assert flat == hier


def test_bruteforce_query_guard(spark):
    """cosine_topk_bruteforce refuses oversized query sides (the O(n*q)
    theta-join is an exact-rerank primitive, not a scale path)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    with pytest.raises(ValueError, match="query side"):
        cosine_topk_bruteforce(emb, k=3, max_queries=10)
    # explicit opt-out still works
    assert cosine_topk_bruteforce(
        emb.limit(30), k=1, max_queries=None
    ).count() == 30


def test_ivf_params_for_scaling():
    p = ivf_params_for(10**12)
    assert p["n_lists"] >= 10**5  # lists stay bounded-size at web scale
    assert p["n_probe"] >= 2
    small = ivf_params_for(500)
    assert 2 <= small["n_lists"] <= 32
