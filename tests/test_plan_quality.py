"""Physical-plan quality gates (SURVEY §4): predicate pushdown reaches
parquet scans, relational pipeline ops stay JVM-side (no Python eval nodes),
small sides broadcast, aggregations are partial+final."""

import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.operators.filters import (
    filter_bbox,
    filter_temporal,
)
from openeo_geotrellis_extensions_spark.pipeline.dedup import dedup_exact
from openeo_geotrellis_extensions_spark.pipeline.text import (
    lang_id,
    quality_scores,
    token_counts,
)
from openeo_geotrellis_extensions_spark.sources.datacube import (
    DataCube,
    CubeMeta,
    constant_cube,
)

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), 4, 4, 8, 8)
SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parquet_cube(spark, tmp_path_factory):
    """Cube persisted to parquet — scans must receive pushed filters."""
    p = str(tmp_path_factory.mktemp("cube") / "cube.parquet")
    constant_cube(spark, LAYOUT).df.write.parquet(p)
    df = spark.read.parquet(p)
    return DataCube(df, CubeMeta(LAYOUT, "uint8ud255", ("band0", "band1")))


def test_key_filters_push_to_parquet_scan(spark, parquet_cube):
    out = filter_bbox(parquet_cube, Extent(0.1, 0.1, 0.9, 0.9))
    plan = plan_of(out.df)
    assert "PushedFilters" in plan
    # col/row predicates reached the scan (not just post-scan Filter)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "col" in pushed and "row" in pushed and "IsNotNull" in pushed

    out2 = filter_temporal(parquet_cube, "2017-01-01", "2017-02-01")
    pushed2 = [l for l in plan_of(out2.df).splitlines() if "PushedFilters" in l][0]
    assert "time" in pushed2


def test_relational_ops_have_no_python_nodes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in [
        dedup_exact(docs, "text", "doc_id"),
        lang_id(quality_scores(token_counts(docs))),
    ]:
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapsInPandas" not in plan


def test_dedup_agg_is_partial_final(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = plan_of(dedup_exact(ev, "props", "event_id"))
    assert "HashAggregate" in plan  # map-side partial + final


def test_column_pruning_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(docs.select("doc_id"))
    sched = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in sched and "text" not in sched  # only needed column read


def test_spatial_join_broadcasts_cover(spark):
    import __spark_entry__ as m

    df = m.queries()["spatial_join"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # small feature side never sort-merges


def test_embedding_queries_have_no_cartesian(spark):
    """The registered embedding near-dup and ANN queries must be bucket
    equi-joins — no BroadcastNestedLoopJoin / CartesianProduct anywhere
    (the round-1 scale-killer)."""
    import __spark_entry__ as m

    for q in ["embedding_near_dups", "lsh_ann"]:
        df = m.queries()[q](spark, "/root/testdata/sf0.001")
        plan = plan_of(df)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_minhash_verify_scans_only_candidates(spark):
    """The exact-Jaccard verify stage must semi-join the corpus down to
    candidate ids BEFORE tokenizing/intersecting (round-1 fix). Since r6
    the candidate-gram table is materialized with a lazy localCheckpoint
    (whose subtree is compiled into an RDD lineage the outer plan string
    does not show), so the gate asserts the LeftSemi on the
    UN-checkpointed building block the verify uses."""
    from pyspark.sql import functions as F

    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        _candidate_grams,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = docs.select(F.col("doc_id").alias("id")).limit(3)
    plan = plan_of(_candidate_grams(docs, ids, "text", "doc_id", 3, None))
    assert "LeftSemi" in plan
    # and the semi-join sits BELOW the tokenize (Generate): candidate
    # scoping happens before any gram is produced
    gen_pos = plan.index("Generate")
    semi_pos = plan.index("LeftSemi")
    assert semi_pos > gen_pos  # tree prints top-down: LeftSemi deeper


def test_no_unjustified_cartesian_in_any_registered_query(spark):
    """Sweep EVERY registered query plan: CartesianProduct is banned
    outright; BroadcastNestedLoopJoin is allowed only where the broadcast
    side is O(1) by construction (allowlisted + justified below)."""
    import __spark_entry__ as m

    bnlj_ok = {
        "knn_cosine",          # exact rerank primitive: bounded 20-query side
        "ivf_ann",             # crossJoin(broadcast(centroids)), n_lists=16 rows
        "tfidf",               # crossJoin(broadcast(N)), a single scalar row
        "unigram_lm",          # crossJoin(broadcast(totals)), one scalar row
        "bigram_lm",           # crossJoin(broadcast(totals)), one scalar row
        "zonal_stats_const",   # dense restore: crossJoin of tiny date/band dims
        "zonal_stats_arith",   # dense restore: crossJoin of tiny date/band dims
        "media_zonal",         # dense restore: crossJoin of tiny date/band dims
        "zonal_weighted",      # dense restore: crossJoin of tiny date/band dims
        "hist_quantiles",      # crossJoin(broadcast(totals)), a single scalar row
        "aggregate_temporal",  # dense interval fill: tiny interval dim
        "mask_polygon",        # crossJoin(broadcast(ONE row of collected feats))
    }
    streaming = {"stream_windowed", "stream_dedup_stateful"}  # plans materialize in sinks
    for name, fn in m.queries().items():
        if name in streaming:
            continue
        plan = plan_of(fn(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, name
        if name not in bnlj_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name
