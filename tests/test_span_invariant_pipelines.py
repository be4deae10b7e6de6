"""Span-sequence invariant THROUGH pipeline stages (BASELINE input_hint:
per-row (kind, text, media_ref, order) equality preserved at every stage).

Every stage output carries (doc_id, span_idx); re-attaching outputs to the
original span table and re-assembling must reproduce the source fingerprints
exactly — proving no stage dropped, duplicated, or reordered spans."""

import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.operators.spatial_join import (
    cell_for_point_col,
    spatial_join_points,
)
from openeo_geotrellis_extensions_spark.runtime.checkpoint import ResumableWriter
from openeo_geotrellis_extensions_spark.sources.interleaved import (
    explode_spans,
    extract_geometries,
    reassemble_fingerprints,
    span_fingerprints,
    synth_docs,
)

N = 300


@pytest.fixture(scope="module")
def docs(spark):
    return synth_docs(spark, N).cache()


def _assert_invariant(docs, exploded_subset):
    """Re-attach a stage output (doc_id, span_idx) to the full span table and
    re-assemble: fingerprints must equal the source for every touched doc."""
    full = explode_spans(docs)
    touched = exploded_subset.select("doc_id").distinct()
    back = reassemble_fingerprints(full.join(touched, "doc_id", "left_semi"))
    orig = span_fingerprints(docs).join(touched, "doc_id", "left_semi")
    diff = orig.alias("o").join(back.alias("b"), "doc_id").where(
        F.col("o.span_fp") != F.col("b.span_fp")
    )
    assert diff.count() == 0
    assert back.count() == touched.count()


def test_invariant_through_spatial_join(spark, docs):
    geo = extract_geometries(docs).select(
        "doc_id", "span_idx",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("rep_x"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("rep_y"),
    )
    feats = spark.createDataFrame(
        [(0, '{"type": "Polygon", "coordinates": [[[-180, -90], [180, -90], [180, 90], [-180, 90], [-180, -90]]]}')],
        ["feature_index", "geojson"],
    )
    joined = spatial_join_points(geo, feats, res=5)
    # join output identifies spans uniquely per feature
    dupes = joined.groupBy("doc_id", "span_idx", "feature_index").count().where("count > 1")
    assert dupes.count() == 0
    _assert_invariant(docs, joined)


def test_invariant_through_checkpoint_write(spark, docs, tmp_path):
    geo = extract_geometries(docs)
    cells = geo.withColumn(
        "bucket",
        cell_for_point_col(3, F.col("rep_x"), F.col("rep_y")).cast("string"),
    ).select("doc_id", "span_idx", "bucket")
    out = str(tmp_path / "inv")
    ResumableWriter(out).run(cells)
    written = spark.read.parquet(out)
    # written rows are exactly the geometry spans, no dupes/losses
    assert written.count() == geo.count()
    _assert_invariant(docs, written)


def test_invariant_detects_corruption(spark, docs):
    """The check itself must FAIL when a span is dropped (not vacuous)."""
    full = explode_spans(docs)
    corrupted = full.where(~((F.col("doc_id") == "doc_00000007") & (F.col("span_idx") == 0)))
    back = reassemble_fingerprints(corrupted)
    orig = span_fingerprints(docs)
    diff = orig.alias("o").join(back.alias("b"), "doc_id").where(
        F.col("o.span_fp") != F.col("b.span_fp")
    )
    assert diff.count() == 1
