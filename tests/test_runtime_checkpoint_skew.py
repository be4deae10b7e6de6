"""Checkpoint-resume per partition (manifest skip + crash recovery) and
salting for skewed cells (north_rule requirements)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.operators.spatial_join import (
    cell_for_point_col,
)
from openeo_geotrellis_extensions_spark.runtime.checkpoint import (
    MANIFEST,
    ResumableWriter,
)
from openeo_geotrellis_extensions_spark.runtime.skew import (
    salt_counts,
    salted_agg,
    with_salt,
)
from openeo_geotrellis_extensions_spark.sources.interleaved import (
    extract_geometries,
    synth_docs,
)


@pytest.fixture()
def docs_cells(spark):
    docs = synth_docs(spark, 500)
    geo = extract_geometries(docs).groupBy("doc_id").agg(
        F.first("xmin").alias("x"), F.first("ymin").alias("y")
    )
    return geo.withColumn(
        "cell", cell_for_point_col(3, F.col("x"), F.col("y"))
    ).withColumn("bucket", F.col("cell").cast("string"))


def test_salting_splits_hot_cell(spark, docs_cells):
    """~20% of docs share the hot cell; with target=20 rows/salt the hot cell
    must get multiple deterministic salt slots, cold cells exactly one."""
    sc = salt_counts(docs_cells, "cell", target_rows_per_salt=20)
    rows = {r.cell: r.n_salt for r in sc.collect()}
    assert max(rows.values()) >= 5  # hot cell split
    salted = with_salt(docs_cells, "cell", "doc_id", 20)
    hot_cell = max(rows, key=rows.get)
    hot = salted.where(F.col("cell") == hot_cell)
    per_salt = hot.groupBy("salt").count().collect()
    assert len(per_salt) == rows[hot_cell]
    # deterministic across runs
    a = sorted((r.salt, r["count"]) for r in per_salt)
    b = sorted(
        (r.salt, r["count"])
        for r in with_salt(docs_cells, "cell", "doc_id", 20)
        .where(F.col("cell") == hot_cell)
        .groupBy("salt")
        .count()
        .collect()
    )
    assert a == b


def test_salted_agg_matches_plain(spark, docs_cells):
    plain = {
        (r.cell): (r.n, round(r.sx, 6))
        for r in docs_cells.groupBy("cell")
        .agg(F.count("*").alias("n"), F.sum("x").alias("sx"))
        .collect()
    }
    salted = {
        (r.cell): (r.n, round(r.sx, 6))
        for r in salted_agg(
            docs_cells,
            ["cell"],
            [
                (F.count("*").alias("pn"), lambda: F.sum("pn").alias("n")),
                (F.sum("x").alias("psx"), lambda: F.sum("psx").alias("sx")),
            ],
            id_col="doc_id",
            target_rows_per_salt=20,
        ).collect()
    }
    assert plain == salted


def test_resumable_writer_full_and_resume(spark, docs_cells, tmp_path):
    out = str(tmp_path / "run1")
    w = ResumableWriter(out, lineage={"source": "synth_docs(500)", "stage": "cells"})
    s1 = w.run(docs_cells)
    assert s1["written"] > 0 and s1["skipped"] == 0
    total = spark.read.parquet(out).count()
    assert total == 500

    # re-run: everything skipped, nothing rewritten, data unchanged
    s2 = ResumableWriter(out).run(docs_cells)
    assert s2["written"] == 0 and s2["skipped"] == s1["written"]
    assert spark.read.parquet(out).count() == 500


def test_resumable_writer_crash_recovery(spark, docs_cells, tmp_path):
    out = str(tmp_path / "run2")
    w = ResumableWriter(out)
    s1 = w.run(docs_cells)

    # simulate a crash: drop 2 buckets from the manifest AND corrupt one of
    # their directories (partial write)
    mpath = os.path.join(out, MANIFEST)
    lines = [json.loads(line) for line in open(mpath) if line.strip()]
    assert len(lines) == s1["written"]
    victims = [lines[0]["bucket"], lines[1]["bucket"]]
    keep = [l for l in lines if l["bucket"] not in victims]
    with open(mpath, "w") as f:
        for l in keep:
            f.write(json.dumps(l) + "\n")
    shutil.rmtree(os.path.join(out, f"bucket={victims[0]}"))  # lost entirely
    # victims[1] dir still exists but is un-manifested -> treated as partial

    s2 = ResumableWriter(out).run(docs_cells)
    assert s2["written"] == 2 and s2["skipped"] == len(keep)
    assert spark.read.parquet(out).count() == 500  # no dupes, no gaps
    # metrics recorded for both attempts
    assert len(ResumableWriter(out).metrics()) == 2


def test_manifest_lineage_and_metrics_fields(spark, docs_cells, tmp_path):
    out = str(tmp_path / "run3")
    w = ResumableWriter(out, lineage={"source": "docs", "transform": "cells@res3"})
    w.run(docs_cells)
    recs = [json.loads(line) for line in open(os.path.join(out, MANIFEST))]
    assert all(
        r["lineage"]["transform"] == "cells@res3" and r["rows"] > 0 and r["attempt"]
        for r in recs
    )
    m = w.metrics()[0]
    assert m["rows"] == 500 and m["rows_per_sec"] > 0


def test_zindex_col_matches_numpy_and_writer_clusters(spark, tmp_path):
    """zindex_col == core.grid.zindex bit-for-bit; ResumableWriter(order_by=
    zindex) lays each bucket file out in Z-order (monotone key per file)."""
    import numpy as np
    from pyspark.sql import functions as F

    from openeo_geotrellis_extensions_spark.core.grid import zindex
    from openeo_geotrellis_extensions_spark.operators.spatial_join import (
        zindex_col,
    )
    from openeo_geotrellis_extensions_spark.runtime.checkpoint import (
        ResumableWriter,
    )

    df = spark.range(2000).select(
        (F.col("id") % 53).cast("int").alias("c"),
        (F.col("id") * 7 % 41).cast("int").alias("r"),
    ).withColumn("z", zindex_col(F.col("c"), F.col("r")))
    got = df.collect()
    want = zindex([r.c for r in got], [r.r for r in got])
    assert [r.z for r in got] == list(want)

    bucketed = df.withColumn("bucket", (F.col("c") % 4).cast("string"))
    out_dir = str(tmp_path / "zw")
    ResumableWriter(out_dir, order_by=("z",)).run(bucketed)
    back = spark.read.parquet(out_dir)
    # within each written file, z must be monotone nondecreasing
    files = back.select(
        F.input_file_name().alias("f"), "z"
    ).toPandas()
    for _, grp in files.groupby("f"):
        zs = grp["z"].to_list()
        assert zs == sorted(zs)
