#!/usr/bin/env python
"""Benchmark harness — headline pipelines at SPARK_GRAFT_SF_DIR on
local[SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline (BASELINE.md): spatial-join + tiling throughput (docs/sec) over the
interleaved-document table, and zonal-stats (aggregate_spatial) wall-time on
the datacube assembled from its media spans.

``python bench.py --scaling`` additionally runs the identical job at two
parallelism levels (local[8] vs local[32]) and writes BENCH/BASELINE.md with
throughput at both + scaling efficiency (the sandbox proxy for N vs 4N
executors per BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: interleaved docs per `documents` row — sf0.1 -> 200k docs (~700k spans)
DOCS_MULTIPLIER = int(os.environ.get("SPARK_GRAFT_DOCS_MULT", "40"))


def build_spark(cpus: int) -> SparkSession:
    from openeo_geotrellis_extensions_spark.runtime.session import get_spark

    return get_spark(
        app_name=f"bench-local[{cpus}]",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def run_pipelines(spark: SparkSession, n_docs: int) -> dict[str, float]:
    """The two headline pipelines; returns per-stage wall seconds."""
    import __spark_entry__ as m
    from openeo_geotrellis_extensions_spark.operators.spatial_join import (
        spatial_join_points,
    )
    from openeo_geotrellis_extensions_spark.operators.zonal import aggregate_spatial
    from openeo_geotrellis_extensions_spark.sources.datacube import media_cube
    from openeo_geotrellis_extensions_spark.sources.interleaved import (
        extract_geometries,
        synth_docs,
    )

    timings: dict[str, float] = {}
    docs = synth_docs(spark, n_docs)

    # -- spatial join + tiling: docs -> geometries -> cell join + PIP ------
    t0 = time.time()
    geo = extract_geometries(docs).select(
        "doc_id",
        "span_idx",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("rep_x"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("rep_y"),
    )
    feats = m._features_df(spark, m.RECT_FEATURES)
    joined = spatial_join_points(geo, feats, res=7)
    n_joined = joined.count()
    timings["spatial_join_tiling"] = time.time() - t0
    timings["_joined_rows"] = float(n_joined)

    # -- zonal stats over the media-span datacube --------------------------
    t0 = time.time()
    cube = media_cube(docs, tile_size=16)
    zfeats = m._features_df(
        spark,
        [(0, 3.89995, 50.59995, 4.80005, 51.50005), (1, -180.0, -90.0, 180.0, 90.0)],
    )
    stats = aggregate_spatial(cube, zfeats)
    n_stats = stats.count()
    timings["zonal_stats"] = time.time() - t0
    timings["_stat_rows"] = float(n_stats)
    return timings


def bench_once(cpus: int, n_docs: int) -> dict[str, float]:
    spark = build_spark(cpus)
    try:
        return run_pipelines(spark, n_docs)
    finally:
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    n_docs = n_rows * DOCS_MULTIPLIER

    if "--scaling" in sys.argv:
        levels = [8, 32]
        results = {}
        for cpus in levels:
            t = bench_once(cpus, n_docs)
            thr = n_docs / t["spatial_join_tiling"]
            results[cpus] = {"timings": t, "docs_per_sec": thr}
        lo, hi = levels
        eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH — two-parallelism scaling evidence\n\n"
                f"Input: interleaved table, {n_docs} docs (sf={sf}, "
                f"DOCS_MULT={DOCS_MULTIPLIER}); identical job at both levels "
                "(sandbox proxy for N vs 4N executors, BASELINE.json north_rule).\n\n"
                "| parallelism | spatial_join+tiling sec | docs/sec | zonal_stats sec |\n"
                "|---|---|---|---|\n"
            )
            for cpus in levels:
                t = results[cpus]["timings"]
                f.write(
                    f"| local[{cpus}] | {t['spatial_join_tiling']:.2f} | "
                    f"{results[cpus]['docs_per_sec']:.0f} | {t['zonal_stats']:.2f} |\n"
                )
            f.write(
                f"\nScaling efficiency local[{lo}]->local[{hi}]: "
                f"(T_{lo}/T_{hi})/{hi // lo} = **{eff:.3f}** "
                f"(target >= 0.8 per BASELINE.json; >=0.25 means any speedup, "
                f"1.0 = perfect linear).\n"
            )
        print(json.dumps({"scaling_efficiency": eff, "results": {
            str(k): {kk: vv for kk, vv in v["timings"].items()} for k, v in results.items()
        }}))
        return

    t = bench_once(CPUS, n_docs)
    queries = {k: round(v, 3) for k, v in t.items() if not k.startswith("_")}
    total = sum(queries.values())
    out = {
        "metric": "spatial_join_tiling+zonal_stats_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / t["spatial_join_tiling"], 1),
        "joined_rows": int(t["_joined_rows"]),
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
