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


def run_pipelines(
    spark: SparkSession, n_docs: int, include_dedup: bool = True
) -> dict[str, float]:
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

    # -- LLM-pipeline path: MinHash-LSH near-dups -> duplicate groups ------
    # (VERDICT r4 ask #5: the geo headline was blind to dedup/similarity
    # perf; this composite tracks the registered minhash_lsh+dedup_groups
    # path at the REAL documents table of SF_DIR, fixed size per sf)
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    if include_dedup:
        t0 = time.time()
        docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pairs = minhash_lsh_pairs(
            docs_tbl, num_hashes=16, bands=4, verify_threshold=0.5
        )
        n_grouped = connected_components(pairs).count()
        timings["dedup_wall"] = time.time() - t0
        timings["_dedup_grouped_ids"] = float(n_grouped)

    # -- salted checkpoint-resumable cell write (north_rule features) ------
    import shutil
    import tempfile

    from openeo_geotrellis_extensions_spark.operators.spatial_join import (
        cell_for_point_col,
    )
    from openeo_geotrellis_extensions_spark.runtime.checkpoint import ResumableWriter
    from openeo_geotrellis_extensions_spark.runtime.skew import with_salt

    t0 = time.time()
    out_dir = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        cells = geo.withColumn(
            "cell", cell_for_point_col(4, F.col("rep_x"), F.col("rep_y"))
        )
        salted = with_salt(cells, "cell", "doc_id", target_rows_per_salt=50_000)
        bucketed = salted.withColumn(
            "bucket", F.concat_ws("_", F.col("cell"), F.col("salt"))
        )
        summary = ResumableWriter(
            out_dir, lineage={"stage": "bench_cell_write"}
        ).run(bucketed)
        timings["salted_ckpt_write"] = time.time() - t0
        timings["_buckets"] = float(summary["written"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return timings


def bench_once(
    cpus: int,
    n_docs: int,
    warmup: bool = True,
    repeats: int = 5,
    include_dedup: bool = True,
) -> dict[str, float]:
    """Warmup pass (spawns/reuses Python UDF workers) then ``repeats`` timed
    runs, reporting the per-stage minimum — this host shows heavy
    run-to-run noise from neighbors, so min is the least-contended sample."""
    spark = build_spark(cpus)
    try:
        if warmup:
            run_pipelines(spark, max(2000, n_docs // 100), include_dedup=False)
        runs = [
            run_pipelines(spark, n_docs, include_dedup=include_dedup)
            for _ in range(repeats)
        ]
        return {k: min(r[k] for r in runs) for k in runs[0]}
    finally:
        spark.stop()


def _bench_subprocess(cpus: int, n_docs: int) -> dict[str, float]:
    """Fresh interpreter + JVM per parallelism level — no carryover."""
    import json as _json
    import subprocess
    import sys as _sys

    code = (
        "import json, sys; sys.path.insert(0, '/root/repo');\n"
        "import bench\n"
        "print('BENCHJSON ' + json.dumps("
        f"bench.bench_once({cpus}, {n_docs}, include_dedup=False)))\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCHJSON "):
            return _json.loads(line[len("BENCHJSON "):])
    raise RuntimeError(f"bench subprocess failed: {out.stderr[-2000:]}")


def zorder_ab() -> dict:
    """A/B: does Z-order clustering in the checkpoint writer pay at read
    time? Writes the same (c, r, payload) dataset twice via ResumableWriter
    — order_by=zindex vs unordered — with small parquet row groups (the
    100 TB shape: many row groups per file), then runs an identical
    (c, r) window range-scan on both. Reports the stats-prunable row-group
    fraction (parquet footer min/max vs the predicate, what any
    stats-pruning scan engine skips) and the Spark wall time."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from openeo_geotrellis_extensions_spark.operators.spatial_join import zindex_col
    from openeo_geotrellis_extensions_spark.runtime.checkpoint import ResumableWriter

    spark = build_spark(CPUS)
    # small row groups => many groups per bucket file, the 100 TB shape
    # (must go on the Hadoop conf: session conf is ignored by the writer)
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(256 * 1024)
    )
    base = tempfile.mkdtemp(prefix="bench_zorder_")
    try:
        n = 4_000_000
        df = (
            spark.range(n)
            .select(
                (F.pmod(F.xxhash64("id"), F.lit(4096))).cast("int").alias("c"),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4096))).cast("int").alias("r"),
                F.col("id").alias("payload"),
            )
            .withColumn("z", zindex_col(F.col("c"), F.col("r")))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("payload", F.lit(2)), F.lit(8)).cast("string")
            )
        )
        outs = {}
        for name, order in [("zordered", ("z",)), ("unordered", ())]:
            out = f"{base}/{name}"
            ResumableWriter(out, order_by=order).run(df)
            outs[name] = out

        # predicate: a 256x256 window = (1/16)^2 of the key space
        lo, hi = 1024, 1279
        pred = (
            f"c BETWEEN {lo} AND {hi} AND r BETWEEN {lo} AND {hi}"
        )
        report = {}
        for name, out in outs.items():
            groups = total = 0
            for root, _d, files in os.walk(out):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(os.path.join(root, fn)).metadata
                    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                    for g in range(md.num_row_groups):
                        rg = md.row_group(g)
                        total += 1
                        sc = rg.column(idx["c"]).statistics
                        sr = rg.column(idx["r"]).statistics
                        if sc.max < lo or sc.min > hi or sr.max < lo or sr.min > hi:
                            groups += 1  # prunable by stats
            # warm + timed scan
            q = lambda: spark.read.parquet(out).where(pred).agg(  # noqa: E731
                F.count("*"), F.sum("payload")
            ).collect()
            q()
            t0 = time.time()
            for _ in range(3):
                q()
            report[name] = {
                "row_groups": total,
                "prunable": groups,
                "prunable_frac": round(groups / max(1, total), 4),
                "scan_sec_3x": round(time.time() - t0, 3),
            }
        return report
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def skew_ab() -> dict:
    """A/B: salting under a pathological hot cell (90% of rows in ONE cell).
    Identical input written via ResumableWriter with bucket=cell (unsalted:
    one task carries 90% of the write) vs bucket=cell_salt (with_salt
    spreads the hot cell). Reports wall seconds for each."""
    import shutil
    import tempfile

    from openeo_geotrellis_extensions_spark.runtime.checkpoint import ResumableWriter
    from openeo_geotrellis_extensions_spark.runtime.skew import with_salt

    spark = build_spark(CPUS)
    base = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        n = 4_000_000
        # 90% of rows land in cell 0; the rest spread over 63 cold cells
        df = spark.range(n).select(
            F.col("id").cast("string").alias("doc_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(63)) + 1)
            .cast("int")
            .alias("cell"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        report = {}
        for name in ["unsalted", "salted"]:
            if name == "salted":
                d = with_salt(df, "cell", "doc_id", target_rows_per_salt=150_000)
                d = d.withColumn(
                    "bucket", F.concat_ws("_", F.col("cell"), F.col("salt"))
                )
            else:
                d = df.withColumn("bucket", F.col("cell").cast("string"))
            out = f"{base}/{name}"
            t0 = time.time()
            s = ResumableWriter(out).run(d)
            report[name] = {
                "wall_sec": round(time.time() - t0, 3),
                "buckets": s["written"],
            }
        report["speedup"] = round(
            report["unsalted"]["wall_sec"] / report["salted"]["wall_sec"], 2
        )
        return report
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def simhash_ab() -> dict:
    """A/B for the r4 perf-weak fix: SimHash pigeonhole band-key width.
    32-bit signatures at radius 3 give 8-bit band keys (256 distinct values
    per band -> the candidate equi-join degenerates toward N^2/256); 64-bit
    give 16-bit keys. Reports candidate-pair volume and wall seconds for
    both widths over the real documents table, plus the surviving
    (verified) pair counts — recall is guaranteed within the radius at ANY
    width, so survivors differ only because the wider signature separates
    non-near docs better."""
    from openeo_geotrellis_extensions_spark.pipeline.dedup import (
        simhash_band_candidates,
        simhash_near_pairs,
    )

    spark = build_spark(CPUS)
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
        n_docs = docs.count()
        report: dict = {"n_docs": n_docs}
        for bits in (32, 64):
            t0 = time.time()
            cand = simhash_band_candidates(docs, max_hamming=3, bits=bits).count()
            pairs = simhash_near_pairs(docs, max_hamming=3, bits=bits).count()
            report[f"bits{bits}"] = {
                "candidates": cand,
                "verified_pairs": pairs,
                "wall_sec": round(time.time() - t0, 3),
            }
        report["candidate_reduction"] = round(
            report["bits32"]["candidates"] / max(1, report["bits64"]["candidates"]), 1
        )
        return report
    finally:
        spark.stop()


def rangejoin_ab() -> dict:
    """A/B: bucketed interval join (operators/asof.py:interval_point_join)
    vs the raw inequality join Spark plans as a BroadcastNestedLoopJoin.
    KEYLESS global intervals make the comparison honest — with an equality
    key Spark would equi-join and post-filter, hiding the theta-join cost.
    points x intervals = |events| * 2000 predicate evaluations for the raw
    plan; the bucketed plan touches each point once and each interval
    span/width times. Same result set asserted."""
    from openeo_geotrellis_extensions_spark.operators.asof import (
        interval_point_join,
    )

    spark = build_spark(CPUS)
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_id", "ts"
        )
        base = 1704067200  # 2024-01-01T00:00:00Z
        iv = spark.range(2000).select(
            F.col("id").alias("interval_id"),
            F.timestamp_seconds(
                F.lit(base) + (F.col("id") * 337 % 700) * 3600
            ).alias("start"),
            F.timestamp_seconds(
                F.lit(base)
                + ((F.col("id") * 337 % 700) + F.col("id") % 5 + 1) * 3600
            ).alias("end"),
        )
        report = {}
        counts = {}
        for name in ("theta", "bucketed", "theta2", "bucketed2"):
            t0 = time.time()
            if name.startswith("theta"):
                n = ev.join(
                    iv,
                    (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")),
                ).count()
            else:
                n = interval_point_join(ev, iv, on=[]).count()
            counts[name] = n
            report[name] = round(time.time() - t0, 3)
        assert counts["theta"] == counts["bucketed"], counts
        out = {
            "theta_sec": min(report["theta"], report["theta2"]),
            "bucketed_sec": min(report["bucketed"], report["bucketed2"]),
            "rows": counts["bucketed"],
        }
        out["speedup"] = round(out["theta_sec"] / out["bucketed_sec"], 2)
        return out
    finally:
        spark.stop()


def ckpt_overhead_ab() -> dict:
    """A/B: what does checkpoint-resumability COST? The identical 4M-row
    bucketed dataset written (a) bare: repartition(bucket) +
    write.partitionBy, and (b) through ResumableWriter (adds the done-set
    read, count, file-listing diff, and the commit publication). Reports
    wall seconds for each — the delta is the price of resume + lineage."""
    import shutil
    import tempfile

    from openeo_geotrellis_extensions_spark.runtime.checkpoint import ResumableWriter

    spark = build_spark(CPUS)
    base = tempfile.mkdtemp(prefix="bench_ckpt_ovh_")
    try:
        n = 4_000_000
        df = spark.range(n).select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.pmod(F.xxhash64("id"), F.lit(64)).cast("string").alias("bucket"),
        )
        # alternate A B A B (fresh out dirs) and take min per variant: the
        # first write of a session pays JVM/codegen warmup whoever runs it
        times: dict[str, list[float]] = {"bare": [], "resumable": []}
        for rep in range(2):
            for name in ["bare", "resumable"]:
                out = f"{base}/{name}_{rep}"
                t0 = time.time()
                if name == "bare":
                    (
                        df.repartition(F.col("bucket"))
                        .write.mode("append")
                        .partitionBy("bucket")
                        .parquet(out)
                    )
                else:
                    ResumableWriter(out).run(df)
                times[name].append(round(time.time() - t0, 3))
        report = {
            "bare": min(times["bare"]),
            "resumable": min(times["resumable"]),
            "all_trials": times,
        }
        report["overhead_pct"] = round(
            (report["resumable"] / report["bare"] - 1.0) * 100.0, 1
        )
        return report
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    n_docs = n_rows * DOCS_MULTIPLIER

    if "--ckpt-overhead-ab" in sys.argv:
        print(json.dumps({"ckpt_overhead_ab": ckpt_overhead_ab()}))
        return
    if "--simhash-ab" in sys.argv:
        print(json.dumps({"simhash_ab": simhash_ab()}))
        return
    if "--rangejoin-ab" in sys.argv:
        print(json.dumps({"rangejoin_ab": rangejoin_ab()}))
        return
    if "--zorder-ab" in sys.argv:
        print(json.dumps({"zorder_ab": zorder_ab()}))
        return
    if "--skew-ab" in sys.argv:
        print(json.dumps({"skew_ab": skew_ab()}))
        return
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
        hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "8"))
        xhi = int(os.environ.get("SPARK_GRAFT_SCALE_XHI", "32"))
        trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))  # each trial is itself min-of-2 runs
        # compute-bound workload for the scaling claim: 5x the per-round size
        scale_mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "200"))
        n_docs = n_rows * scale_mult
        levels = [lo, hi, xhi]
        results = {}
        for cpus in levels:
            runs = [_bench_subprocess(cpus, n_docs) for _ in range(trials)]
            # min-of-trials: this sandbox shows heavy run-to-run noise
            # (shared host); the minimum is the least-contended measurement
            best = {
                k: min(r[k] for r in runs)
                for k in runs[0]
                if not k.startswith("_")
            }
            results[cpus] = {
                "timings": best,
                "all_trials": [
                    {k: round(v, 2) for k, v in r.items() if not k.startswith("_")}
                    for r in runs
                ],
                "docs_per_sec": n_docs / best["spatial_join_tiling"],
            }

        def eff(a: int, b: int) -> float:
            return (results[b]["docs_per_sec"] / results[a]["docs_per_sec"]) / (b / a)

        eff_main = eff(lo, hi)
        eff_sat = eff(hi, xhi)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH — multi-parallelism scaling evidence\n\n"
                f"Input: interleaved table, {n_docs} docs "
                f"(sf={sf}, documents rows x{scale_mult}); the identical job "
                f"at local[{lo}] / local[{hi}] / local[{xhi}] in fresh "
                "interpreter+JVM subprocesses with a warmup pass (sandbox "
                "proxy for N vs 4N executors, BASELINE.json north_rule). "
                "NOTE: the per-round driver bench (BENCH_rN.json) uses the "
                f"SAME sf but a smaller multiplier (x{DOCS_MULTIPLIER} -> "
                f"{n_rows * DOCS_MULTIPLIER} docs) — doc counts differ by "
                "design; compare docs/sec, not wall seconds. This host shows "
                f"heavy run-to-run noise, so each level reports the minimum "
                f"of {trials} trials (all trials listed below).\n\n"
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
                f"(T_{lo}/T_{hi})/{hi // lo} = **{eff_main:.3f}** "
                f"(target >= 0.8 per BASELINE.json; 1.0 = perfect linear).\n\n"
                f"Saturation evidence local[{hi}]->local[{xhi}]: efficiency "
                f"**{eff_sat:.3f}** — single-JVM Spark on this host stops "
                f"scaling past ~{hi} threads (raw-CPU multiprocessing probes "
                f"DO scale near-linearly to {xhi} procs, so the ceiling is "
                "JVM/memory-bandwidth, not cores). That is why the N->4N "
                f"window for the north_rule claim is {lo}->{hi}, where "
                "hardware parallelism is genuinely available.\n\n"
                "All trials (sec):\n\n"
            )
            for cpus in levels:
                f.write(f"- local[{cpus}]: {json.dumps(results[cpus]['all_trials'])}\n")
        print(json.dumps({
            "scaling_efficiency": round(eff_main, 3),
            "saturation_efficiency": round(eff_sat, 3),
            "n_docs": n_docs,
            "results": {str(k): v["all_trials"] for k, v in results.items()},
        }))
        return

    t = bench_once(CPUS, n_docs, warmup=True)
    queries = {k: round(v, 3) for k, v in t.items() if not k.startswith("_")}
    # headline total = the three stages tracked since r1, so BENCH_rN totals
    # stay comparable round-over-round; dedup_wall (added r5) is reported
    # per-stage in queries{} without inflating the historical metric
    headline = ("spatial_join_tiling", "zonal_stats", "salted_ckpt_write")
    total = sum(queries[k] for k in headline if k in queries)
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
