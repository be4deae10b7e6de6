"""Checkpoint-resumable partitioned runs with per-partition lineage +
metrics (BASELINE north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Model: a run materializes a DataFrame into ``out_dir`` bucketed by a
partition column (typically a coarse spatial cell + salt for hot cells).
A manifest (JSON lines, atomic append via rename) records every COMPLETED
bucket with row count, wall time, attempt id, and a lineage descriptor.
Resume = recompute only buckets missing from the manifest; partially-written
bucket directories from a crashed attempt are removed first (idempotent
overwrite per bucket).

This is batch per-partition restart, not streaming state — matching the
reference's batch-only execution model (SURVEY §2.10).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_manifest.jsonl"
METRICS = "_metrics.jsonl"


@dataclass
class ResumableWriter:
    out_dir: str
    partition_col: str = "bucket"
    lineage: dict = field(default_factory=dict)
    #: optional clustering columns: rows are sortWithinPartitions'd on these
    #: before the write, so each bucket file is laid out in that order and
    #: parquet row-group min/max stats stay tight for downstream range scans
    #: (pass a Z-order key, e.g. operators.spatial_join.zindex_col, for
    #: spatial locality — the Delta OPTIMIZE ZORDER pattern)
    order_by: tuple = ()

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, MANIFEST)

    def completed_buckets(self) -> set[str]:
        path = self._manifest_path()
        done: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        done.add(json.loads(line)["bucket"])
        return done

    def _append_records(self, fname: str, records: list[dict]) -> None:
        """Atomic append: write tmp, concatenate, rename over."""
        path = os.path.join(self.out_dir, fname)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            if os.path.exists(path):
                with open(path) as old:
                    f.write(old.read())
            for r in records:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, path)

    # -- run -----------------------------------------------------------------
    def run(self, df: DataFrame) -> dict:
        """Write ``df`` (must contain ``partition_col``) bucket-partitioned,
        skipping buckets already in the manifest. Returns a summary dict.
        Safe to re-invoke after any crash."""
        os.makedirs(self.out_dir, exist_ok=True)
        attempt = uuid.uuid4().hex[:12]
        done = self.completed_buckets()
        pc = self.partition_col

        # stale partial bucket dirs (crashed attempt): remove before rewrite
        for name in os.listdir(self.out_dir):
            if name.startswith(f"{pc}="):
                bucket = name.split("=", 1)[1]
                if bucket not in done:
                    shutil.rmtree(os.path.join(self.out_dir, name))

        remaining = df
        if done:
            done_df = df.sparkSession.createDataFrame(
                [(b,) for b in sorted(done)], [pc]
            )
            remaining = df.join(F.broadcast(done_df), pc, "left_anti")

        t0 = time.time()
        # one shuffle: co-locate each bucket on one task so partitionBy emits
        # ONE file per bucket (not tasks x buckets tiny files), and persist so
        # the count and the write share the computed input
        remaining = remaining.repartition(F.col(pc))
        if self.order_by:
            # leading partition_col: FileFormatWriter requires ordering on
            # the partition column and would otherwise insert its OWN
            # Sort(bucket) on top — whose spill-merge does not preserve the
            # z-order within equal-bucket runs at scale. Sorting (bucket, z)
            # here satisfies the write's required ordering directly.
            remaining = remaining.sortWithinPartitions(pc, *self.order_by)
        remaining = remaining.persist()
        try:
            counts = {
                r[pc]: r["n"]
                for r in remaining.groupBy(pc).agg(F.count("*").alias("n")).collect()
            }
            skipped = len(done)
            if not counts:
                return {"written": 0, "skipped": skipped, "attempt": attempt, "rows": 0}

            (
                remaining.write.mode("append")
                .partitionBy(pc)
                .parquet(self.out_dir)
            )
        finally:
            remaining.unpersist()
        wall = time.time() - t0

        now = time.time()
        records = [
            {
                "bucket": str(b),
                "rows": int(n),
                "attempt": attempt,
                "completed_at": now,
                "wall_sec_total": round(wall, 3),
                "lineage": self.lineage,
            }
            for b, n in sorted(counts.items())
        ]
        self._append_records(MANIFEST, records)
        self._append_records(
            METRICS,
            [
                {
                    "attempt": attempt,
                    "buckets_written": len(counts),
                    "buckets_skipped": skipped,
                    "rows": int(sum(counts.values())),
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": round(sum(counts.values()) / max(wall, 1e-9), 1),
                    "finished_at": now,
                }
            ],
        )
        return {
            "written": len(counts),
            "skipped": skipped,
            "attempt": attempt,
            "rows": int(sum(counts.values())),
            "wall_sec": round(wall, 3),
        }

    def metrics(self) -> list[dict]:
        path = os.path.join(self.out_dir, METRICS)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
