"""Checkpoint-resumable partitioned runs with per-partition lineage +
metrics (BASELINE north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Model: a run materializes a DataFrame into ``out_dir`` bucketed by a
partition column (typically a coarse spatial cell + salt for hot cells).
Completion is recorded in a COMMIT LOG — one immutable JSON file per
completed attempt under ``_commits/``, each listing the buckets it
completed and the exact data files it wrote (the Iceberg snapshot/manifest
pattern). Nothing is ever renamed or appended in place, so the semantics
survive on object stores where rename is not atomic (S3): publishing an
attempt is the single create-new PUT of its commit file.

Resume = recompute only buckets missing from the union of committed
attempts. Crashed attempts leave stray data files that no commit
references; readers reconcile by reading ONLY files referenced by the
winning commit per bucket (:meth:`ResumableWriter.read`), and
:meth:`ResumableWriter.vacuum` deletes unreferenced files with plain
list+delete (also object-store-safe), skipping files younger than a
grace window so an in-flight attempt's not-yet-committed files survive.

File attribution is STRUCTURAL: every attempt writes under its own
``rw_attempt=<id>/`` partition directory, so building a commit's file
list is one prefix LIST of that directory — never a before/after diff of
the whole table. Resuming a half-complete 100 TB table therefore costs
O(files written this attempt), not two full-prefix S3 LISTs, and a file
written by a concurrently racing attempt can never be claimed by this
one (each lists only its own prefix). The attempt id rides as an extra
leading partition column, which keeps the layout a plain Hive-partitioned
parquet table: vanilla ``spark.read.parquet(out_dir)`` still works (it
sees every attempt's files; the reconciled :meth:`read` is what
deduplicates losers/strays).

Scope note: this covers the ENGINE's manifest machinery. Spark's own
parquet task commit still goes through its configured output committer —
on a real object store you pair this with a cloud-native committer
(directory/magic committer), which is a spark-submit config, not code.

Compatibility note (ADVICE r5): the ``rw_attempt=<id>/`` layout landed in
round 5; a table whose commits reference the PRE-round-5 flat layout
(files at ``bucket=<b>/...``) cannot be resumed in place — Spark rejects
mixed-depth partition paths under one basePath. Migrate such tables by
reading their committed files explicitly and rewriting through a fresh
writer; in-place resumption is only supported for tables written by the
current layout.

This is batch per-partition restart, not streaming state — matching the
reference's batch-only execution model (SURVEY §2.10).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: commit-log directory (one immutable file per completed attempt)
COMMITS_DIR = "_commits"
#: per-attempt partition column: every attempt's files live under their own
#: rw_attempt=<id>/ prefix (structural file attribution, see module doc)
ATTEMPT_COL = "rw_attempt"
#: legacy constant kept for import compatibility — the commit log replaced
#: the single rename-appended manifest file in round 4
MANIFEST = COMMITS_DIR


class LocalFS:
    """Filesystem seam for the commit log. The interface is deliberately
    rename-free: the only write primitive is ``write_new`` (create-new, the
    S3 conditional-PUT shape), so any implementation on an object store is
    automatically safe. Tests inject a shim that forbids os-level renames to
    prove the writer never needs one."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def walk_files(self, root: str) -> list[str]:
        """All file paths under root, relative to root, '/'-separated."""
        out: list[str] = []
        for dirpath, _dirnames, filenames in os.walk(root):
            rel = os.path.relpath(dirpath, root)
            for fn in filenames:
                out.append(fn if rel == "." else f"{rel.replace(os.sep, '/')}/{fn}")
        return sorted(out)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_new(self, path: str, text: str) -> None:
        """Create-new write: fails if the path already exists (conditional
        PUT). Single call per attempt — the commit publication point."""
        with open(path, "x") as f:
            f.write(text)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def mtime(self, path: str) -> float:
        """Last-modified time (epoch seconds) — the vacuum grace window's
        age source (object stores expose this on every LIST entry)."""
        return os.path.getmtime(path)

    def parquet_num_rows(self, path: str) -> int:
        """Row count from the parquet FOOTER only — a ~KB-sized tail read
        (a range GET on an object store), so per-bucket row metrics cost no
        extra Spark action over the written data."""
        import pyarrow.parquet as pq

        return int(pq.ParquetFile(path).metadata.num_rows)


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
    fs: LocalFS = field(default_factory=LocalFS)

    # -- commit log ----------------------------------------------------------
    def _commits_dir(self) -> str:
        return os.path.join(self.out_dir, COMMITS_DIR)

    def commits(self) -> list[dict]:
        """Effective commit list, in commit-file order (the reconciliation
        order: the FIRST commit naming a bucket wins it). A compaction
        commit (kind=compact) snapshots the merged state of every commit at
        or before its ``supersedes_through`` filename; only the LATEST
        compaction and the commits after it are returned — so the listing
        and parse cost stays O(commits since last compact), not O(all
        attempts ever)."""
        cdir = self._commits_dir()
        out = []
        for name in self.fs.listdir(cdir):
            if name.startswith("commit-") and name.endswith(".json"):
                rec = json.loads(self.fs.read_text(os.path.join(cdir, name)))
                rec["_file"] = name
                out.append(rec)
        compacts = [c for c in out if c.get("kind") == "compact"]
        if not compacts:
            return out
        snap = compacts[-1]
        after = [
            c
            for c in out
            if c["_file"] > snap["supersedes_through"]
            and c.get("kind") != "compact"
        ]
        return [snap] + after

    def completed_buckets(self) -> set[str]:
        done: set[str] = set()
        for c in self.commits():
            done.update(c["buckets"])
        return done

    def _bucket_files(self) -> dict[str, list[str]]:
        """bucket -> winning data files (relative paths), first commit wins."""
        win: dict[str, list[str]] = {}
        for c in self.commits():
            for b, files in c["files"].items():
                win.setdefault(b, files)
        return win

    def _data_files(self) -> set[str]:
        """All parquet data files currently under out_dir (relative)."""
        return {
            f
            for f in self.fs.walk_files(self.out_dir)
            if f.endswith(".parquet")
            and not f.startswith(f"{COMMITS_DIR}/")
            and "/_" not in f
            and not f.startswith("_")
        }

    # -- run -----------------------------------------------------------------
    def run(self, df: DataFrame) -> dict:
        """Write ``df`` (must contain ``partition_col``) bucket-partitioned,
        skipping buckets already committed. Returns a summary dict. Safe to
        re-invoke after any crash: an attempt becomes visible atomically via
        its commit file; stray files of crashed attempts are never read.

        One Spark action total: the write itself. Per-bucket row counts come
        from the written parquet FOOTERS (no persist + count pre-pass), and
        the commit's file list comes from listing ONLY this attempt's
        ``rw_attempt=<id>/`` prefix — O(files this attempt) even when
        resuming a table with millions of pre-existing files, and immune to
        concurrent attempts (their files live under their own prefix)."""
        if ATTEMPT_COL in df.columns:
            raise ValueError(
                f"input already has a {ATTEMPT_COL!r} column — it is reserved"
                " for the writer's per-attempt partition directory"
            )
        self.fs.makedirs(self.out_dir)
        self.fs.makedirs(self._commits_dir())
        attempt = uuid.uuid4().hex[:12]
        done = self.completed_buckets()
        pc = self.partition_col

        remaining = df
        if done:
            done_df = df.sparkSession.createDataFrame(
                [(b,) for b in sorted(done)], [pc]
            )
            remaining = df.join(F.broadcast(done_df), pc, "left_anti")

        t0 = time.time()
        # one shuffle: co-locate each bucket on one task so partitionBy emits
        # ONE file per bucket (not tasks x buckets tiny files). The partition
        # COUNT is pinned to spark.sql.shuffle.partitions: without it AQE
        # coalesces this exchange toward the 64 MB advisory size, and a
        # modest table lands on 1-2 tasks that write every bucket file
        # serially — the write stage should fan out across the configured
        # parallelism (hashing on the bucket column still sends each bucket
        # to exactly one task, so the one-file-per-bucket layout holds)
        n_part = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        remaining = remaining.repartition(n_part, F.col(pc))
        if self.order_by:
            # leading partition_col: FileFormatWriter requires ordering on
            # the partition column and would otherwise insert its OWN
            # Sort(bucket) on top — whose spill-merge does not preserve the
            # z-order within equal-bucket runs at scale. Sorting (bucket, z)
            # here satisfies the write's required ordering directly.
            remaining = remaining.sortWithinPartitions(pc, *self.order_by)
        # the write TARGET is this attempt's own rw_attempt=<id>/ prefix —
        # named like a Hive partition so the table stays a plain two-level
        # partitioned layout for vanilla readers, but the attempt column
        # never enters the Spark plan (a constant sort key would be
        # constant-folded out of sortWithinPartitions, making the writer
        # re-sort and destroy the z-order layout)
        attempt_prefix = f"{ATTEMPT_COL}={attempt}"
        (
            remaining.write.mode("append")
            .partitionBy(pc)
            .parquet(os.path.join(self.out_dir, attempt_prefix))
        )

        # structural attribution: list this attempt's prefix only
        new_files = [
            f"{attempt_prefix}/{f}"
            for f in self.fs.walk_files(os.path.join(self.out_dir, attempt_prefix))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        skipped = len(done)
        if not new_files:  # nothing remained to write: publish no commit
            return {"written": 0, "skipped": skipped, "attempt": attempt, "rows": 0}

        files_by_bucket: dict[str, list[str]] = {}
        for f in sorted(new_files):
            seg = f.split("/")[1]  # rw_attempt=<id>/<pc>=<bucket>/part-*.parquet
            if seg.startswith(f"{pc}="):
                files_by_bucket.setdefault(seg.split("=", 1)[1], []).append(f)
        # footer reads are independent ~KB tail reads (range GETs on an
        # object store): fan them out on a driver thread pool instead of a
        # serial loop — I/O-bound, so threads suffice and results are
        # order-independent sums
        from concurrent.futures import ThreadPoolExecutor

        all_files = [f for files in files_by_bucket.values() for f in files]
        with ThreadPoolExecutor(max_workers=min(32, max(1, len(all_files)))) as ex:
            n_rows = dict(
                zip(
                    all_files,
                    ex.map(
                        lambda f: self.fs.parquet_num_rows(
                            os.path.join(self.out_dir, f)
                        ),
                        all_files,
                    ),
                )
            )
        counts = {
            b: sum(n_rows[f] for f in files)
            for b, files in files_by_bucket.items()
        }
        wall = time.time() - t0

        now = time.time()
        commit = {
            "attempt": attempt,
            "completed_at": now,
            "buckets": sorted(str(b) for b in counts),
            "files": files_by_bucket,
            "rows_per_bucket": {str(b): int(n) for b, n in counts.items()},
            "lineage": self.lineage,
            "metrics": {
                "buckets_written": len(counts),
                "buckets_skipped": skipped,
                "rows": int(sum(counts.values())),
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(sum(counts.values()) / max(wall, 1e-9), 1),
                "finished_at": now,
            },
        }
        # publication point: ONE create-new write makes the attempt visible
        self.fs.write_new(
            os.path.join(self._commits_dir(), f"commit-{now:017.6f}-{attempt}.json"),
            json.dumps(commit),
        )
        return {
            "written": len(counts),
            "skipped": skipped,
            "attempt": attempt,
            "rows": int(sum(counts.values())),
            "wall_sec": round(wall, 3),
        }

    # -- read / maintain -----------------------------------------------------
    def read(self, spark) -> DataFrame:
        """Reconciled read: exactly the committed files, first-commit-wins
        per bucket — stray files from crashed or losing attempts are
        invisible. basePath keeps the partition column in the schema."""
        win = self._bucket_files()
        paths = [
            os.path.join(self.out_dir, f) for files in win.values() for f in files
        ]
        if not paths:
            raise FileNotFoundError(f"no committed data under {self.out_dir}")
        return (
            spark.read.option("basePath", self.out_dir)
            .parquet(*paths)
            .drop(ATTEMPT_COL)
        )

    def compact(self) -> str | None:
        """Fold the current effective commit state into ONE compaction
        commit (still create-new, no rename): carries the merged
        bucket->files/rows maps and names the last commit it supersedes.
        Returns the new commit filename (None when there is nothing to
        fold). Superseded commit files become dead weight that
        :meth:`vacuum_commits` may delete — but even undeleted they are
        skipped at read time, so listing stays cheap."""
        cs = self.commits()
        if len(cs) <= 1:
            return None
        win_files = self._bucket_files()
        rows: dict[str, int] = {}
        seen: set[str] = set()
        for c in cs:
            for b in c["buckets"]:
                if b not in seen:
                    seen.add(b)
                    rows[b] = c["rows_per_bucket"][b]
        now = time.time()
        attempt = uuid.uuid4().hex[:12]
        commit = {
            "kind": "compact",
            "attempt": attempt,
            "completed_at": now,
            "supersedes_through": cs[-1]["_file"],
            "buckets": sorted(seen),
            "files": win_files,
            "rows_per_bucket": rows,
            "lineage": self.lineage,
            "metrics": {
                "buckets_written": 0,
                "buckets_skipped": len(seen),
                "rows": int(sum(rows.values())),
                "wall_sec": 0.0,
                "rows_per_sec": 0.0,
                "finished_at": now,
                "compacted_commits": len(cs),
            },
        }
        name = f"commit-{now:017.6f}-{attempt}.json"
        self.fs.write_new(os.path.join(self._commits_dir(), name), json.dumps(commit))
        return name

    def vacuum_commits(self) -> list[str]:
        """Delete commit files superseded by the latest compaction
        (list + delete only). Returns the deleted filenames."""
        cdir = self._commits_dir()
        live = {c["_file"] for c in self.commits()}
        dead = [
            n
            for n in self.fs.listdir(cdir)
            if n.startswith("commit-") and n.endswith(".json") and n not in live
        ]
        for n in dead:
            self.fs.delete(os.path.join(cdir, n))
        return dead

    def vacuum(self, older_than: float = 86400.0) -> list[str]:
        """Delete data files no commit references (list + delete only).
        Returns the deleted relative paths.

        ``older_than`` is the orphan-cleanup grace window (seconds, the
        Iceberg ``older_than`` pattern): a stray younger than it is SKIPPED,
        because it may belong to an attempt that has written its files but
        not yet published its commit — deleting those would let the commit
        land referencing vanished files. Pass 0.0 only when no writer can be
        in flight (quiescent maintenance)."""
        referenced = {
            f for files in self._bucket_files().values() for f in files
        }
        cutoff = time.time() - older_than
        stray = []
        for f in sorted(self._data_files() - referenced):
            p = os.path.join(self.out_dir, f)
            try:
                if self.fs.mtime(p) > cutoff:
                    continue  # grace window: possibly an in-flight attempt
            except OSError:
                continue  # vanished under us (racing vacuum/writer): skip
            stray.append(f)
            self.fs.delete(p)
        return stray

    def metrics(self) -> list[dict]:
        """Per-attempt metrics, one dict per committed attempt."""
        return [
            {"attempt": c["attempt"], **c["metrics"]} for c in self.commits()
        ]

    def manifest_records(self) -> list[dict]:
        """Flat per-bucket records across commits (winning commit per
        bucket) — the shape the old jsonl manifest exposed."""
        recs = []
        seen: set[str] = set()
        for c in self.commits():
            for b in c["buckets"]:
                if b in seen:
                    continue
                seen.add(b)
                recs.append(
                    {
                        "bucket": b,
                        "rows": c["rows_per_bucket"][b],
                        "attempt": c["attempt"],
                        "completed_at": c["completed_at"],
                        "lineage": c["lineage"],
                    }
                )
        return recs
