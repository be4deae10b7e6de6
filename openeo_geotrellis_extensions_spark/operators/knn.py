"""k-nearest-neighbor join over cell-ring neighborhoods (BASELINE
north_star: "broadcast-build kNN over cell-ring neighborhoods").

Exact kNN without an O(n*q) cross join:
  1. queries explode to their k-ring cells at radius r (start r=1);
  2. equi-join on cell against the point table (the small ring table is
     broadcast — 'broadcast-build');
  3. per query, if it has >= k candidates AND the kth Chebyshev-safe bound
     holds (kth distance <= r * cell_size, so no unseen cell can contain a
     closer point), it is DONE; otherwise r doubles and only the unsatisfied
     queries re-join.
The loop is driver-side but bounded (log of world size); every iteration is
a plain DataFrame join, so the heavy lifting stays distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.grid import GlobalGrid
from .spatial_join import cell_for_point_col


def _ring_cells(queries: DataFrame, res: int, radius: int) -> DataFrame:
    """(query row) -> exploded (query_id, qx, qy, cell) for all cells within
    Chebyshev radius ``radius``."""

    def explode(it):
        for pdf in it:
            qids, qxs, qys, cells = [], [], [], []
            for qid, x, y in zip(pdf["query_id"], pdf["qx"], pdf["qy"]):
                c0 = int(GlobalGrid.cell_for_point(res, np.array([x]), np.array([y]))[0])
                for c in GlobalGrid.k_ring(c0, radius):
                    qids.append(qid); qxs.append(x); qys.append(y); cells.append(c)
            yield pd.DataFrame({"query_id": qids, "qx": qxs, "qy": qys, "cell": cells})

    return queries.mapInPandas(
        explode, schema="query_id string, qx double, qy double, cell long"
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 5,
    id_col: str = "doc_id",
    x_col: str = "x",
    y_col: str = "y",
    query_id_col: str = "query_id",
    qx_col: str = "qx",
    qy_col: str = "qy",
    max_rounds: int = 6,
) -> DataFrame:
    """Exact k nearest points (Euclidean, planar) for each query.
    -> (query_id, neighbor_id, dist, rank)."""
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    pts = points.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        cell_for_point_col(res, F.col(x_col), F.col(y_col)),
    ).persist()  # every radius round re-joins pts: compute its lineage once
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qx_col).alias("qx"),
        F.col(qy_col).alias("qy"),
    )
    cell_size = GlobalGrid.cell_size(res)

    remaining = qs
    results = None
    radius = 1
    for rnd in range(max_rounds):
        rings = F.broadcast(_ring_cells(remaining, res, radius))
        cand = rings.join(pts, "cell").select(
            "query_id", "qx", "qy", "neighbor_id", "px", "py"
        )
        dist = F.sqrt(
            (F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        # a query is done when it found k neighbors and the kth distance is
        # STRICTLY inside the searched radius — an exact-tie kth could still
        # be beaten (deterministic smaller-id tie-break) by an unseen
        # equal-distance point just outside the ring, so ties re-search
        kth = topk.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("dist").alias("kth")
        )
        safe = radius * cell_size
        if rnd == max_rounds - 1:
            # final round: resolve EVERY remaining query (not just those with
            # candidates — kth only contains queries that found >=1 point) —
            # best-so-far top-k, partial if the points table has < k rows,
            # zero neighbor rows if no point fell inside the largest ring
            done_ids = remaining.select("query_id")
        else:
            done_ids = kth.where((F.col("n") >= k) & (F.col("kth") < safe)).select(
                "query_id"
            )
        done = topk.join(done_ids, "query_id", "left_semi").select(
            "query_id", "neighbor_id", F.round("dist", 9).alias("dist"), "rank"
        )
        results = done if results is None else results.unionByName(done)
        # localCheckpoint cuts the per-round anti-join lineage (query sets
        # are small; the checkpoint doubles as the isEmpty materialization)
        remaining = remaining.join(done_ids, "query_id", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.isEmpty():
            break
        radius *= 2
    # materialize the (small, queries x k) result, then release the cached
    # point table so repeated knn_join calls don't pin executor storage
    results = results.localCheckpoint(eager=True)
    pts.unpersist()
    return results
