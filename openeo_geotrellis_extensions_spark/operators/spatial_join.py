"""Spatial join on hierarchical cell keys — the engine's replacement for the
reference's clipToGrid / VectorJoin / SpatialToSpacetimeJoinRdd machinery
(FileLayerProvider.scala:386,921-922,1060-1093; SpatialToSpacetimeJoinRdd.scala:15-76).

Pattern (BASELINE north_star):
  1. features -> compact cell cover, flattened to a fixed join resolution
     (distributed ``mapInPandas``; each cover cell carries a ``contained``
     flag so fully-interior cells skip the point-in-polygon refine);
  2. points -> cell id at the same resolution (vectorized arithmetic);
  3. equi-join on ``cell`` — Catalyst picks broadcast-hash when the cover
     side is small, AQE splits skewed hot cells otherwise;
  4. refine: Arrow-batched vectorized point-in-polygon, with a per-batch
     geometry parse cache (one parse per feature per batch, not per row).

No custom partitioner, no RDDs: the cell id is an ordinary int64 column, so
partition pruning / AQE / broadcast all apply natively (SURVEY §4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core.geom import classify_rect, parse_geometry, points_in_geometry
from ..core.grid import GlobalGrid


def cell_for_point_col(res: int, x: Column, y: Column) -> Column:
    """Cell id as a pure Column expression (whole-stage codegen, no UDF):
    mirrors GlobalGrid.cell_for_point."""
    size = GlobalGrid.cell_size(res)
    nx, ny = GlobalGrid.n_cells(res)
    cx = F.greatest(
        F.lit(0),
        F.least(F.lit(nx - 1), F.floor((x - GlobalGrid.extent.xmin) / F.lit(size))),
    ).cast("long")
    cy = F.greatest(
        F.lit(0),
        F.least(F.lit(ny - 1), F.floor((y - GlobalGrid.extent.ymin) / F.lit(size))),
    ).cast("long")
    return (
        F.shiftleft(F.lit(res).cast("long"), 56)
        .bitwiseOR(F.shiftleft(cx, 28))
        .bitwiseOR(cy)
        .alias("cell")
    )


_COVER_SCHEMA = StructType(
    [
        StructField("feature_index", IntegerType()),
        StructField("cell", LongType()),
        StructField("contained", BooleanType()),
    ]
)


def cover_cells_for_features(
    features: DataFrame, res: int, min_res: int = 0
) -> DataFrame:
    """(feature_index, geojson) -> (feature_index, cell, contained) at
    resolution ``res`` via compact cover + uncompact. ``contained`` cells are
    fully inside the feature (refine can be skipped — the H3 polyfill
    'full cells' optimization)."""

    def cover(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_f, out_c, out_k = [], [], []
            for fi, gj in zip(pdf["feature_index"], pdf["geojson"]):
                g = parse_geometry(gj)
                if g is None:
                    continue
                if g.kind in ("Point", "MultiPoint"):
                    cells = set(
                        int(c)
                        for c in GlobalGrid.cell_for_point(
                            res, g.points[:, 0], g.points[:, 1]
                        )
                    )
                    for c in cells:
                        out_f.append(int(fi)); out_c.append(c); out_k.append(False)
                    continue
                compact = GlobalGrid.compact_cover(
                    lambda ext: classify_rect(g, ext), min_res, res
                )
                for cc in compact:
                    r = int(np.int64(cc) >> 56)
                    full = r < res or classify_rect(g, GlobalGrid.cell_extent(cc)) == 2
                    for c in GlobalGrid.cover_to_res([cc], res):
                        out_f.append(int(fi)); out_c.append(int(c)); out_k.append(bool(full))
            yield pd.DataFrame(
                {"feature_index": out_f, "cell": out_c, "contained": out_k}
            )

    return features.mapInPandas(cover, schema=_COVER_SCHEMA)


def spatial_join_points(
    points: DataFrame,
    features: DataFrame,
    res: int = 7,
    x_col: str = "rep_x",
    y_col: str = "rep_y",
    broadcast_features: bool = True,
) -> DataFrame:
    """Join a point table (any schema + x/y columns) with a feature table
    (feature_index, geojson): returns point rows + ``feature_index`` for each
    containing feature (inner; a point in k features yields k rows, matching
    the reference's per-covering-polygon emit, AggregatePolygonProcess.scala:287-306).
    """
    cover = cover_cells_for_features(features, res)
    if broadcast_features:
        cover = F.broadcast(cover)
        feat = F.broadcast(features)
    else:
        feat = features
    pts = points.withColumn("cell", cell_for_point_col(res, F.col(x_col), F.col(y_col)))
    # single pipeline: candidates keep the contained flag; PIP runs only on
    # boundary-cell rows (interior 'contained' rows short-circuit in the UDF,
    # avoiding a union of two branches that would re-execute the upstream DAG)
    cand = (
        pts.join(cover, "cell", "inner")
        .drop("cell")
        .join(feat, "feature_index", "inner")
    )

    out_schema = StructType(
        [f for f in cand.schema.fields if f.name not in ("geojson", "contained")]
    )
    names = [f.name for f in out_schema.fields]

    def refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, object] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            keep = pdf["contained"].to_numpy(dtype=bool).copy()
            todo = ~keep
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            fis = pdf["feature_index"].to_numpy()
            for fi in np.unique(fis[todo]):
                g = cache.get(int(fi))
                if g is None:
                    gj = pdf.loc[pdf["feature_index"] == fi, "geojson"].iloc[0]
                    g = parse_geometry(gj)
                    cache[int(fi)] = g
                m = todo & (fis == fi)
                keep[m] = points_in_geometry(g, xs[m], ys[m])
            yield pdf.loc[keep, names]

    return cand.mapInPandas(refine, schema=out_schema)
