"""Tabular sinks: timeseries CSV (the reference's zonal-stats output) and
GeoJSON vector export.

Reference: aggregate_polygon/AggregatePolygonProcess.scala:326-374 — stats
DataFrame -> ``coalesce(1).write.csv`` with header
``date,feature_index,<band labels>`` (asserted AggregateSpatialTest.scala:220);
featuresToGeojson / vectorize(path) OpenEOProcesses.scala:615-655.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_timeseries_csv(
    stats: DataFrame, path: str, band_names: list[str]
) -> str:
    """Long-format zonal stats (time, feature_index, band, mean, ...) ->
    reference CSV: one row per (date, feature_index) with one MEAN column per
    band, header ``date,feature_index,<band labels>``."""
    wide = (
        stats.groupBy(
            F.date_format("time", "yyyy-MM-dd").alias("date"), "feature_index"
        )
        .pivot("band", list(range(len(band_names))))
        .agg(F.first("mean"))
    )
    for i, name in enumerate(band_names):
        wide = wide.withColumnRenamed(str(i), name)
    tmp = path + "_tmp"
    (
        wide.orderBy("date", "feature_index")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def save_geojson(features: DataFrame, path: str, geometry_col: str = "geojson") -> str:
    """Feature table -> single GeoJSON FeatureCollection file (driver-side
    collect; vector results are small by construction in the reference)."""
    rows = features.collect()
    out = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": json.loads(r[geometry_col]),
                "properties": {
                    k: (v.isoformat() if hasattr(v, "isoformat") else v)
                    for k, v in r.asDict().items()
                    if k != geometry_col
                },
            }
            for r in rows
        ],
    }
    with open(path, "w") as f:
        json.dump(out, f)
    return path
