"""NetCDF-shaped sample sink.

Reference: netcdf/NetCDFRDDWriter.scala:311-453 (saveSamples /
groupRDDBySample): group cube tiles per polygon sample, assemble a
(t, bands, y, x) array per sample, write one file per sample.

No netCDF library exists in this container, so the Spark-side grouping and
array assembly are REAL (distributed applyInPandas, one file per sample
written by executors) while the container format is ``.npz`` (numpy, with
dims/coords arrays mirroring CF conventions). ``write_netcdf`` is the seam
where netCDF4/xarray would plug in.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..core.celltype import parse_cell_type
from ..core.tiles import decode_tile_float
from ..operators.zonal import feature_tile_keys
from ..sources.datacube import DataCube


def write_netcdf(path: str, data: np.ndarray, coords: dict) -> str:
    raise NotImplementedError(
        "netCDF4/xarray unavailable in this environment; npz fallback is used"
    )


def save_samples(cube: DataCube, features, out_dir: str) -> pd.DataFrame:
    """One (t, band, y, x) array file per feature (sample), assembled and
    written by executors. Returns index (feature_index, path, n_t, shape)."""
    os.makedirs(out_dir, exist_ok=True)
    ld = cube.meta.layout
    ct = parse_cell_type(cube.meta.cell_type)
    nb = cube.meta.n_bands
    th, tw = ld.tile_rows, ld.tile_cols
    band_names = tuple(cube.meta.band_names)  # plain tuple: the closure must
    # not capture `cube` (its df holds the SparkContext, unpicklable)

    from pyspark.sql import functions as F

    fkeys = F.broadcast(feature_tile_keys(features, ld))
    joined = cube.df.join(fkeys, ["col", "row"], "inner")

    def write_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        fi = int(pdf["feature_index"].iloc[0])
        times = sorted(pdf["time"].unique())
        cols = sorted(pdf["col"].unique())
        rows = sorted(pdf["row"].unique())
        cpos = {c: i for i, c in enumerate(cols)}
        rpos = {r: i for i, r in enumerate(rows)}
        tpos = {t: i for i, t in enumerate(times)}
        data = np.full((len(times), nb, len(rows) * th, len(cols) * tw), np.nan)
        for rec in pdf.itertuples(index=False):
            stack = decode_tile_float(list(rec.bands), ct, (th, tw))
            ti = tpos[rec.time]
            ro = rpos[rec.row] * th
            co = cpos[rec.col] * tw
            data[ti, :, ro : ro + th, co : co + tw] = stack
        path = os.path.join(out_dir, f"sample_{fi}.npz")
        np.savez_compressed(
            path,
            data=data,
            t=np.array([str(t) for t in times]),
            bands=np.array(band_names),
            x0=ld.extent.xmin + min(cols) * ld.tile_width,
            y1=ld.extent.ymax - min(rows) * ld.tile_height,
            cell_size=np.array([ld.cell_width, ld.cell_height]),
        )
        return pd.DataFrame(
            [(fi, path, len(times), f"{data.shape}")],
            columns=["feature_index", "path", "n_t", "shape"],
        )

    idx = joined.groupBy("feature_index").applyInPandas(
        write_sample, schema="feature_index int, path string, n_t int, shape string"
    )
    return idx.toPandas()
