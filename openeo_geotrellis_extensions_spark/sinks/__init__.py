from .geotiff import (
    read_geotiff,
    save_geotiff_tiles,
    save_stitched_geotiff,
    write_geotiff,
)
from .netcdf import save_samples
from .png import read_png, save_png, write_png
from .tabular import save_geojson, save_timeseries_csv

__all__ = [
    "read_geotiff",
    "save_geotiff_tiles",
    "save_stitched_geotiff",
    "write_geotiff",
    "save_samples",
    "read_png",
    "save_png",
    "write_png",
    "save_geojson",
    "save_timeseries_csv",
]
