from .apply_process import apply_process, apply_time, reduce_bands, reduce_time
from .cloud import chunk_polygon, to_scl_dilation_mask
from .filters import (
    crop,
    filter_bands,
    filter_bbox,
    filter_empty_tiles,
    filter_negative_keys,
    filter_temporal,
)
from .kernel import apply_kernel
from .knn import knn_join
from .neighborhood import apply_neighborhood, build_pyramid, zoom_out
from .rasterize import rasterize_features, vectorize
from .mask import mask, mask_polygon
from .merge import merge_cubes
from .resample import resample_spatial, retile
from .spatial_join import cover_cells_for_features, spatial_join_points
from .temporal import aggregate_temporal, aggregate_temporal_period
from .zonal import aggregate_spatial

__all__ = [
    "apply_process",
    "apply_time",
    "reduce_bands",
    "reduce_time",
    "crop",
    "chunk_polygon",
    "to_scl_dilation_mask",
    "filter_bands",
    "filter_bbox",
    "filter_empty_tiles",
    "filter_negative_keys",
    "filter_temporal",
    "apply_kernel",
    "knn_join",
    "apply_neighborhood",
    "build_pyramid",
    "zoom_out",
    "rasterize_features",
    "vectorize",
    "mask",
    "mask_polygon",
    "merge_cubes",
    "resample_spatial",
    "retile",
    "cover_cells_for_features",
    "spatial_join_points",
    "aggregate_temporal",
    "aggregate_temporal_period",
    "aggregate_spatial",
]
