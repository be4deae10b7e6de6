from .spatial_join import cover_cells_for_features, spatial_join_points
from .zonal import aggregate_spatial

__all__ = [
    "cover_cells_for_features",
    "spatial_join_points",
    "aggregate_spatial",
]
