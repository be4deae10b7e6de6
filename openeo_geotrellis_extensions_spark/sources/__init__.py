from .interleaved import (
    DATES,
    MEDIA_ZOOM,
    synth_docs,
    explode_spans,
    span_fingerprints,
    reassemble_fingerprints,
    extract_geometries,
    media_layout,
)
from .datacube import CubeMeta, DataCube

__all__ = [
    "DATES",
    "MEDIA_ZOOM",
    "synth_docs",
    "explode_spans",
    "span_fingerprints",
    "reassemble_fingerprints",
    "extract_geometries",
    "media_layout",
    "CubeMeta",
    "DataCube",
]
