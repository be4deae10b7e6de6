"""The interleaved text+media document table (BASELINE input_hint):

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Text spans carry GeoJSON geometries (or plain filler text); media spans carry
raster tile refs ``tile://{zoom}/{col}/{row}/{date}/{band}``. The per-row
invariant is span-sequence equality (kind, text, media_ref, order) through
every stage — enforced via md5 fingerprints (``span_fingerprints`` /
``reassemble_fingerprints``).

Synthesis is **closed-form integer arithmetic on the doc index**, built with
Spark SQL expressions only (whole-stage codegen, no Python in the loop, no
driver-side collection — `spark.range(n)` scales to any row count). The same
arithmetic is mirrored by :func:`oracle_doc_sql` so DuckDB can reproduce every
derived quantity (lon/lat, tile key, hot-cell flag) for value-level
correctness oracles.

Skew: 20 % of docs (id % 5 == 0) land in one "urban" hot cell around
(4.0–4.7 E, 50.7–51.4 N) to exercise salting (FIXTURES.md F1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.geom import parse_geometry
from ..core.grid import Extent, LayoutDefinition, WORLD_EXTENT

#: Fixed acquisition dates (mirrors LayerFixtures.tileToSpaceTimeDataCube,
#: openeo-geotrellis/src/test/scala/org/openeo/geotrellis/LayerFixtures.scala:160-167).
DATES = ["2017-01-01", "2017-01-15", "2017-02-01", "2018-01-15"]

#: Tile-ref zoom: 2^(z+1) x 2^z grid over the world (matches core.grid.GlobalGrid).
MEDIA_ZOOM = 8
_NX = 2 ** (MEDIA_ZOOM + 1)  # 512
_NY = 2**MEDIA_ZOOM  # 256


def media_layout(tile_size: int = 16) -> LayoutDefinition:
    """The world tile layout that media_ref (zoom/col/row) keys address."""
    return LayoutDefinition(WORLD_EXTENT, _NX, _NY, tile_size, tile_size)


# ---------------------------------------------------------------------------
# Closed-form doc attributes (shared Spark/DuckDB arithmetic)
# ---------------------------------------------------------------------------
# lon/lat in 1e-4 degrees as exact integers; both engines reproduce them.

_LON_E4 = (
    "CASE WHEN {id} % 5 = 0 THEN 40000 + ({id} * 7919) % 7000 "
    "ELSE -1800000 + (({id} * 48271) % 36000) * 100 END"
)
_LAT_E4 = (
    "CASE WHEN {id} % 5 = 0 THEN 507000 + ({id} * 104729) % 7000 "
    "ELSE -900000 + (({id} * 69621) % 18000) * 100 END"
)
# half-size of rect polygons, 1e-4 degrees
_HALF_E4 = "(500 + ({id} % 5) * 100)"
# media tile key (exact: numerators are exact doubles, quotients of exact
# multiples -> identical floor in Spark and DuckDB)
_TCOL = f"CAST(floor((({_LON_E4}) + 1800000) * {_NX} / 3600000.0) AS INT)"
_TROW = f"CAST(floor((900000 - ({_LAT_E4})) * {_NY} / 1800000.0) AS INT)"


def doc_attr_sql(id_expr: str = "id") -> dict[str, str]:
    """SQL snippets (valid in Spark SQL *and* DuckDB) deriving doc attributes
    from an integer doc-index expression. Used to build oracle queries."""
    f = {"id": f"({id_expr})"}
    return {
        "lon_e4": _LON_E4.format(**f),
        "lat_e4": _LAT_E4.format(**f),
        "lon": f"(CAST({_LON_E4.format(**f)} AS DOUBLE) / 10000.0)",
        "lat": f"(CAST({_LAT_E4.format(**f)} AS DOUBLE) / 10000.0)",
        "half": f"(CAST({_HALF_E4.format(**f)} AS DOUBLE) / 10000.0)",
        "is_hot": f"({id_expr}) % 5 = 0",
        "is_point": f"({id_expr}) % 3 = 0",
        "tile_col": _TCOL.format(**f),
        "tile_row": _TROW.format(**f),
        "n_spans": f"2 + ({id_expr}) % 4",
    }


# ---------------------------------------------------------------------------
# Synthesis (pure Spark SQL — no UDFs)
# ---------------------------------------------------------------------------


def synth_docs(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Deterministic interleaved-document table of ``n_docs`` rows.

    Each doc has 2–5 spans with strictly increasing offsets:
      - span j is text if (id + j) % 3 < 2 else media;
      - every text span at j <= 1 is a GeoJSON geometry (Point for
        id % 3 == 0 else a rect Polygon) — every doc has a text span at
        j <= 1, so every doc carries >= 1 geometry; later text spans
        alternate geometry/filler;
      - media spans are ``tile://8/{col}/{row}/{date}/{band}`` with the key
        derived from the doc's (lon, lat), date index (id + j) % 4, band j % 2.
    """
    a = doc_attr_sql("id")
    lon_s = f"format_string('%.4f', {a['lon']})"
    lat_s = f"format_string('%.4f', {a['lat']})"
    x0 = f"format_string('%.4f', {a['lon']} - {a['half']})"
    x1 = f"format_string('%.4f', {a['lon']} + {a['half']})"
    y0 = f"format_string('%.4f', {a['lat']} - {a['half']})"
    y1 = f"format_string('%.4f', {a['lat']} + {a['half']})"

    point_json = (
        f"concat('{{\"type\": \"Point\", \"coordinates\": [', {lon_s}, ', ', {lat_s}, ']}}')"
    )
    rect_json = (
        "concat('{\"type\": \"Polygon\", \"coordinates\": [[[', "
        f"{x0}, ', ', {y0}, '], [', {x1}, ', ', {y0}, '], [', "
        f"{x1}, ', ', {y1}, '], [', {x0}, ', ', {y1}, '], [', "
        f"{x0}, ', ', {y0}, ']]]}}')"
    )
    geo_json = f"CASE WHEN {a['is_point']} THEN {point_json} ELSE {rect_json} END"
    dates_arr = "array(" + ", ".join(f"'{d}'" for d in DATES) + ")"
    tile_ref = (
        f"concat('tile://{MEDIA_ZOOM}/', CAST({a['tile_col']} AS STRING), '/', "
        f"CAST({a['tile_row']} AS STRING), '/', "
        f"element_at({dates_arr}, CAST((id + j) % 4 AS INT) + 1), '/B', CAST(j % 2 AS STRING))"
    )
    span = f"""
        transform(sequence(0, CAST({a['n_spans']} AS INT) - 1), j ->
          struct(
            CASE WHEN (id + j) % 3 < 2 THEN 'text' ELSE 'media' END AS kind,
            CASE WHEN (id + j) % 3 < 2 THEN
              CASE WHEN j <= 1 OR (id + j) % 2 = 0 THEN {geo_json}
                   ELSE concat('filler text ', CAST(id * 31 + j AS STRING), ' lorem ipsum')
              END
            END AS text,
            CASE WHEN (id + j) % 3 >= 2 THEN {tile_ref} END AS media_ref,
            CAST(j * 20 + id % 13 AS INT) AS offset
          )
        )
    """
    if partitions is None:
        # enough splits to keep every core busy, bounded by ~25k docs/partition
        partitions = max(spark.sparkContext.defaultParallelism, n_docs // 25_000)
    df = spark.range(0, n_docs, 1, numPartitions=partitions)
    return df.select(
        F.format_string("doc_%08d", F.col("id")).alias("doc_id"),
        F.expr(span).alias("spans"),
    )


# ---------------------------------------------------------------------------
# Span-sequence invariant
# ---------------------------------------------------------------------------

_FP_EXPR = (
    "md5(array_join(transform(spans, s -> concat_ws('|', "
    "coalesce(s.kind, ''), coalesce(s.text, ''), coalesce(s.media_ref, ''), "
    "CAST(s.offset AS STRING))), ';'))"
)


def span_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, span_fp): md5 of the ordered span sequence — the per-row
    invariant (BASELINE input_hint: span-sequence equality through every stage)."""
    return docs.select("doc_id", F.expr(_FP_EXPR).alias("span_fp"))


def explode_spans(docs: DataFrame) -> DataFrame:
    """Order-preserving explode: (doc_id, span_idx, kind, text, media_ref, offset).

    ``posexplode`` carries the array position so the sequence can be
    re-asserted after any join (SURVEY §7.1 step 2)."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_fingerprints(exploded: DataFrame) -> DataFrame:
    """Rebuild (doc_id, span_fp) from an exploded/joined span table by
    re-sorting on span_idx — equality with the source fingerprints proves the
    span-sequence invariant held across the pipeline stage."""
    return exploded.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_idx", "kind", "text", "media_ref", "offset"))
        ).alias("sp")
    ).select(
        "doc_id",
        F.expr(
            "md5(array_join(transform(sp, s -> concat_ws('|', "
            "coalesce(s.kind, ''), coalesce(s.text, ''), coalesce(s.media_ref, ''), "
            "CAST(s.offset AS STRING))), ';'))"
        ).alias("span_fp"),
    )


# ---------------------------------------------------------------------------
# Geometry extraction (Arrow-batched parse of text spans)
# ---------------------------------------------------------------------------

_GEOM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("geom_kind", StringType()),
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
        StructField("rep_x", DoubleType()),
        StructField("rep_y", DoubleType()),
        StructField("geojson", StringType()),
    ]
)


def extract_geometries(docs: DataFrame) -> DataFrame:
    """Text spans -> parsed geometries with bbox + representative point.

    Non-geometry text spans are dropped. Parsing runs in ``mapInPandas``
    (Arrow batches; the reference's equivalent is driver-side GeoJSON decode
    in ProjectedPolygons.scala:71-175 — ours is distributed)."""
    spans = (
        explode_spans(docs)
        .where(F.col("kind") == "text")
        # JVM-side prefilter: only GeoJSON/WKT-looking spans reach Python
        # (filler text never parses; skipping it saves ~1/3 of UDF input)
        .where(
            F.col("text").startswith("{")
            | F.col("text").rlike("^(POINT|POLYGON|MULTIPOLYGON|MULTIPOINT)\\s*\\(")
        )
        .select("doc_id", "span_idx", "text")
    )

    def parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        for pdf in it:
            rows = []
            for doc_id, span_idx, text in zip(pdf["doc_id"], pdf["span_idx"], pdf["text"]):
                if not text:
                    continue
                # fast path for plain GeoJSON Point / single-small-ring
                # Polygon: bbox/representative point straight off the
                # parsed coordinate lists — skips the Geometry dataclass +
                # four numpy reductions per row (the per-row numpy overhead
                # dominated this stage; guide §4.2: per-task work). Results
                # are bit-identical: json.loads yields the same doubles,
                # min/max are order-free, and a sequential Python sum over
                # <= 7 ring points is bit-identical to numpy's mean (numpy
                # switches to unrolled pairwise summation at 8 elements —
                # verified empirically per size). Anything else (WKT,
                # multi-ring, multi-polygon, longer rings) falls back to
                # the exact parse_geometry path.
                if text.lstrip().startswith("{"):
                    try:
                        obj = _json.loads(text)
                        t = obj.get("type")
                        if t == "Point":
                            c = obj["coordinates"]
                            x, y = float(c[0]), float(c[1])
                            rows.append(
                                (doc_id, span_idx, "Point", x, y, x, y, x, y, text)
                            )
                            continue
                        if t == "Polygon":
                            coords = obj.get("coordinates")
                            if (
                                isinstance(coords, list)
                                and len(coords) == 1
                                and 3 <= len(coords[0]) <= 7
                            ):
                                ring = coords[0]
                                xs = [float(p[0]) for p in ring]
                                ys = [float(p[1]) for p in ring]
                                sx = 0.0
                                sy = 0.0
                                for vx in xs:
                                    sx += vx
                                for vy in ys:
                                    sy += vy
                                rows.append(
                                    (
                                        doc_id, span_idx, "Polygon",
                                        min(xs), min(ys), max(xs), max(ys),
                                        sx / len(xs), sy / len(ys), text,
                                    )
                                )
                                continue
                    except (ValueError, TypeError, IndexError, KeyError):
                        pass  # malformed fast-path shape: exact path decides
                g = parse_geometry(text)
                if g is None:
                    continue
                bb = g.bbox()
                rx, ry = g.representative_point()
                rows.append(
                    (doc_id, span_idx, g.kind, bb.xmin, bb.ymin, bb.xmax, bb.ymax, rx, ry, text)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _GEOM_SCHEMA.fields]
            )

    return spans.mapInPandas(parse_batches, schema=_GEOM_SCHEMA)


# ---------------------------------------------------------------------------
# Media tile resolver (deterministic synthetic pixels)
# ---------------------------------------------------------------------------


def parse_tile_ref(ref: str) -> tuple[int, int, int, str, int]:
    """'tile://z/c/r/date/Bb' -> (zoom, col, row, date, band)."""
    parts = ref[len("tile://") :].split("/")
    return int(parts[0]), int(parts[1]), int(parts[2]), parts[3], int(parts[4][1:])


def media_tile_values(
    col: int, row: int, date_idx: int, band: int, size: int
) -> np.ndarray:
    """Deterministic uint8 tile for a media ref: the value formula is simple
    modular arithmetic so DuckDB oracles can recompute any pixel —
    v = (col*31 + row*17 + d*11 + band*7 + py*5 + px*3) % 100, with nodata
    (255) where (col + row + px + py) % 23 == 0."""
    px = np.arange(size)[None, :]
    py = np.arange(size)[:, None]
    v = (col * 31 + row * 17 + date_idx * 11 + band * 7 + py * 5 + px * 3) % 100
    nodata = (col + row + px + py) % 23 == 0
    out = v.astype(np.uint8)
    out[nodata] = 255
    return out


MEDIA_CELL_TYPE = "uint8ud255"
