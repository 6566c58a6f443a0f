"""Vector-layer file readers: WKT and GeoJSON polygon columns -> the
``(zone_id, xs, ys)`` polygon-layer DataFrame that ``pip.pip_join_df``
consumes.

The reference loads vector layers through OGR on the driver
(SciDB_ZonalStats_CL.py:443-445 ``driver.Open(shapePath, 0)``); here the
layer is a parquet/JSON-lines column parsed DISTRIBUTED with pure column
algebra (regexp + split + transform for WKT, from_json for GeoJSON), so a
millions-of-polygons layer never touches the driver.

Only single-ring POLYGON geometries are supported — the fixture layers
and the reference's zonal workloads use simple rings.  MULTIPOLYGON /
holes would add rings as extra rows keyed by (zone_id, ring_no); the
refinement kernel already accepts any simple ring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "coordinates",
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
        ),
    ]
)


def _drop_closing_vertex(xs: Column, ys: Column) -> tuple[Column, Column]:
    """WKT/GeoJSON rings are closed (last vertex repeats the first); the
    engine's ring arrays are open.  Drop the final vertex when it closes
    the ring, keep it otherwise (already-open input)."""
    closed = (F.element_at(xs, 1) == F.element_at(xs, -1)) & (
        F.element_at(ys, 1) == F.element_at(ys, -1)
    ) & (F.size(xs) > 1)
    open_xs = F.when(closed, F.slice(xs, 1, F.size(xs) - 1)).otherwise(xs)
    open_ys = F.when(closed, F.slice(ys, 1, F.size(ys) - 1)).otherwise(ys)
    return open_xs, open_ys


def polygons_from_wkt(
    df: DataFrame, wkt_col: str = "wkt", id_col: str = "zone_id"
) -> DataFrame:
    """Parse a ``POLYGON ((x y, x y, ...))`` WKT column into the
    (zone_id, xs, ys) layer shape — regexp + split column algebra, fully
    distributed.  Rows whose geometry is not a parseable single-ring
    POLYGON come out with NULL arrays (caller filters or fails)."""
    body = F.regexp_extract(F.col(wkt_col), r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", 1)
    pairs = F.split(body, r"\s*,\s*")
    xs = F.transform(pairs, lambda p: F.split(p, r"\s+").getItem(0).cast("double"))
    ys = F.transform(pairs, lambda p: F.split(p, r"\s+").getItem(1).cast("double"))
    xs, ys = _drop_closing_vertex(xs, ys)
    return df.select(
        F.col(id_col).cast("int").alias("zone_id"), xs.alias("xs"), ys.alias("ys")
    )


def polygons_from_geojson(
    df: DataFrame, json_col: str = "geometry", id_col: str = "zone_id"
) -> DataFrame:
    """Parse a GeoJSON geometry-string column
    (``{"type": "Polygon", "coordinates": [[[x, y], ...]]}``) into the
    (zone_id, xs, ys) layer shape via from_json — the outer ring only."""
    g = F.from_json(F.col(json_col), GEOJSON_SCHEMA)
    ring = g["coordinates"].getItem(0)
    xs = F.transform(ring, lambda p: p.getItem(0))
    ys = F.transform(ring, lambda p: p.getItem(1))
    xs, ys = _drop_closing_vertex(xs, ys)
    return df.select(
        F.col(id_col).cast("int").alias("zone_id"), xs.alias("xs"), ys.alias("ys")
    )


def ring_to_wkt(ring: np.ndarray) -> str:
    """Closed-ring WKT for a (k, 2) ring array.  ``repr`` emits the
    shortest round-trip decimal, so the distributed string->double cast
    recovers the exact binary64 values."""
    pts = [(float(x), float(y)) for x, y in ring] + [(float(ring[0, 0]), float(ring[0, 1]))]
    return "POLYGON ((" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + "))"


def ring_to_geojson(ring: np.ndarray) -> str:
    pts = [[float(x), float(y)] for x, y in ring] + [[float(ring[0, 0]), float(ring[0, 1])]]
    coords = ", ".join("[" + ", ".join(repr(v) for v in p) + "]" for p in pts)
    return f'{{"type": "Polygon", "coordinates": [[{coords}]]}}'


def write_wkt_fixture(path: str, polygons: list[tuple[int, np.ndarray]]) -> str:
    """Serialize a fixture polygon layer as a WKT parquet file (pyarrow,
    driver-side — fixture layers are tiny; production layers arrive as
    parquet already).  Returns ``path``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "zone_id": pa.array([int(z) for z, _ in polygons], pa.int32()),
            "wkt": pa.array([ring_to_wkt(r) for _, r in polygons], pa.string()),
        }
    )
    pq.write_table(table, path)
    return path
