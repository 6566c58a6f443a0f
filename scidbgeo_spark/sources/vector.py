"""Vector-layer file readers: WKT and GeoJSON polygon columns -> the
``(zone_id, xs, ys)`` polygon-layer DataFrame that ``pip.pip_join_df``
consumes.

The reference loads vector layers through OGR on the driver
(SciDB_ZonalStats_CL.py:443-445 ``driver.Open(shapePath, 0)``); here the
layer is a parquet/JSON-lines column parsed DISTRIBUTED with pure column
algebra (regexp + split + transform for WKT, from_json for GeoJSON), so a
millions-of-polygons layer never touches the driver.

``polygons_from_wkt`` / ``polygons_from_geojson`` parse single-ring
POLYGON into (zone_id, xs, ys); ``rings_from_wkt`` parses POLYGON with
holes and MULTIPOLYGON into the multi-ring (zone_id, ring_no, xs, ys)
layer that ``pip.pip_join_df`` recombines under even-odd semantics —
every innermost parenthesized ring becomes its own row, so both
geometry kinds reduce to the same row shape.
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

# MultiPolygon nests one level deeper: polygons -> rings -> points
GEOJSON_MULTI_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "coordinates",
            T.ArrayType(T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
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


def rings_from_wkt(
    df: DataFrame, wkt_col: str = "wkt", id_col: str = "zone_id"
) -> DataFrame:
    """Parse POLYGON-with-holes / MULTIPOLYGON WKT into the multi-ring
    ``(zone_id, ring_no, xs, ys)`` layer — regexp_extract_all over
    innermost parenthesized groups + posexplode, fully distributed.
    Under even-odd combination the POLYGON/MULTIPOLYGON distinction is
    irrelevant: every ring is just a crossing-test term, so one pattern
    handles both."""
    rings = F.regexp_extract_all(F.col(wkt_col), F.lit(r"\(([^()]+)\)"), 1)
    exploded = df.select(
        F.col(id_col).cast("int").alias("zone_id"),
        F.posexplode(rings).alias("ring_no", "body"),
    )
    pairs = F.split(F.trim(F.col("body")), r"\s*,\s*")
    xs = F.transform(pairs, lambda p: F.split(p, r"\s+").getItem(0).cast("double"))
    ys = F.transform(pairs, lambda p: F.split(p, r"\s+").getItem(1).cast("double"))
    xs, ys = _drop_closing_vertex(xs, ys)
    return exploded.select(
        "zone_id", F.col("ring_no").cast("int"), xs.alias("xs"), ys.alias("ys")
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


def rings_from_geojson(
    df: DataFrame, json_col: str = "geometry", id_col: str = "zone_id"
) -> DataFrame:
    """Parse GeoJSON Polygon (all rings, including holes) AND
    MultiPolygon geometry strings into the multi-ring
    ``(zone_id, ring_no, xs, ys)`` layer.  Both shapes reduce to a flat
    ring list — Polygon's coordinates ARE rings, MultiPolygon's flatten
    one level — and even-odd recombination makes ring provenance
    irrelevant.  Pure column algebra (from_json at both depths + when),
    fully distributed."""
    g3 = F.from_json(F.col(json_col), GEOJSON_SCHEMA)
    g4 = F.from_json(F.col(json_col), GEOJSON_MULTI_SCHEMA)
    rings = F.when(g3["type"] == "Polygon", g3["coordinates"]).otherwise(
        F.flatten(g4["coordinates"])
    )
    exploded = df.select(
        F.col(id_col).cast("int").alias("zone_id"),
        F.posexplode(rings).alias("ring_no", "ring"),
    )
    xs = F.transform("ring", lambda p: p.getItem(0))
    ys = F.transform("ring", lambda p: p.getItem(1))
    xs, ys = _drop_closing_vertex(xs, ys)
    return exploded.select(
        "zone_id", F.col("ring_no").cast("int"), xs.alias("xs"), ys.alias("ys")
    )


def geometry_to_geojson(rings: list[np.ndarray], multi: bool = False) -> str:
    """GeoJSON twin of geometry_to_wkt."""

    def ring_body(r: np.ndarray) -> str:
        return (
            "["
            + ", ".join(f"[{x!r}, {y!r}]" for x, y in _closed(r))
            + "]"
        )

    if multi:
        coords = ", ".join(f"[{ring_body(r)}]" for r in rings)
        return f'{{"type": "MultiPolygon", "coordinates": [{coords}]}}'
    coords = ", ".join(ring_body(r) for r in rings)
    return f'{{"type": "Polygon", "coordinates": [{coords}]}}'


def _closed(ring: np.ndarray) -> list[tuple[float, float]]:
    return [(float(x), float(y)) for x, y in ring] + [
        (float(ring[0, 0]), float(ring[0, 1]))
    ]


def geometry_to_wkt(rings: list[np.ndarray], multi: bool = False) -> str:
    """WKT for a ring list: ``multi=False`` -> POLYGON with hole rings,
    ``multi=True`` -> MULTIPOLYGON of single-ring parts.  ``repr``
    decimals round-trip binary64 exactly (see ring_to_wkt)."""

    def ring_body(r: np.ndarray) -> str:
        return "(" + ", ".join(f"{x!r} {y!r}" for x, y in _closed(r)) + ")"

    if multi:
        return "MULTIPOLYGON (" + ", ".join(f"({ring_body(r)})" for r in rings) + ")"
    return "POLYGON (" + ", ".join(ring_body(r) for r in rings) + ")"


def write_wkt_rings_fixture(
    path: str, polygons: list[tuple[int, list[np.ndarray], bool]]
) -> str:
    """Serialize (zone_id, rings, is_multi) fixtures as a WKT parquet —
    POLYGON-with-holes or MULTIPOLYGON per row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "zone_id": pa.array([int(z) for z, _, _ in polygons], pa.int32()),
            "wkt": pa.array(
                [geometry_to_wkt(rs, multi=m) for _, rs, m in polygons], pa.string()
            ),
        }
    )
    pq.write_table(table, path)
    return path


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
