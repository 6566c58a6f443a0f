"""Deterministic polygon fixtures (FIXTURES.md F5) in pixel space.

Polygon = (zone_id, ring ndarray (k,2) of [x,y]); rings are rectilinear or
simple polygons whose pixel-center membership reduces to integer
arithmetic, so the DuckDB oracle can express the identical zone function
as CASE WHEN clauses (see scidbgeo_spark.oracle).

All bounds are integers => half-open [x0,x1) x [y0,y1) membership at pixel
centers (kernels.points_in_ring docstring).
"""

from __future__ import annotations

import numpy as np

ZONE_H = 20  # rect-grid zone height in px
ZONE_W = 20  # rect-grid zone width in px


def _rect(x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def rect_grid_polygons(height: int, width: int) -> list[tuple[int, np.ndarray]]:
    """Axis-aligned rectangles tiling the raster ("states"-like layer,
    config.ini:15).  zone_id = (y div ZONE_H) * (W div ZONE_W) + (x div
    ZONE_W) — the arithmetic the oracle uses directly."""
    nzx = width // ZONE_W
    nzy = height // ZONE_H
    out = []
    for ry in range(nzy):
        for rx in range(nzx):
            out.append(
                (
                    ry * nzx + rx,
                    _rect(rx * ZONE_W, ry * ZONE_H, (rx + 1) * ZONE_W, (ry + 1) * ZONE_H),
                )
            )
    return out


# Mixed polygon layer ("counties"-like): non-convex, diagonal, overlapping.
# Burn order is list order; later polygons overwrite earlier ones
# (gdal.RasterizeLayer behavior).  Pixel-center membership:
#   1 triangle : x>=10 AND y>=10 AND x+y<=38
#   2 L-shape  : (40<=x<60 AND 10<=y<50) OR (60<=x<90 AND 10<=y<30)
#   3 rect A   : 70<=x<95 AND 60<=y<95
#   4 rect B   : 80<=x<100 AND 80<=y<100   (overwrites A in the overlap)
MIXED_POLYGONS: list[tuple[int, np.ndarray]] = [
    (1, np.array([(10.0, 10.0), (30.0, 10.0), (10.0, 30.0)])),
    (
        2,
        np.array(
            [
                (40.0, 10.0),
                (90.0, 10.0),
                (90.0, 30.0),
                (60.0, 30.0),
                (60.0, 50.0),
                (40.0, 50.0),
            ]
        ),
    ),
    (3, _rect(70, 60, 95, 95)),
    (4, _rect(80, 80, 100, 100)),
]


def mixed_zone_numpy(height: int, width: int) -> np.ndarray:
    """NumPy oracle for MIXED_POLYGONS membership (integer arithmetic),
    independent of the ray-cast kernel — used by unit tests."""
    yy, xx = np.mgrid[0:height, 0:width]
    out = np.full((height, width), -999, dtype=np.int32)
    out[(xx >= 10) & (yy >= 10) & (xx + yy <= 38)] = 1
    l1 = (xx >= 40) & (xx < 60) & (yy >= 10) & (yy < 50)
    l2 = (xx >= 60) & (xx < 90) & (yy >= 10) & (yy < 30)
    out[l1 | l2] = 2
    out[(xx >= 70) & (xx < 95) & (yy >= 60) & (yy < 95)] = 3
    out[(xx >= 80) & (xx < 100) & (yy >= 80) & (yy < 100)] = 4
    return out


# ---------------------------------------------------------------------------
# Geo (lon/lat) zone polygons for the PIP join over page points.
# Grid: 60-degree cells covering the world; zone = lon_band * 3 + lat_band.
# ---------------------------------------------------------------------------

GEO_CELL = 60.0


def geo_grid_polygons() -> list[tuple[int, np.ndarray]]:
    out = []
    for i in range(6):  # lon bands [-180, 180)
        for j in range(3):  # lat bands [-90, 90)
            x0, y0 = -180.0 + i * GEO_CELL, -90.0 + j * GEO_CELL
            out.append((i * 3 + j, _rect(x0, y0, x0 + GEO_CELL, y0 + GEO_CELL)))
    return out


# Explicit partial-coverage geo layer (points outside -> no join row).
#   10 rect     : 0<=lon<45, 0<=lat<45      (contains the hot cell)
#   11 L-shape  : (-120<=lon<-60, -60<=lat<0) OR (-60<=lon<-30, -60<=lat<-30)
#   12 rect     : 90<=lon<180, 30<=lat<90
GEO_POLYGONS: list[tuple[int, np.ndarray]] = [
    (10, _rect(0, 0, 45, 45)),
    (
        11,
        np.array(
            [
                (-120.0, -60.0),
                (-30.0, -60.0),
                (-30.0, -30.0),
                (-60.0, -30.0),
                (-60.0, 0.0),
                (-120.0, 0.0),
            ]
        ),
    ),
    (12, _rect(90, 30, 180, 90)),
]

# Multi-ring geo layer (even-odd semantics; oracle GEO_ZONE_HOLED):
#   20 holed  : [0,60)x[-90,-30) MINUS hole [15,30)x[-75,-60)
#   21 multi  : [-45,-15)x[30,60) UNION [60,90)x[-30,0)   (disjoint parts)
# (zone_id, rings, is_multi): is_multi picks MULTIPOLYGON vs
# POLYGON-with-holes WKT — both parse to the same ring rows.
GEO_POLYGONS_HOLED: list[tuple[int, list[np.ndarray], bool]] = [
    (20, [_rect(0, -90, 60, -30), _rect(15, -75, 30, -60)], False),
    (21, [_rect(-45, 30, -15, 60), _rect(60, -30, 90, 0)], True),
]
