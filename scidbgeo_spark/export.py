"""Export / sink paths (SURVEY §2.3).

The reference exports query results as sorted CSV (``save(sort(Q,y,x))``
— SciDBParallel.py:750-754; ``iquery -o csv+`` — scidb.py:44-67) and
re-assembles arrays into GeoTIFFs (scidb.py:192-250 ``OutputToArray`` /
``WriteRaster``).  GDAL isn't available here, but the GeoTIFF write-back
is REAL: small outputs assemble driver-side and serialize through the
pure-NumPy TIFF writer (sources/geotiff.write_tiff), carrying the
geotransform as ModelPixelScale/ModelTiepoint tags — a file the engine's
own ingest (and GDAL) reads back bit-exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scidbgeo_spark.operators.pixel import sorted_export


def write_sorted_csv(coo: DataFrame, path: str, single_file: bool = False) -> None:
    """save(sort(Q, y, x), 'out', 0, 'csv') — distributed unless the
    caller asks for the reference's one-file layout."""
    out = sorted_export(coo)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def write_zonal_csv(stats: DataFrame, path: str) -> None:
    """Zonal-stats CSV with the reference's column order
    ("geoid, min, max, average, count" — scidb.py:64)."""
    stats.orderBy("id").coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def tiles_to_numpy(tiles: DataFrame, height: int, width: int, dtype=np.int64) -> np.ndarray:
    """Assemble a (small!) tile table into a dense 2-D array driver-side —
    the reference's array->GeoTIFF reshape (scidb.py:192-250) minus the
    GDAL write.  Guarded: this is an export path for final small outputs,
    never an operator (big rasters stay distributed)."""
    n_px = height * width
    if n_px > 50_000_000:  # maxPixels-style guard (SciDBParallel.py:11)
        raise ValueError(f"refusing driver-side assemble of {n_px} px; export parquet instead")
    out = np.zeros((height, width), dtype=dtype)
    for t in tiles.select("y0", "x0", "h", "w", "px").collect():
        out[t.y0 : t.y0 + t.h, t.x0 : t.x0 + t.w] = np.asarray(t.px, dtype=dtype).reshape(
            t.h, t.w
        )
    return out


def write_geotiff(
    tiles: DataFrame,
    path: str,
    height: int,
    width: int,
    transform: "GeoTransform | None" = None,
    bigtiff: bool = False,
) -> None:
    """Array -> GeoTIFF write-back (scidb.py:192-250 ``WriteRaster``):
    assemble the (guarded-small) tile table and serialize a real
    uncompressed GeoTIFF with geo tags.  Round-trips through
    sources/geotiff.parse_tiff (and GDAL, which reads the same layout)."""
    from scidbgeo_spark.sources.geotiff import write_tiff

    arr = tiles_to_numpy(tiles, height, width, dtype=np.int32)
    origin = (0.0, 0.0)
    pixel_size = (1.0, 1.0)
    if transform is not None:
        origin = (transform.ul_x, transform.ul_y)
        pixel_size = (transform.x_dist, abs(transform.y_dist))
    data = write_tiff(arr, origin=origin, pixel_size=pixel_size, bigtiff=bigtiff)
    with open(path, "wb") as f:
        f.write(data)


class GeoTransform:
    """Affine geodetic<->pixel mapping — the engine port of
    world2Pixel/Pixel2world (SciDBGDAL.py:12-56), vectorized."""

    def __init__(self, ul_x: float, ul_y: float, x_dist: float, y_dist: float):
        self.ul_x, self.ul_y = ul_x, ul_y
        self.x_dist, self.y_dist = x_dist, y_dist  # y_dist negative for north-up

    def world_to_pixel(self, lon, lat):
        x = np.floor((np.asarray(lon) - self.ul_x) / self.x_dist).astype(np.int64)
        y = np.floor((np.asarray(lat) - self.ul_y) / self.y_dist).astype(np.int64)
        return x, y

    def pixel_to_world(self, x, y):
        lon = np.asarray(x) * self.x_dist + self.ul_x
        lat = np.asarray(y) * self.y_dist + self.ul_y
        return lon, lat
