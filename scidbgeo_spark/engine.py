"""User-facing facade: the reference's class surface, Spark-native.

A user of the reference drives three objects — ``iquery``/``Statements``
(scidb.py), ``RasterLoader``/``ZonalStats`` (SciDBParallel.py) — plus the
``SciDB_analysis.py`` CLI.  This facade exposes the same verbs on Spark
DataFrames so that switching is a rename, not a rewrite:

    eng = SciDBGeoEngine(spark)
    eng.create_array("r", coo, height=H, width=W, chunk=50)   # redimension
    eng.zonal_statistics("r", polygons)                       # flagship
    eng.count_pixels("r", 42); eng.reclassify("r", 87, 1000)
    eng.focal_mean_sum("r"); eng.raster_add("r", "r")
    eng.between("r", ...); eng.subarray("r", ...)
    eng.versions() / eng.remove("r") / eng.show("r")

Arrays are named chunk tables tracked by the catalog facade; every method
returns a DataFrame (lazy — the caller decides when to execute).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from scidbgeo_spark import tiling
from scidbgeo_spark.catalog import ArrayCatalog
from scidbgeo_spark.operators import focal, pixel, zonal


class SciDBGeoEngine:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.catalog = ArrayCatalog(spark, warehouse)
        self._meta: dict[str, tuple[int, int, int]] = {}  # name -> (H, W, chunk)

    # -- DDL / lifecycle (scidb.py:267-294, 126-156) -------------------------
    def create_array(
        self, name: str, coo: DataFrame, height: int, width: int, chunk: int
    ) -> DataFrame:
        """create array + load + redimension-insert in one step."""
        tiles = tiling.pack_tiles(coo, chunk, height, width)
        self.catalog.register(name, tiles)
        self._meta[name] = (height, width, chunk)
        return tiles

    def remove(self, name: str) -> None:
        self.catalog.remove(name)
        self._meta.pop(name, None)

    def show(self, name: str) -> str:
        return self.catalog.show(name)

    def versions(self) -> list[str]:
        return self.catalog.list_arrays()

    def _tiles(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def _dims(self, name: str) -> tuple[int, int, int]:
        return self._meta[name]

    # -- the five analytics (SciDB_analysis.py) ------------------------------
    def zonal_statistics(
        self, name: str, polygons: list[tuple[int, np.ndarray]]
    ) -> DataFrame:
        h, w, chunk = self._dims(name)
        zt = zonal.rasterize_polygons(self.spark, polygons, h, w, chunk)
        return zonal.zonal_stats_tiles(self._tiles(name), zt)

    def count_pixels(self, name: str, value: int) -> DataFrame:
        return pixel.count_pixels_tiles(self._tiles(name), value)

    def reclassify(self, name: str, old: int, new: int, other: int = -99) -> DataFrame:
        return pixel.reclassify_tiles(self._tiles(name), old, new, other)

    def focal_mean_sum(self, name: str) -> DataFrame:
        h, w, chunk = self._dims(name)
        return focal.focal_mean_sum36(self._tiles(name), h, w, chunk)

    def focal_mean(self, name: str, radius: int = 1) -> DataFrame:
        """window(A, r, r, r, r, avg) as chunk rows, any radius."""
        h, w, chunk = self._dims(name)
        return focal.focal_mean_tiles(self._tiles(name), h, w, chunk, radius)

    def focal_minmax(self, name: str, radius: int = 1) -> DataFrame:
        """window(A, r, r, r, r, min/max) as COO rows, any radius."""
        h, w, chunk = self._dims(name)
        return focal.focal_extrema_coo(self._tiles(name), h, w, chunk, radius)

    def focal_variance(self, name: str, radius: int = 1) -> DataFrame:
        """window(A, r, r, r, r, var) as COO rows: exact-integer
        n/sum/nvar plus the var_pop double (texture filter)."""
        h, w, chunk = self._dims(name)
        return focal.focal_var_coo(self._tiles(name), h, w, chunk, radius)

    def edge_density(self, name: str, class_div: int = 86) -> DataFrame:
        """Rook-adjacent unordered class-pair edge counts (landscape
        adjacency/contagion matrix) over value DIV class_div classes."""
        h, w, chunk = self._dims(name)
        return focal.edge_density_coo(self._tiles(name), h, w, chunk, class_div)

    def terrain(self, name: str) -> DataFrame:
        """Horn 3x3 surface derivatives as COO rows: integer gradients,
        slope, aspect octant (d8), hillshade (interior cells)."""
        h, w, chunk = self._dims(name)
        return focal.terrain_coo(self._tiles(name), h, w, chunk)

    def flow_accum(self, name: str) -> DataFrame:
        """D8 flow accumulation: per cell, the exact count of cells
        whose steepest-descent path drains through it (acc > 0 only)."""
        h, w, chunk = self._dims(name)
        return focal.flow_accum_coo(self._tiles(name), h, w, chunk)

    def zonal_mode(self, name: str, polygons) -> DataFrame:
        """Majority pixel value per zone."""
        h, w, chunk = self._dims(name)
        zt = zonal.rasterize_polygons(self.spark, polygons, h, w, chunk)
        return zonal.zonal_mode(self._tiles(name), zt)

    def zonal_variance(self, name: str, polygons) -> DataFrame:
        """Exact population variance + stddev per zone."""
        h, w, chunk = self._dims(name)
        zt = zonal.rasterize_polygons(self.spark, polygons, h, w, chunk)
        return zonal.zonal_variance(self._tiles(name), zt)

    def raster_add(self, a: str, b: str) -> DataFrame:
        return pixel.overlay_add_tiles(self._tiles(a), self._tiles(b))

    # -- dimension-range ops --------------------------------------------------
    def between(self, name: str, y_min: int, x_min: int, y_max: int, x_max: int) -> DataFrame:
        _, _, chunk = self._dims(name)
        pruned = pixel.between_tiles(self._tiles(name), chunk, y_min, x_min, y_max, x_max)
        return pixel.between(tiling.tiles_to_coo(pruned, "value"), y_min, x_min, y_max, x_max)

    def subarray(self, name: str, y_min: int, x_min: int, y_max: int, x_max: int) -> DataFrame:
        return pixel.subarray(
            tiling.tiles_to_coo(self._tiles(name), "value"), y_min, x_min, y_max, x_max
        )

    def upsample(self, name: str, ry: int = 2, rx: int = 2) -> DataFrame:
        """xgrid(A, ry, rx): shuffle-free cell expansion."""
        return pixel.upsample(tiling.tiles_to_coo(self._tiles(name), "value"), ry, rx)

    def sample(self, name: str, permille: int = 250, seed: int = 42) -> DataFrame:
        """bernoulli(A, p, seed): deterministic seeded cell sampling."""
        return pixel.bernoulli_sample(
            tiling.tiles_to_coo(self._tiles(name), "value"), permille, seed
        )

    def pyramid(self, name: str, levels: int = 3, factor: int = 2) -> DataFrame:
        """Overview pyramid, all levels in one query — true base-block
        means via cascading (sum, count) partials; base scanned once."""
        return pixel.raster_pyramid(
            tiling.tiles_to_coo(self._tiles(name), "value"), levels, factor
        )

    def layer_geometry(self, rings: DataFrame) -> DataFrame:
        """Per-ring geometry audit of a vector layer (vertex count,
        shoelace area, centroid, bbox) — the OGR feature-summary pass."""
        from scidbgeo_spark.operators import regions

        return regions.zone_geometry(rings)

    # -- raster -> vector -----------------------------------------------------
    def extract_regions(self, name: str, class_div: int | None = None) -> DataFrame:
        """Connected-component region labeling over the stored array."""
        from scidbgeo_spark.operators import regions

        h, w, chunk = self._dims(name)
        coo = tiling.tiles_to_coo(self._tiles(name), "value")
        kw = {} if class_div is None else {"class_div": class_div}
        return regions.region_label(self.spark, coo, h, w, chunk, **kw)

    def vectorize(self, name: str, **transform) -> DataFrame:
        """Region envelope features as WKT under the affine transform."""
        from scidbgeo_spark.operators import regions

        return regions.region_vectorize(self.extract_regions(name), **transform)

    # -- ingest (GDALtoSciDB_multiprocessing.py driver analog) ---------------
    def load_geotiff(
        self, name: str, path: str, chunk: int = 50
    ) -> DataFrame:
        """Real-file ingest: GeoTIFF bytes -> COO -> chunk table, all
        distributed (binaryFile + strip-window parse)."""
        from scidbgeo_spark.sources.geotiff import geotiff_coo, tiff_dims

        coo = geotiff_coo(self.spark, path)
        # dims via a BOUNDED header read (8-byte magic + one IFD), not a
        # whole-file driver fetch — at production file sizes
        # binaryFile + .first() is a driver OOM (r3 verdict)
        h, w = tiff_dims(path)
        return self.create_array(name, coo, h, w, chunk)

    def load_geotiff_3d(self, path: str) -> DataFrame:
        """Multiband ingest: pixel-interleaved GeoTIFF -> 3-D chunk table
        (band, tile) keyed — the reference's [band;y;x] array load."""
        from scidbgeo_spark.sources.geotiff import geotiff_coo_3d, tiff_dims

        coo3 = geotiff_coo_3d(self.spark, path)
        h, w = tiff_dims(path)
        return tiling.pack_tiles_3d(coo3, 50, h, w)

    def load_vector_layer(
        self, path: str, fmt: str = "wkt", geom_col: str | None = None
    ) -> DataFrame:
        """Vector layer file -> polygon-layer DataFrame, parsed
        distributed (the OGR shapefile-load analog,
        SciDB_ZonalStats_CL.py:443-445).  ``fmt``: 'wkt' / 'geojson'
        emit single-ring (zone_id, xs, ys); 'wkt_rings', 'shp' and
        'gpkg' emit the multi-ring (zone_id, ring_no, xs, ys) shape
        (holes / MULTIPOLYGON, even-odd recombined by pip_join_df)."""
        from scidbgeo_spark.sources import shapefile, vector

        if fmt == "shp":
            return shapefile.polygons_from_shp(
                self.spark, path, zone_field=geom_col or "zone_id"
            )
        if fmt == "gpkg":
            from scidbgeo_spark.sources import geopackage

            return geopackage.polygons_from_gpkg(
                self.spark, path, zone_field=geom_col or "zone_id"
            )
        df = self.spark.read.parquet(path)
        if fmt == "wkt":
            return vector.polygons_from_wkt(df, wkt_col=geom_col or "wkt")
        if fmt == "wkt_rings":
            return vector.rings_from_wkt(df, wkt_col=geom_col or "wkt")
        if fmt == "geojson":
            return vector.polygons_from_geojson(df, json_col=geom_col or "geometry")
        if fmt == "geojson_rings":
            return vector.rings_from_geojson(df, json_col=geom_col or "geometry")
        raise ValueError(f"unknown vector format {fmt!r}")

    def pip_join_layer(self, points: DataFrame, layer: DataFrame, mode: str = "auto") -> DataFrame:
        """Point-in-polygon join against a loaded vector layer."""
        from scidbgeo_spark.operators import pip

        return pip.pip_join_df(self.spark, points, layer, mode=mode)

    # -- export ---------------------------------------------------------------
    def save_csv(self, name: str, path: str) -> None:
        from scidbgeo_spark.export import write_sorted_csv

        write_sorted_csv(tiling.tiles_to_coo(self._tiles(name), "value"), path)

    def save_geotiff(self, name: str, path: str, transform=None) -> None:
        """Array -> GeoTIFF write-back (scidb.py:192-250 analog)."""
        from scidbgeo_spark.export import write_geotiff

        h, w, _ = self._dims(name)
        write_geotiff(self._tiles(name), path, h, w, transform=transform)
