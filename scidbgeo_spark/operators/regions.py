"""Distributed connected-component labeling over the chunked raster —
the raster -> vector "region" direction of the reference's
rasterize/vectorize pair (SURVEY §2.3; zonal layers go vector -> raster
via zonal.rasterize_polygons, this operator extracts contiguous
equal-class regions back out of a raster).

Textbook block-wise CC, 100-TB-shaped:

1. per-tile labeling (NumPy min-propagation kernel, one pass over each
   chunk row — ``kernels.label_tile``; labels are global min linear ids
   so they merge without renumbering);
2. cross-tile label-adjacency edges from tile-BORDER pixels only (the
   shuffle moves perimeters, not areas);
3. iterative distributed min-propagation over the small label graph
   (DataFrame joins + localCheckpoint, one boolean to the driver per
   round — the same certification-loop shape as operators/knn);
4. one final join maps pixels to their global region root.

No driver-side unions: at 10^12 cells the label graph is still only the
tile-boundary components (perimeter-scale, not area-scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scidbgeo_spark import tiling
from scidbgeo_spark.kernels import label_tile

CLASS_DIV = 86  # value DIV 86 -> 3 classes (a plaque-forming reclass)


def region_classes(coo: DataFrame, class_div: int = CLASS_DIV) -> DataFrame:
    """(y, x, cls): the class raster whose equal-valued plaques are the
    regions to label."""
    return coo.select(
        "y", "x", F.expr(f"value DIV {class_div}").alias("cls")
    )


def _local_labels(tiles: DataFrame, width: int) -> DataFrame:
    """Per-tile kernel pass: (y, x, cls, label) for every cell, label =
    min global id within the tile-local component."""
    import pandas as pd

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for r in pdf.itertuples():
                arr = np.asarray(r.px, dtype=np.int64).reshape(r.h, r.w)
                lab = label_tile(arr, int(r.y0), int(r.x0), width)
                ys = np.repeat(np.arange(r.h, dtype=np.int64) + r.y0, r.w)
                xs = np.tile(np.arange(r.w, dtype=np.int64) + r.x0, r.h)
                yield pd.DataFrame(
                    {"y": ys, "x": xs, "cls": arr.ravel(), "label": lab.ravel()}
                )

    return tiles.mapInPandas(_run, "y long, x long, cls long, label long")


def _boundary_edges(labeled: DataFrame, chunk: int) -> DataFrame:
    """(la, lb) label pairs of 4-adjacent same-class pixels that sit on
    OPPOSITE sides of a tile border — the only places tile-local labels
    can disagree within one region."""
    near_x = (F.col("x") % chunk == 0) | (F.col("x") % chunk == chunk - 1)
    near_y = (F.col("y") % chunk == 0) | (F.col("y") % chunk == chunk - 1)
    b = labeled.filter(near_x | near_y).select("y", "x", "cls", "label")
    a, c = b.alias("a"), b.alias("c")
    right = a.join(
        c,
        (F.col("c.y") == F.col("a.y"))
        & (F.col("c.x") == F.col("a.x") + 1)
        & (F.col("c.cls") == F.col("a.cls"))
        & ((F.col("a.x") + 1) % chunk == 0),
    )
    down = a.join(
        c,
        (F.col("c.x") == F.col("a.x"))
        & (F.col("c.y") == F.col("a.y") + 1)
        & (F.col("c.cls") == F.col("a.cls"))
        & ((F.col("a.y") + 1) % chunk == 0),
    )
    pairs = right.unionAll(down).select(
        F.col("a.label").alias("la"), F.col("c.label").alias("lb")
    )
    return pairs.filter(F.col("la") != F.col("lb")).distinct()


def _resolve_roots(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Connected components of the (small) label graph: each round does
    (1) an edge relaxation — root(l) <- min over neighbors' roots — and
    (2) a POINTER-JUMP — root(l) <- root(root(l)) — so chain depth halves
    every round and convergence is O(log diameter), not O(diameter)
    (64 rounds covers any graph a 2^63-cell raster could produce).  Each
    round is two shuffles over the label graph; the driver sees one
    emptiness boolean per round (no collect of the graph)."""
    both = edges.unionAll(
        edges.select(F.col("lb").alias("la"), F.col("la").alias("lb"))
    ).localCheckpoint()
    m = (
        both.select(F.col("la").alias("l"))
        .distinct()
        .withColumn("root", F.col("l"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nb = (
            both.join(m, both.la == m.l)
            .groupBy(F.col("lb").alias("l2"))
            .agg(F.min("root").alias("nb_root"))
        )
        relaxed = m.join(nb, m.l == nb.l2, "left").select(
            "l",
            F.least(
                F.col("root"), F.coalesce(F.col("nb_root"), F.col("root"))
            ).alias("root"),
        )
        # pointer jump: follow root -> root(root) (halves chain depth)
        r2 = relaxed.select(F.col("l").alias("rl"), F.col("root").alias("rroot"))
        m2 = (
            relaxed.join(r2, relaxed.root == r2.rl, "left")
            .select(
                "l",
                F.least(
                    F.col("root"), F.coalesce(F.col("rroot"), F.col("root"))
                ).alias("root"),
            )
            .localCheckpoint()
        )
        changed = m2.alias("n").join(m.alias("o"), "l").filter(
            F.col("n.root") != F.col("o.root")
        )
        m = m2
        if changed.isEmpty():
            return m
    raise RuntimeError(f"label graph did not converge in {max_rounds} rounds")


# public alias: the same distributed min-propagation engine also powers
# dedup.dedup_clusters (near-dup component extraction over pair edges)
resolve_roots = _resolve_roots


def region_label(
    spark: SparkSession,
    coo: DataFrame,
    height: int,
    width: int,
    chunk: int,
    class_div: int = CLASS_DIV,
) -> DataFrame:
    """(y, x, cls, region): 4-connected equal-class components of the
    raster; region = MIN global linear id (y*width + x) in the component
    — deterministic, so the DuckDB oracle (recursive min-propagation CTE)
    is exact."""
    cls = region_classes(coo, class_div)
    tiles = tiling.pack_tiles(cls, chunk, height, width, value_col="cls")
    # persist: the label-kernel pass feeds three consumers (both sides of
    # the boundary self-join + the final pixel->root join) on different
    # keys — without it the mapInPandas kernel runs three times
    labeled = _local_labels(tiles, width).persist()
    edges = _boundary_edges(labeled, chunk)
    roots = _resolve_roots(edges)
    out = labeled.join(
        roots.withColumnRenamed("l", "label").withColumnRenamed("root", "region"),
        "label",
        "left",
    )
    return out.select(
        "y", "x", "cls", F.coalesce("region", "label").alias("region")
    )


# Registered-query vectorize transform (integer-valued so the WKT
# coordinate strings are bitwise-identical between Spark and DuckDB)
VEC_UL_X, VEC_UL_Y, VEC_X_DIST, VEC_Y_DIST = -180, 90, 2, -2


def region_vectorize(
    labeled_regions: DataFrame,
    ul_x: int = VEC_UL_X,
    ul_y: int = VEC_UL_Y,
    x_dist: int = VEC_X_DIST,
    y_dist: int = VEC_Y_DIST,
) -> DataFrame:
    """(region, cls, n_pixels, wkt): vector FEATURES from the labeled
    raster — each extracted region becomes its world-coordinate envelope
    polygon under the affine geotransform (pixel-corner bbox, GDAL
    Polygonize-to-envelopes analog; the inverse of
    zonal.rasterize_polygons, closing the reference's raster<->vector
    pair, SciDBGDAL.py:12-56 for the affine).  The WKT is the same ring
    format sources/vector.parse_wkt_polygons consumes, so extracted
    features feed straight back into the PIP joins.  One hash-agg over
    region_label output + JVM string algebra — no Python in the plan."""
    stats = region_stats(labeled_regions)
    west = F.lit(ul_x) + F.lit(x_dist) * F.col("x_min")
    east = F.lit(ul_x) + F.lit(x_dist) * (F.col("x_max") + F.lit(1))
    north = F.lit(ul_y) + F.lit(y_dist) * F.col("y_min")
    south = F.lit(ul_y) + F.lit(y_dist) * (F.col("y_max") + F.lit(1))

    def s(c):
        return c.cast("long").cast("string")

    wkt = F.concat(
        F.lit("POLYGON(("),
        s(west), F.lit(" "), s(north), F.lit(","),
        s(east), F.lit(" "), s(north), F.lit(","),
        s(east), F.lit(" "), s(south), F.lit(","),
        s(west), F.lit(" "), s(south), F.lit(","),
        s(west), F.lit(" "), s(north),
        F.lit("))"),
    )
    return stats.select("region", "cls", "n_pixels", wkt.alias("wkt"))


def region_stats(labeled_regions: DataFrame) -> DataFrame:
    """Vector-feature attributes per extracted region: pixel count and
    bounding box — the attribute table a raster->vector conversion emits
    (one codegen hash-agg over region_label's output)."""
    return labeled_regions.groupBy("region").agg(
        # cls is constant within a region; min() keeps the agg deterministic
        F.min("cls").alias("cls"),
        F.count("*").alias("n_pixels"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
    )


def zone_geometry(rings: DataFrame) -> DataFrame:
    """Per-ring geometry audit of a vector layer ``(zone_id, ring_no,
    xs, ys)``: vertex count, shoelace area, area-weighted centroid and
    bbox — the distributed feature-table pass (OGR layer summary) a geo
    pipeline runs before rasterize/PIP to sanity-check an ingested
    layer.

    All per-row array algebra (three F.aggregate folds over the vertex
    index — codegen, zero shuffles, embarrassingly parallel over rings).
    For integer-coordinate layers every product and sum is exact in
    double, so the result is bitwise engine-independent; float layers
    agree to summation order (the folds are left-to-right).  Degenerate
    rings (signed area 0) emit NULL centroids rather than dividing by
    zero under ANSI."""
    n = F.size("xs")

    def wrap(i):  # next vertex index with closure, 1-based element_at
        return (i % n) + 1

    def cross(i):  # x_i * y_{i+1} - x_{i+1} * y_i
        return F.element_at("xs", i) * F.element_at("ys", wrap(i)) - F.element_at(
            "xs", wrap(i)
        ) * F.element_at("ys", i)

    idx = F.sequence(F.lit(1), n)
    s2 = F.aggregate(idx, F.lit(0.0), lambda a, i: a + cross(i))
    sx = F.aggregate(
        idx,
        F.lit(0.0),
        lambda a, i: a + (F.element_at("xs", i) + F.element_at("xs", wrap(i))) * cross(i),
    )
    sy = F.aggregate(
        idx,
        F.lit(0.0),
        lambda a, i: a + (F.element_at("ys", i) + F.element_at("ys", wrap(i))) * cross(i),
    )
    return rings.select(
        "zone_id",
        "ring_no",
        n.cast("long").alias("n_vertices"),
        s2.alias("_s2"),
        sx.alias("_sx"),
        sy.alias("_sy"),
        F.array_min("xs").alias("min_x"),
        F.array_max("xs").alias("max_x"),
        F.array_min("ys").alias("min_y"),
        F.array_max("ys").alias("max_y"),
    ).select(
        "zone_id",
        "ring_no",
        "n_vertices",
        (F.abs(F.col("_s2")) / 2).alias("area"),
        F.when(F.col("_s2") != 0, F.col("_sx") / (3 * F.col("_s2"))).alias("cx"),
        F.when(F.col("_s2") != 0, F.col("_sy") / (3 * F.col("_s2"))).alias("cy"),
        "min_x",
        "max_x",
        "min_y",
        "max_y",
    )


def areal_interpolate(
    a: DataFrame,
    b: DataFrame,
    cell: int = 64,
    value_col: str = "value",
    area_a: int | None = None,
) -> DataFrame:
    """Areal interpolation: transfer a quantity between two INCOMPATIBLE
    rect-zone systems by intersection-area weighting (the classic GIS
    reaggregation between e.g. census tracts and weather grid cells —
    the vector-vector overlay counterpart of zonal.rasterize_polygons'
    vector-raster direction; the reference reaches the same result by
    rasterizing both layers and joining pixels, SciDBParallel.py:700-706,
    which moves AREA-scale data where this moves ZONE-scale data).

    ``a``: source zones ``(zid_a, y0, y1, x0, x1, <value_col>)`` with
    half-open pixel bounds; ``b``: target zones ``(zid_b, y0, y1, x0,
    x1)``.  Coordinates must be non-negative integers (raster pixel
    space).

    100 TB shape: both layers key their rects by the coarse grid cells
    they touch (``F.sequence`` explode, <= 4 cells per rect when spans
    <= ``cell``) and meet in a plain EQUI-join on the cell id — never a
    cross join, never an inequality join; skewed mega-zones fan out
    over more cells and so spread over more reducers by construction.
    Pairs sharing several cells are deduped BEFORE the rollup (the
    intersection is computed identically in every shared cell).

    With ``area_a`` given (uniform source-zone area, e.g. a full-band
    rect grid), ``est_value`` is one exact bigint sum divided once by
    the constant — bitwise engine-independent.  Without it, the
    per-pair ``value * area_int / area_pair`` doubles are summed in
    partition order (documented float caveat, same as zone_geometry's
    float-layer path)."""

    def cells(df: DataFrame, prefix: str) -> DataFrame:
        out = df
        for c in ("y0", "y1", "x0", "x1"):
            out = out.withColumnRenamed(c, f"{prefix}{c}")
        # degenerate (empty) rects would make F.sequence DESCEND
        # (sequence(a, b) with b < a) and fabricate covering cells —
        # drop them before the explode
        out = out.filter(
            (F.col(f"{prefix}y1") > F.col(f"{prefix}y0"))
            & (F.col(f"{prefix}x1") > F.col(f"{prefix}x0"))
        )
        return out.withColumn(
            "ccell",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(
                            F.expr(f"{prefix}y0 DIV {cell}"),
                            F.expr(f"({prefix}y1 - 1) DIV {cell}"),
                        ),
                        lambda cy: F.transform(
                            F.sequence(
                                F.expr(f"{prefix}x0 DIV {cell}"),
                                F.expr(f"({prefix}x1 - 1) DIV {cell}"),
                            ),
                            lambda cx: cy * F.lit(1 << 31).cast("long") + cx,
                        ),
                    )
                )
            ),
        )

    j = cells(a, "a").join(cells(b, "b"), "ccell")
    iy0 = F.greatest("ay0", "by0")
    iy1 = F.least("ay1", "by1")
    ix0 = F.greatest("ax0", "bx0")
    ix1 = F.least("ax1", "bx1")
    pairs = (
        j.filter((iy1 > iy0) & (ix1 > ix0))
        .select(
            "zid_a",
            "zid_b",
            F.col(value_col).alias("_v"),
            ((iy1 - iy0) * (ix1 - ix0)).cast("long").alias("_ia"),
            ((F.col("ay1") - F.col("ay0")) * (F.col("ax1") - F.col("ax0")))
            .cast("long")
            .alias("_aa"),
        )
        .dropDuplicates(["zid_a", "zid_b"])
    )
    g = pairs.groupBy("zid_b").agg(
        F.count("*").alias("n_parts"),
        F.sum("_ia").alias("covered_area"),
        F.sum(F.col("_v") * F.col("_ia")).alias("_num"),
        F.sum(F.col("_v") * F.col("_ia") / F.col("_aa")).alias("_est_f"),
    )
    est = (
        (F.col("_num") / F.lit(float(area_a)))
        if area_a is not None
        else F.col("_est_f")
    )
    return g.select(
        "zid_b", "n_parts", "covered_area", est.alias("est_value")
    )


def region_sieve(
    spark: SparkSession,
    coo: DataFrame,
    height: int,
    width: int,
    chunk: int,
    min_pixels: int = 3,
    class_div: int = CLASS_DIV,
) -> DataFrame:
    """GDAL SieveFilter analog, one deterministic pass: regions smaller
    than ``min_pixels`` flip their WHOLE footprint to the class of
    their largest 4-adjacent neighbor region (ties -> smallest region
    id; a small region with no neighbor keeps its class).  Output
    (y, x, cls_out) for every cell.  GDAL iterates until stable; the
    one-pass rule here is deterministic on both engines, which is what
    makes the result value-hashable — the docstringed contract, not an
    accident.

    Scale shape: builds on region_label's block-wise CC; the extra work
    is region ADJACENCY — a shifted self-join that emits only region-
    PERIMETER cell pairs — plus two broadcast-size joins on the region
    table (regions are orders of magnitude fewer than cells; at 100 TB
    the perimeter join is the same exchange the boundary-merge step
    already pays)."""
    labeled = region_label(spark, coo, height, width, chunk, class_div).persist()
    st = labeled.groupBy("region").agg(
        F.count("*").alias("n_pixels"), F.min("cls").alias("rcls")
    )
    a = labeled.select("y", "x", "region")
    b_right = labeled.select(
        (F.col("y")).alias("y"), (F.col("x") - 1).alias("x"),
        F.col("region").alias("region_b"),
    )
    b_down = labeled.select(
        (F.col("y") - 1).alias("y"), (F.col("x")).alias("x"),
        F.col("region").alias("region_b"),
    )
    adj0 = (
        a.join(b_right, ["y", "x"]).select("region", "region_b")
        .unionByName(a.join(b_down, ["y", "x"]).select("region", "region_b"))
        .filter(F.col("region") != F.col("region_b"))
    )
    adj = (
        adj0.unionByName(
            adj0.select(
                F.col("region_b").alias("region"),
                F.col("region").alias("region_b"),
            )
        )
        .distinct()
    )
    choice = (
        adj.join(
            st.select(
                F.col("region").alias("region_b"),
                F.col("n_pixels").alias("nb_n"),
                F.col("rcls").alias("nb_cls"),
            ),
            "region_b",
        )
        .groupBy("region")
        .agg(
            F.max(
                F.struct(
                    F.col("nb_n"), (-F.col("region_b")).alias("neg_id"), "nb_cls"
                )
            ).alias("best")
        )
        .select("region", F.col("best.nb_cls").alias("new_cls"))
    )
    small = st.filter(F.col("n_pixels") < min_pixels).select("region")
    flip = small.join(choice, "region", "left")
    return (
        labeled.join(F.broadcast(flip), "region", "left")
        .select(
            "y",
            "x",
            F.when(
                flip.new_cls.isNotNull(), F.col("new_cls")
            )
            .otherwise(F.col("cls"))
            .alias("cls_out"),
        )
    )
