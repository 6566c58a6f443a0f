"""Large-scale single-box smoke: the two headline pipelines at sizes two
orders of magnitude above the test fixtures, with exact-sum checks.

Reproduces BENCH.md's "Scale smoke" table:

  1. zonal stats end-to-end on a 16384^2 (268M px) raster — pack ->
     rasterize a 670,761-zone polygon grid -> chunk-key join + agg;
     check: sum(count_value) == 16384^2 exactly.
  2. PIP join on 20M points x 18 n-gon zones -> per-zone counts;
     check: sum(n_points) == 20,000,000 exactly (the synthetic layer
     tiles the world, so every point falls in exactly one zone).

Run:  python tools/scale_smoke.py [cores]   (default 16)
Prints one JSON line per workload and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scidbgeo_spark.session import get_spark  # noqa: E402


def zonal_smoke(spark, h: int = 16384, chunk: int = 512, span: int = 20) -> dict:
    from scidbgeo_spark import tiling
    from scidbgeo_spark.kernels import PolyPack
    from scidbgeo_spark.model import VALUE_MOD, VALUE_MULT
    from scidbgeo_spark.operators import zonal

    w = h
    t0 = time.time()
    coo = spark.range(h * w).select(
        F.expr(f"id DIV {w}").alias("y"),
        (F.col("id") % w).alias("x"),
        ((F.col("id") * VALUE_MULT) % VALUE_MOD).alias("value"),
    )
    tiles = tiling.pack_tiles(coo, chunk, h, w)
    pack = PolyPack.rect_grid(h, w, span, span)
    zt = zonal.rasterize_polygons(spark, pack, h, w, chunk)
    rows = zonal.zonal_stats_tiles(tiles, zt).collect()
    wall = time.time() - t0
    total = sum(r.count_value for r in rows)
    return {
        "workload": "zonal_16384",
        "pixels": h * w,
        "zones": (h // span) * (w // span),
        "wall_sec": round(wall, 1),
        "sum_count": total,
        "exact": total == h * w,
        "n_zone_rows": len(rows),
    }


def pip_smoke(spark, n_pts: int = 20_000_000) -> dict:
    # rectangle world tiling (18 zones, 60x60 deg) so every point lands
    # in EXACTLY one zone and the total is checkable exactly
    import numpy as np

    from scidbgeo_spark.operators import pip

    polys = []
    zid = 0
    for cy in range(3):
        for cx in range(6):
            x0, y0 = -180.0 + 60 * cx, -90.0 + 60 * cy
            ring = np.array(
                [[x0, y0], [x0 + 60, y0], [x0 + 60, y0 + 60], [x0, y0 + 60]]
            )
            polys.append((zid, ring))
            zid += 1
    t0 = time.time()
    pts = spark.range(n_pts).select(
        F.col("id").alias("doc_id"),
        (F.lit(-180.0) + ((F.col("id") * 9973) % 360000) / F.lit(1000.0)).alias("lon"),
        (F.lit(-90.0) + ((F.col("id") * 7919) % 180000) / F.lit(1000.0)).alias("lat"),
    )
    layer = pip.prepare_layer(spark, polys)
    rows = (
        pip.pip_join_prepared(pts, layer)
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_points"))
        .collect()
    )
    wall = time.time() - t0
    total = sum(r.n_points for r in rows)
    return {
        "workload": "pip_20m",
        "points": n_pts,
        "zones": len(polys),
        "wall_sec": round(wall, 1),
        "sum_points": total,
        "exact": total == n_pts,
    }


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("scale-smoke", cores=cores, shuffle_partitions=2 * cores)
    results = []
    for fn in (zonal_smoke, pip_smoke):
        r = fn(spark)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "all_exact": all(r["exact"] for r in results),
                "walls": {r["workload"]: r["wall_sec"] for r in results},
            }
        )
    )


if __name__ == "__main__":
    main()
