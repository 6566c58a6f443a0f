"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "tiles_pages_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "scaling": {...}}

The north metric is tiles+pages processed/sec over the zonal-stats +
PIP-join pair (BASELINE.json).  The two-cluster-size scaling criterion is
evidenced by running the same scale-up workload (a deterministic synthetic
raster + point set large enough to be compute-bound) at local[8] and
local[32] and reporting throughput at both plus efficiency
(= thr_32 / (4 * thr_8)); this is the sandbox stand-in for N vs 4N
executors (no real cluster available).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from scidbgeo_spark import fixtures, tiling
from scidbgeo_spark.model import CHUNK, VALUE_MOD, VALUE_MULT
from scidbgeo_spark.operators import pip, zonal

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_H = int(os.environ.get("BENCH_SCALE_H", "4096"))  # synthetic raster for scaling runs
SCALE_PTS = int(os.environ.get("BENCH_SCALE_PTS", "2000000"))

HEADLINE = [
    "zonal_stats_rect",
    "zonal_stats_poly",
    "pip_grid",
    "focal_mean_sum",
    "raster_add",
    "count_pixels",
    "knn",
]


def _session(cores: int) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from scidbgeo_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=cores)


def synth_raster_tiles(spark: SparkSession, height: int, width: int, chunk: int):
    """Deterministic synthetic raster straight from spark.range (no
    external data) packed into chunk rows."""
    coo = spark.range(height * width).select(
        F.expr(f"id DIV {width}").alias("y"),
        (F.col("id") % width).alias("x"),
        ((F.col("id") * VALUE_MULT) % VALUE_MOD).alias("value"),
    )
    return tiling.pack_tiles(coo, chunk, height, width)


def synth_points(spark: SparkSession, n: int):
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("doc_id"),
        (F.lit(-180.0) + ((F.col("id") * 9973) % 360000) / F.lit(1000.0)).alias("lon"),
        (F.lit(-90.0) + ((F.col("id") * 7919) % 180000) / F.lit(1000.0)).alias("lat"),
    )


def scale_workload(spark: SparkSession) -> tuple[float, float]:
    """(tiles processed, pages processed) per the north metric, on the
    synthetic scale-up inputs.  Returns (units, seconds)."""
    h = w = SCALE_H
    chunk = 256
    t0 = time.time()
    tiles = synth_raster_tiles(spark, h, w, chunk)
    zt = zonal.rasterize_polygons(
        spark, fixtures.rect_grid_polygons(h, w), h, w, chunk
    )
    zonal.zonal_stats_tiles(tiles, zt).collect()
    pts = synth_points(spark, SCALE_PTS)
    pip.pip_counts(spark, pts, fixtures.geo_grid_polygons()).collect()
    dt = time.time() - t0
    n_tiles = (h // chunk) * (w // chunk)
    return n_tiles + SCALE_PTS, dt


def main() -> None:
    spark = _session(CPUS)
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        times[name] = round(time.time() - t0, 3)

    # north metric at sf dir: tiles+pages over the zonal+PIP pair
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_tiles = -(-(n_events // 100) // CHUNK) * -(-100 // CHUNK)
    pair_sec = times["zonal_stats_rect"] + times["pip_grid"]
    throughput = (n_tiles + n_docs) / pair_sec if pair_sec > 0 else 0.0

    # scaling: same synthetic workload at N=8 and 4N=32 threads
    scaling = {}
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        units8, sec8 = 0.0, 0.0
        s8 = _session(8)
        units8, sec8 = scale_workload(s8)
        s32 = _session(32)
        units32, sec32 = scale_workload(s32)
        thr8, thr32 = units8 / sec8, units32 / sec32
        scaling = {
            "n": 8,
            "sec_n": round(sec8, 2),
            "throughput_n": round(thr8, 1),
            "4n": 32,
            "sec_4n": round(sec32, 2),
            "throughput_4n": round(thr32, 1),
            "efficiency": round(thr32 / (4 * thr8), 3),
        }

    out = {
        "metric": "tiles_pages_per_sec",
        "value": round(throughput, 2),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
