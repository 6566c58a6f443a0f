"""kNN join via grid-cell ring expansion with certified fallback.

No reference analog (north rule addition).  For a small query set Q and a
huge point table P, the engine:

1. computes each point's coarse grid cell (pure column arithmetic —
   pushdown-friendly);
2. iteratively filters P to cells within Chebyshev ring radius r of any
   query cell (broadcast cell set -> partition-prunable IN filter), joins
   the broadcast query table, and takes exact top-k per query;
3. **certifies** the result: any point outside radius-r rings is at
   Euclidean distance >= r*cell, so if every query's k-th candidate
   distance is < r*cell the top-k is globally exact; otherwise r doubles
   (sort-merge-free full scan is the final fallback).

Distances are squared-Euclidean on a flat lon/lat plane (matching the
oracle); ties break on doc_id so ranking is total and deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CELL = 15.0  # ring-expansion cell size in degrees
NX = int(360 / CELL)
NY = int(180 / CELL)


def _cells_in_ring(qcy: int, qcx: int, r: int) -> set[int]:
    cells = set()
    for cy in range(max(0, qcy - r), min(NY - 1, qcy + r) + 1):
        for cx in range(max(0, qcx - r), min(NX - 1, qcx + r) + 1):
            cells.add(cy * NX + cx)
    return cells


def knn(
    spark: SparkSession,
    points: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """queries: small DataFrame (q_id, qlon, qlat) — collected to the
    driver (bounded by design: the query side of a kNN join is the small
    side; the reference's analog is the broadcast-right equi_join).

    Returns (q_id, doc_id, rank) with rank 1..k.
    """
    qrows = queries.collect()
    qcells = [
        (int((r.qlat + 90) // CELL), int((r.qlon + 180) // CELL)) for r in qrows
    ]
    max_r = max(NX, NY)

    pts = points.withColumn(
        "cell",
        (F.floor((F.col("lat") + 90.0) / CELL) * NX + F.floor((F.col("lon") + 180.0) / CELL)).cast(
            "long"
        ),
    )
    d2 = (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")) + (
        F.col("lat") - F.col("qlat")
    ) * (F.col("lat") - F.col("qlat"))
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("doc_id"))

    r = 1
    while True:
        exact = r >= max_r  # full scan: no pruning filter, always certified
        if exact:
            cand_pts = pts
        else:
            allowed = set()
            for qcy, qcx in qcells:
                allowed |= _cells_in_ring(qcy, qcx, r)
            cand_pts = pts.filter(F.col("cell").isin([int(c) for c in allowed]))
        topk = (
            cand_pts.join(F.broadcast(queries))
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "doc_id", "rank", "d2")
        )
        if exact:
            break
        # certification: per-query k-th distance must beat the pruning bound
        kth = topk.groupBy("q_id").agg(F.max("d2").alias("dk"), F.count("*").alias("n")).collect()
        bound = (r * CELL) ** 2
        if len(kth) == len(qrows) and all(
            row.n >= min(k, 1) and row.n == k and row.dk < bound for row in kth
        ):
            break
        r *= 2
        r = min(r, max_r)
    return topk.select("q_id", "doc_id", "rank")


def knn_queries_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query points derived from the nation table (oracle.py
    'knn' uses the identical arithmetic)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return nation.filter(F.col("n_nationkey") < 5).select(
        F.col("n_nationkey").alias("q_id"),
        (F.lit(-180.0) + ((F.col("n_nationkey") * 77777) % 360000) / F.lit(1000.0)).alias("qlon"),
        (F.lit(-90.0) + ((F.col("n_nationkey") * 33333) % 180000) / F.lit(1000.0)).alias("qlat"),
    )
