"""Scale-adaptive scan fan-out.

A single small parquet file yields one (or, under a union, a handful of)
scan partition(s), so every CPU-heavy per-row operator upstream of the
first exchange — gram/shingle hashing, ray-cast refinement, distance
kernels — runs nearly serial no matter how many cores the cluster has
(measured: dup_span_dedup wall 2.8 s with 2.5 core-seconds of executor
time spread over 3 tasks at sf0.1).  This is the optimization guide's
"input skew: one huge unsplittable file ... repartition immediately
after the read" (§2.5), made conditional so it is a no-op whenever the
source already provides enough parallelism (many files / large splits /
spark.range) — the repartition must never add a shuffle to inputs that
do not need it, and the condition derives from the actual scan
partitioning, not a constant tuned to this sandbox.

Correctness: every operator this feeds is partitioning-independent
(pinned by the partitioning-invariance tests), and the repartition
hash-distributes on caller-named DETERMINISTIC key columns (never
rand(); guide §2.5 on retry-safety under fetch failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(
    df: DataFrame, *key_cols: str, factor: int = 1, min_bytes: int = 0
) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current (scan-derived) partitioning offers less than half that —
    otherwise return it untouched.  ``key_cols`` pick the deterministic
    hash-distribution key (a unique id spreads evenly); with none given,
    round-robin is used (pays the sort-before-repartition safety sort —
    prefer a key).  ``factor`` multiplies the target for operators whose
    per-row cost is very uneven.

    ``min_bytes`` gates the whole decision on the optimizer's size
    estimate (a cheap stats read, no RDD build): operators whose per-row
    cost is modest (e.g. the vectorized PIP refine) only benefit once
    the input is large enough that serial execution actually binds, and
    below the gate the repartition's own exchange costs more than it
    saves (measured at sf0.1: pip_grid +0.3 s with an unconditional
    fan-out).  CPU-dense operators (gram/shingle hashing, cosine
    sweeps) pass ``min_bytes=0`` — they win even on sub-MB inputs."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        if min_bytes > 0:
            est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            if est < min_bytes:
                return df
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only probe must never kill a query
        return df
    if current * 2 >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
