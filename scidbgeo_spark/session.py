"""SparkSession factory with scale-aware defaults.

Local mode is the sandbox stand-in for a multi-executor cluster; all
configs below are the ones that transfer (AQE, Arrow, shuffle sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_AQE = "false" if os.environ.get("SPARK_GRAFT_AQE") == "0" else "true"


def get_spark(
    app: str = "scidbgeo-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime coalesce + skew-join splitting (the engine also salts
      known-hot keys explicitly; AQE is the backstop).
    - Arrow on: every pandas-UDF kernel moves data in columnar batches.
    - shuffle partitions ~ cores for local mode (not the 200 default).
    """
    cores = cores or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # AQE on by default; SPARK_GRAFT_AQE=0 disables it for scaling
        # measurements where per-stage re-planning is a fixed driver cost
        # that biases small-job core-count ratios
        .config("spark.sql.adaptive.enabled", _AQE)
        .config("spark.sql.adaptive.coalescePartitions.enabled", _AQE)
        .config("spark.sql.adaptive.skewJoin.enabled", _AQE)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
