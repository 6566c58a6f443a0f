"""spark-submit entry point: run any registered engine query on a cluster.

The north-rule launch shape (BASELINE.json: "run via spark-submit
--py-files on a multi-executor cluster"):

    python tools/make_pyfiles.py                       # build dist zip
    spark-submit --master <cluster> \\
        --py-files dist/scidbgeo_spark.zip \\
        tools/submit_job.py --query zonal_stats_rect \\
        --sf-dir /data/sf0.1 [--show N]

The script only uses ``SparkSession.builder.getOrCreate()`` — master,
executor counts and memory all come from spark-submit, so the SAME
command line runs on local[N], YARN or k8s at N and 4N executors.
Workers import the package from the --py-files zip; the driver imports
the query registry from the repo checkout (shipped alongside or on the
driver node).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", required=True, help="queries() key to run")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=0, help="print first N rows")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = SparkSession.builder.appName(f"scidbgeo-{args.query}").getOrCreate()
    qs = entrymod.queries()
    if args.query not in qs:
        raise SystemExit(f"unknown query {args.query!r}; known: {sorted(qs)}")
    t0 = time.time()
    df = qs[args.query](spark, args.sf_dir)
    n = df.count()
    out = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "rows": n,
        "sec": round(time.time() - t0, 3),
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    if args.show:
        out["head"] = [r.asDict() for r in df.limit(args.show).collect()]
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
