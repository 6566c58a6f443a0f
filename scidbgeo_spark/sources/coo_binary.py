"""COO binary sink/source — the reference's parallel-load file format.

The reference serializes each raster window as packed little-endian
records ``(y1:int64, x1:int64, value:int64)`` via
``np.core.records.fromarrays(...).tofile(...)``
(GDALtoSciDB_multiprocessing.py:375-430 ``WriteArray``) and feeds the
files to SciDB's ``load(..., -1)`` one-file-per-instance parallel load
(SciDBParallel.py:833-842).  The engine writes the identical byte layout
DISTRIBUTED — one file per Spark partition, the per-instance sharding
analog — and reads it back through the ``binaryFile`` source with a
zero-copy ``np.frombuffer`` per file.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

COO_DTYPE = np.dtype([("y", "<i8"), ("x", "<i8"), ("value", "<i8")])


def write_coo_binary(coo: DataFrame, out_dir: str) -> int:
    """Write (y, x, value) rows as one reference-format binary file per
    partition (Arrow-batched — no per-row Python, no RDD).  Returns the
    number of files written.  Executors write directly (no driver
    collect of data; only the written paths return) — on a cluster
    ``out_dir`` is shared storage, exactly like the reference's
    per-instance binary folders."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def _dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [p for p in batches if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks)
        rec = np.empty(len(pdf), dtype=COO_DTYPE)
        rec["y"] = pdf["y"].to_numpy(dtype=np.int64)
        rec["x"] = pdf["x"].to_numpy(dtype=np.int64)
        rec["value"] = pdf["value"].to_numpy(dtype=np.int64)
        path = os.path.join(out_dir, f"p_{uuid.uuid4().hex}.scidb")
        rec.tofile(path)
        yield pd.DataFrame({"path": [path]})

    files = (
        coo.select("y", "x", "value")
        .mapInPandas(_dump, schema="path string")
        .collect()
    )
    return len(files)


def read_coo_binary(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan + per-file structured-record decode back to COO
    rows — ``load(..., -1)`` parallel ingest of the reference's binary."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/*.scidb").select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for data in pdf["content"]:
                rec = np.frombuffer(bytes(data), dtype=COO_DTYPE)
                yield pd.DataFrame(
                    {"y": rec["y"], "x": rec["x"], "value": rec["value"]}
                )

    return files.mapInPandas(_parse, schema="y long, x long, value long")
