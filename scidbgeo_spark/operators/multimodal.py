"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns.  The Spark-side plumbing
(schema, batching, UDF signatures) is real and tested; the actual media
decode is STUBBED (no image/audio libs in this container) behind
``decode_stub`` — a deterministic fake feature extractor with the same
batch shape a real decoder would have.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this environment


def media_metadata(pages: DataFrame, blob_col: str = "html") -> DataFrame:
    """Typed metadata of an opaque binary column — JVM-side only:
    byte length + magic prefix (the format-sniffing shape)."""
    return pages.select(
        "doc_id",
        F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col(blob_col), 1, 4))).alias("magic_hex"),
    )


def decode_stub(blob: np.ndarray) -> dict[str, float]:
    """Deterministic fake 'decode': byte-level statistics standing in for
    image feature extraction.  A real deployment replaces this body with
    PIL/libav calls; the Spark plumbing around it is unchanged."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real media decoding not wired in this container")
    b = np.frombuffer(blob, dtype=np.uint8)
    return {
        "mean_byte": float(b.mean()) if b.size else 0.0,
        "max_byte": float(b.max()) if b.size else 0.0,
        "n_bytes": float(b.size),
    }


FEATURE_SCHEMA = "doc_id long, mean_byte double, max_byte double, n_bytes double"


def extract_media_features(pages: DataFrame, blob_col: str = "html") -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches
    of (id, blob) in, feature rows out — the exact shape a real
    image/audio featurizer uses (batched, partition-streaming, no
    driver-side collection)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(b) for b in pdf[blob_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return pages.select("doc_id", blob_col).mapInPandas(_features, schema=FEATURE_SCHEMA)
