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


_HASH_MOD = 2147483647  # 2^31 - 1; acc * base + byte stays < 2^52 << long max

RESIZE_FACTOR = 8
RESIZE_SCHEMA = "doc_id long, n_blocks long, mean_byte_resized double, blocks_checksum long"


def resize_blob(pages: DataFrame, blob_col: str = "html", factor: int = RESIZE_FACTOR) -> DataFrame:
    """Image-resize plumbing: block-downsample the binary payload by
    ``factor`` (truncating the tail) and emit exact integer/rational
    summaries of the resized signal.  A real deployment swaps the NumPy
    block-sum for a PIL/cv2 resize; the Spark shape — Arrow-batched
    mapInPandas, one output row per input row, no shuffle, no driver
    collection — is exactly what an image downscaler uses at 100 TB.

    All outputs are oracle-exact: block sums are int64; the mean is a
    single division of two exactly-representable integers; the checksum
    is a sequential rolling hash mod 2^31-1 (bounded, no ANSI overflow).
    """
    if factor <= 0:
        raise ValueError(f"factor must be positive, got {factor}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = np.frombuffer(blob, dtype=np.uint8)
                n_blocks = b.size // factor
                sums = b[: n_blocks * factor].reshape(n_blocks, factor).sum(axis=1, dtype=np.int64)
                mean = float(int(sums.sum())) / (n_blocks * factor) if n_blocks else None
                acc = 0
                for s in sums.tolist():
                    acc = (acc * 1000003 + s) % _HASH_MOD
                rows.append((doc_id, n_blocks, mean, acc))
            yield pd.DataFrame(rows, columns=["doc_id", "n_blocks", "mean_byte_resized", "blocks_checksum"])

    return pages.select("doc_id", blob_col).mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_BYTES = 16
FRAME_STRIDE = 4
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_hash long, frame_mean double"


def frame_sample(
    pages: DataFrame,
    blob_col: str = "html",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as consecutive
    ``frame_bytes``-byte frames, keep every ``stride``-th frame, emit one
    row per sampled frame (variable fan-out per input row — the exact
    mapInPandas shape a real frame extractor has; a deployment swaps the
    byte-window hash for an ffmpeg keyframe decode).  Truncated tail
    bytes are dropped, mirroring a container whose last packet is short.

    frame_hash is a sequential base-257 rolling hash mod 2^31-1 over the
    frame's bytes; frame_mean divides an int sum by a power of two when
    frame_bytes is one — both bitwise-reproducible in ANSI SQL.
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError(f"frame_bytes/stride must be positive, got {frame_bytes}/{stride}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = np.frombuffer(blob, dtype=np.uint8)
                n_frames = b.size // frame_bytes
                for fi in range(0, n_frames, stride):
                    fr = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    acc = 0
                    for v in fr.tolist():
                        acc = (acc * 257 + v) % _HASH_MOD
                    rows.append((doc_id, fi, acc, float(int(fr.sum(dtype=np.int64))) / frame_bytes))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_hash", "frame_mean"])

    return pages.select("doc_id", blob_col).mapInPandas(_frames, schema=FRAME_SCHEMA)
