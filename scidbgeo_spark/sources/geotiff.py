"""Minimal real-GeoTIFF ingest: pure NumPy, no GDAL.

The reference ingests rasters by windowed ``band.ReadAsArray`` over a
GDAL dataset, one window per SciDB instance
(GDALtoSciDB_multiprocessing.py:89-120, 300-320; SciDBParallel.py:125-160).
This container has no GDAL, so the engine ships its own reader for the
uncompressed/striped little- or big-endian single-band case — enough to
make ingest END-TO-END real (bytes on disk -> COO -> pack_tiles), with
the same windowed semantics: each strip is a read window.

Scale shape: files arrive through Spark's ``binaryFile`` source (one
row per file, processed inside ``mapInPandas`` — partition-streaming,
no driver I/O).  At 100 TB a production deployment swaps the whole-file
read for strip-range requests in a custom DataSource; the parse and the
downstream pipeline are unchanged.

A tiny writer (:func:`write_tiff`) generates real TIFF bytes for tests
and for the ingest-roundtrip query — also NumPy-only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# TIFF tags
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES_PER_PX, T_ROWS_PER_STRIP = 273, 277, 278
T_STRIP_BYTES, T_SAMPLE_FORMAT = 279, 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922

_TYPE_SIZES = {3: 2, 4: 4, 12: 8}  # SHORT, LONG, DOUBLE
_TYPE_FMT = {3: "H", 4: "I", 12: "d"}


def write_tiff(
    arr: np.ndarray,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
) -> bytes:
    """Serialize a 2-D int32 array as an uncompressed striped
    little-endian GeoTIFF (one strip per row), with
    ModelPixelScale/ModelTiepoint geo tags — the layout GDAL's GTiff
    driver produces for CreateCopy without compression
    (SciDBGDAL.py:12-56 consumes exactly these tags)."""
    a = np.ascontiguousarray(arr, dtype="<i4")
    h, w = a.shape
    row_bytes = w * 4

    entries = []  # (tag, type, count, values)
    entries.append((T_WIDTH, 4, 1, [w]))
    entries.append((T_HEIGHT, 4, 1, [h]))
    entries.append((T_BITS, 3, 1, [32]))
    entries.append((T_COMPRESSION, 3, 1, [1]))
    entries.append((T_PHOTOMETRIC, 3, 1, [1]))
    entries.append((T_STRIP_OFFSETS, 4, h, None))  # filled below
    entries.append((T_SAMPLES_PER_PX, 3, 1, [1]))
    entries.append((T_ROWS_PER_STRIP, 4, 1, [1]))
    entries.append((T_STRIP_BYTES, 4, h, [row_bytes] * h))
    entries.append((T_SAMPLE_FORMAT, 3, 1, [2]))  # signed int
    entries.append(
        (T_MODEL_PIXEL_SCALE, 12, 3, [pixel_size[0], pixel_size[1], 0.0])
    )
    entries.append(
        (T_MODEL_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0])
    )

    ifd_offset = 8
    ifd_size = 2 + len(entries) * 12 + 4
    ext_offset = ifd_offset + ifd_size  # external value arrays start here

    # first pass: compute where pixel data lands, so strip offsets (which
    # may be inline when h == 1) are known before serializing anything
    total_ext = sum(
        _TYPE_SIZES[typ] * count
        for _tag, typ, count, _v in entries
        if _TYPE_SIZES[typ] * count > 4
    )
    data_off = ext_offset + total_ext
    strip_offsets = [data_off + i * row_bytes for i in range(h)]
    entries = [
        (tag, typ, count, strip_offsets if tag == T_STRIP_OFFSETS else values)
        for tag, typ, count, values in entries
    ]

    ext = bytearray()
    ext_offsets: dict[int, int] = {}
    for tag, typ, count, values in entries:
        size = _TYPE_SIZES[typ] * count
        if size > 4:
            ext_offsets[tag] = ext_offset + len(ext)
            ext += struct.pack("<" + _TYPE_FMT[typ] * count, *values)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, values in entries:
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            raw = struct.pack("<" + _TYPE_FMT[typ] * count, *values)
            raw += b"\x00" * (4 - len(raw))
            out += struct.pack("<HHI", tag, typ, count) + raw
        else:
            out += struct.pack("<HHII", tag, typ, count, ext_offsets[tag])
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    out += a.tobytes()
    return bytes(out)


def parse_tiff(data: bytes) -> dict:
    """Parse the first IFD of a TIFF byte string into
    {width, height, dtype, strip_offsets, strip_byte_counts,
    rows_per_strip, origin, pixel_size}.  Supports uncompressed striped
    single-band II/MM files — the reference's ingest case."""
    bo = {b"II": "<", b"MM": ">"}.get(data[:2])
    if bo is None or struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF file")
    (ifd,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd : ifd + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        off = ifd + 2 + i * 12
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        tags[tag] = list(struct.unpack(bo + _TYPE_FMT[typ] * count, raw))

    if tags.get(T_COMPRESSION, [1])[0] != 1:
        raise ValueError("compressed TIFF not supported by the NumPy reader")
    bits = tags.get(T_BITS, [8])[0]
    fmt = tags.get(T_SAMPLE_FORMAT, [1])[0]  # 1 unsigned, 2 signed
    kind = {1: "u", 2: "i"}.get(fmt)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {fmt}")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    out = {
        "width": tags[T_WIDTH][0],
        "height": tags[T_HEIGHT][0],
        "dtype": dtype,
        "strip_offsets": tags[T_STRIP_OFFSETS],
        "strip_byte_counts": tags[T_STRIP_BYTES],
        "rows_per_strip": tags.get(T_ROWS_PER_STRIP, [tags[T_HEIGHT][0]])[0],
    }
    if T_MODEL_TIEPOINT in tags and T_MODEL_PIXEL_SCALE in tags:
        tp, ps = tags[T_MODEL_TIEPOINT], tags[T_MODEL_PIXEL_SCALE]
        out["origin"] = (tp[3], tp[4])
        out["pixel_size"] = (ps[0], ps[1])
    return out


def tiff_to_array(data: bytes) -> np.ndarray:
    """Whole-file decode (test/driver-side helper)."""
    h = parse_tiff(data)
    rows = []
    for off, nbytes in zip(h["strip_offsets"], h["strip_byte_counts"]):
        rows.append(np.frombuffer(data, dtype=h["dtype"], count=nbytes // h["dtype"].itemsize, offset=off))
    return np.concatenate(rows).reshape(h["height"], h["width"])


def geotiff_coo(spark: SparkSession, path: str, batch_rows: int = 256) -> DataFrame:
    """Distributed GeoTIFF ingest: binaryFile scan -> per-strip NumPy
    parse -> COO rows (y, x, value).  Each output batch covers at most
    ``batch_rows`` raster rows, so executor memory is bounded by the
    window size, not the file size — the mapInPandas analog of the
    reference's per-instance ReadAsArray windows
    (GDALtoSciDB_multiprocessing.py:300-320)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for data in pdf["content"]:
                hdr = parse_tiff(bytes(data))
                w = hdr["width"]
                rps = hdr["rows_per_strip"]
                n_strips = len(hdr["strip_offsets"])
                for s0 in range(0, n_strips, max(1, batch_rows // max(1, rps))):
                    s1 = min(n_strips, s0 + max(1, batch_rows // max(1, rps)))
                    chunks = []
                    for s in range(s0, s1):
                        off = hdr["strip_offsets"][s]
                        nb = hdr["strip_byte_counts"][s]
                        chunks.append(
                            np.frombuffer(
                                data,
                                dtype=hdr["dtype"],
                                count=nb // hdr["dtype"].itemsize,
                                offset=off,
                            )
                        )
                    vals = np.concatenate(chunks)
                    y_start = s0 * rps
                    n_rows = len(vals) // w
                    ys = np.repeat(np.arange(y_start, y_start + n_rows, dtype=np.int64), w)
                    xs = np.tile(np.arange(w, dtype=np.int64), n_rows)
                    yield pd.DataFrame(
                        {"y": ys, "x": xs, "value": vals.astype(np.int64)}
                    )

    return files.mapInPandas(_parse, schema="y long, x long, value long")
