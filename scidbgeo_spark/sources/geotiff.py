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
T_STRIP_BYTES, T_PLANAR_CONFIG, T_SAMPLE_FORMAT = 279, 284, 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922

_TYPE_SIZES = {3: 2, 4: 4, 12: 8}  # SHORT, LONG, DOUBLE
_TYPE_FMT = {3: "H", 4: "I", 12: "d"}


def write_tiff(
    arr: np.ndarray,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
) -> bytes:
    """Serialize a 2-D int32 array — or a 3-D (bands, h, w) array as a
    pixel-interleaved multiband image (PlanarConfiguration=1, GDAL's
    GTiff default) — as an uncompressed striped little-endian GeoTIFF
    (one strip per row), with ModelPixelScale/ModelTiepoint geo tags —
    the layout GDAL's GTiff driver produces for CreateCopy without
    compression (SciDBGDAL.py:12-56 consumes exactly these tags;
    GDALtoSciDB_multiprocessing.py:145-148 loads such multiband files as
    3-D [band;y;x] arrays)."""
    a = np.ascontiguousarray(arr, dtype="<i4")
    if a.ndim == 2:
        bands, (h, w) = 1, a.shape
    elif a.ndim == 3:
        bands, h, w = a.shape
        # pixel-interleaved: row y = [x0:b0..bN, x1:b0..bN, ...]
        a = np.ascontiguousarray(a.transpose(1, 2, 0))
    else:
        raise ValueError(f"write_tiff expects 2-D or 3-D array, got {a.ndim}-D")
    row_bytes = w * 4 * bands

    entries = []  # (tag, type, count, values)
    entries.append((T_WIDTH, 4, 1, [w]))
    entries.append((T_HEIGHT, 4, 1, [h]))
    entries.append((T_BITS, 3, bands, [32] * bands))
    entries.append((T_COMPRESSION, 3, 1, [1]))
    entries.append((T_PHOTOMETRIC, 3, 1, [1]))
    entries.append((T_STRIP_OFFSETS, 4, h, None))  # filled below
    entries.append((T_SAMPLES_PER_PX, 3, 1, [bands]))
    entries.append((T_ROWS_PER_STRIP, 4, 1, [1]))
    entries.append((T_STRIP_BYTES, 4, h, [row_bytes] * h))
    entries.append((T_PLANAR_CONFIG, 3, 1, [1]))
    entries.append((T_SAMPLE_FORMAT, 3, bands, [2] * bands))  # signed int
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
    bands = tags.get(T_SAMPLES_PER_PX, [1])[0]
    if bands > 1 and tags.get(T_PLANAR_CONFIG, [1])[0] != 1:
        raise ValueError("planar (band-separate) multiband TIFF not supported")
    bits = tags.get(T_BITS, [8])[0]
    fmt = tags.get(T_SAMPLE_FORMAT, [1])[0]  # 1 unsigned, 2 signed
    kind = {1: "u", 2: "i"}.get(fmt)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {fmt}")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    out = {
        "width": tags[T_WIDTH][0],
        "height": tags[T_HEIGHT][0],
        "bands": bands,
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
    """Whole-file decode (test/driver-side helper): (h, w) for a
    single-band file, (bands, h, w) for pixel-interleaved multiband."""
    h = parse_tiff(data)
    rows = []
    for off, nbytes in zip(h["strip_offsets"], h["strip_byte_counts"]):
        rows.append(np.frombuffer(data, dtype=h["dtype"], count=nbytes // h["dtype"].itemsize, offset=off))
    flat = np.concatenate(rows)
    if h["bands"] == 1:
        return flat.reshape(h["height"], h["width"])
    return flat.reshape(h["height"], h["width"], h["bands"]).transpose(2, 0, 1)


def _file_row_offset(path: str, pattern) -> int:
    """Starting raster row of a windowed file, derived from its name
    (the reference writes one file per read window; the window origin is
    encoded in the name, GDALtoSciDB_multiprocessing.py:300-320)."""
    m = pattern.search(path)
    if not m:
        raise ValueError(f"row_offset_pattern matched nothing in {path!r}")
    return int(m.group(1))


def _scan_files(spark: SparkSession, path: str, row_offset_pattern: str | None):
    """binaryFile scan + the multi-file policy: without an offset rule a
    glob matching several files would overlay every raster at y=0
    (duplicate cells silently corrupting downstream tiles), so fail fast;
    with a rule, each file's rows shift by its name-derived offset.  The
    guard is a file LISTING count (column-pruned, no content read)."""
    files = spark.read.format("binaryFile").load(path)
    if row_offset_pattern is None:
        if files.select("path").limit(2).count() > 1:
            raise ValueError(
                f"glob {path!r} matches multiple GeoTIFFs; pass "
                "row_offset_pattern (regex with the start-row group, e.g. "
                r"r'_y(\d+)\.tif$') so each file's window lands at its own rows"
            )
        import re

        return files.select("path", "content"), re.compile(r"$^")  # never used
    import re

    return files.select("path", "content"), re.compile(row_offset_pattern)


def _strip_batches(data: bytes, hdr: dict, batch_rows: int):
    """Yield (y_start, n_rows, flat_values) windows of <= batch_rows
    raster rows each — executor memory is bounded by the window size, not
    the file size (the mapInPandas analog of the reference's per-instance
    ReadAsArray windows)."""
    w, bands = hdr["width"], hdr["bands"]
    rps = hdr["rows_per_strip"]
    n_strips = len(hdr["strip_offsets"])
    step = max(1, batch_rows // max(1, rps))
    for s0 in range(0, n_strips, step):
        s1 = min(n_strips, s0 + step)
        chunks = [
            np.frombuffer(
                data,
                dtype=hdr["dtype"],
                count=hdr["strip_byte_counts"][s] // hdr["dtype"].itemsize,
                offset=hdr["strip_offsets"][s],
            )
            for s in range(s0, s1)
        ]
        vals = np.concatenate(chunks)
        yield s0 * rps, len(vals) // (w * bands), vals


def geotiff_coo(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    row_offset_pattern: str | None = None,
) -> DataFrame:
    """Distributed single-band GeoTIFF ingest: binaryFile scan ->
    per-strip NumPy parse -> COO rows (y, x, value).  Multi-file globs
    require ``row_offset_pattern`` (see :func:`_scan_files`)."""
    import pandas as pd

    files, pat = _scan_files(spark, path, row_offset_pattern)
    offsets = row_offset_pattern is not None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pth, data in zip(pdf["path"], pdf["content"]):
                hdr = parse_tiff(bytes(data))
                if hdr["bands"] != 1:
                    raise ValueError(
                        f"{pth}: {hdr['bands']}-band file; use geotiff_coo_3d"
                    )
                w = hdr["width"]
                y_off = _file_row_offset(pth, pat) if offsets else 0
                for y0, n_rows, vals in _strip_batches(bytes(data), hdr, batch_rows):
                    ys = np.repeat(
                        np.arange(y_off + y0, y_off + y0 + n_rows, dtype=np.int64), w
                    )
                    xs = np.tile(np.arange(w, dtype=np.int64), n_rows)
                    yield pd.DataFrame(
                        {"y": ys, "x": xs, "value": vals.astype(np.int64)}
                    )

    return files.mapInPandas(_parse, schema="y long, x long, value long")


def geotiff_coo_3d(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    row_offset_pattern: str | None = None,
) -> DataFrame:
    """Distributed MULTIBAND GeoTIFF ingest (pixel-interleaved striped,
    SamplesPerPixel > 1): binaryFile scan -> per-strip parse -> 3-D COO
    rows (band, y, x, value) — the reference's [band;y;x] array load
    (GDALtoSciDB_multiprocessing.py:145-148) feeding pack_tiles_3d."""
    import pandas as pd

    files, pat = _scan_files(spark, path, row_offset_pattern)
    offsets = row_offset_pattern is not None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pth, data in zip(pdf["path"], pdf["content"]):
                hdr = parse_tiff(bytes(data))
                w, bands = hdr["width"], hdr["bands"]
                y_off = _file_row_offset(pth, pat) if offsets else 0
                for y0, n_rows, vals in _strip_batches(bytes(data), hdr, batch_rows):
                    # interleaved order is (y, x, band) fastest-last
                    ys = np.repeat(
                        np.arange(y_off + y0, y_off + y0 + n_rows, dtype=np.int64),
                        w * bands,
                    )
                    xs = np.tile(
                        np.repeat(np.arange(w, dtype=np.int64), bands), n_rows
                    )
                    bs = np.tile(np.arange(bands, dtype=np.int64), n_rows * w)
                    yield pd.DataFrame(
                        {"band": bs, "y": ys, "x": xs, "value": vals.astype(np.int64)}
                    )

    return files.mapInPandas(_parse, schema="band long, y long, x long, value long")
