"""Minimal real-GeoTIFF ingest: pure NumPy, no GDAL.

The reference ingests rasters by windowed ``band.ReadAsArray`` over a
GDAL dataset, one window per SciDB instance
(GDALtoSciDB_multiprocessing.py:89-120, 300-320; SciDBParallel.py:125-160).
This container has no GDAL, so the engine ships its own reader covering
the layouts GDAL's GTiff driver actually produces:

- striped or tiled (TileWidth/TileLength/TileOffsets) organisation,
- uncompressed or Deflate (COMPRESS=DEFLATE, tag 8 / legacy 32946),
- horizontal-differencing predictor (PREDICTOR=2),
- little- or big-endian, single-band or pixel-interleaved multiband.

Each strip group / tile is a read window — the same windowed semantics
as the reference's per-instance ReadAsArray.

Scale shape: files arrive through Spark's ``binaryFile`` source (one
row per file, processed inside ``mapInPandas`` — partition-streaming,
no driver I/O).  At 100 TB a production deployment swaps the whole-file
read for strip/tile-range requests in a custom DataSource; the parse and
the downstream pipeline are unchanged.

A writer (:func:`write_tiff`) generates real TIFF bytes for tests and
for the ingest-roundtrip query — also NumPy-only.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# TIFF tags
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES_PER_PX, T_ROWS_PER_STRIP = 273, 277, 278
T_STRIP_BYTES, T_PLANAR_CONFIG, T_PREDICTOR = 279, 284, 317
T_TILE_WIDTH, T_TILE_LENGTH, T_TILE_OFFSETS, T_TILE_BYTES = 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922

_TYPE_SIZES = {3: 2, 4: 4, 12: 8, 16: 8, 17: 8, 18: 8}  # + BigTIFF LONG8/SLONG8/IFD8
_TYPE_FMT = {3: "H", 4: "I", 12: "d", 16: "Q", 17: "q", 18: "Q"}

# Compression tag values this reader handles
C_NONE, C_LZW, C_DEFLATE, C_DEFLATE_OLD = 1, 5, 8, 32946
C_PACKBITS = 32773


def _tiff_header(head: bytes) -> tuple[str, bool, int]:
    """(byte_order, is_bigtiff, first_ifd_offset) from the first 16
    bytes.  Classic TIFF (magic 42, 32-bit offsets) caps files at 4 GB
    — a single production raster blows past that, so the BigTIFF
    variant (magic 43, 64-bit offsets, 20-byte IFD entries) is the
    100 TB-relevant format; both parse here."""
    bo = {b"II": "<", b"MM": ">"}.get(head[:2])
    if bo is None:
        raise ValueError("not a TIFF file")
    ver = struct.unpack(bo + "H", head[2:4])[0]
    if ver == 42:
        (ifd,) = struct.unpack(bo + "I", head[4:8])
        return bo, False, ifd
    if ver == 43:
        osz, zero = struct.unpack(bo + "HH", head[4:8])
        if osz != 8 or zero != 0:
            raise ValueError(f"malformed BigTIFF header (offsetsize={osz})")
        (ifd,) = struct.unpack(bo + "Q", head[8:16])
        return bo, True, ifd
    raise ValueError("not a TIFF file")


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (Apple RLE, TIFF compression 32773): control byte n in
    [0,127] copies n+1 literal bytes, n in [-127,-1] (two's complement)
    repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # replicate next byte 257-c times
            out += data[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy spec encoder: replicate runs >= 3 bytes (or >= 2 when not
    breaking a literal run), literals up to 128 bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting here
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i = j
            continue
        # literal stretch: until a run of >= 3 starts (2-runs inside a
        # literal cost the same either way; 3-runs always win), capped
        # at 128 bytes per control byte
        lit = i
        while i < n and i - lit < 128:
            j = i + 1
            while j < n and j - i < 3 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = min(j, lit + 128)
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first bit packing, 9->12-bit
    codes with the spec's EARLY code-width change (width bumps when the
    table reaches 2^width - 1 entries, one entry before a power of two)."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos, width = 0, 9
    table: list[bytes] = []
    prev = b""

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return _LZW_EOI
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0 : b0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return code

    base = [bytes([i]) for i in range(256)] + [b"", b""]
    while True:
        code = read_code()
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            table = []
            width = 9
            prev = b""
            continue
        if code < 258:
            entry = base[code]
        elif code - 258 < len(table):
            entry = table[code - 258]
        elif code - 258 == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        if prev:
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # EARLY change, one entry before the encoder's own threshold:
        # the decoder's table lags the encoder's by exactly one entry
        # (the encoder adds at emit k, the decoder at read k+1), so it
        # must widen one entry sooner to read the next code correctly
        if 258 + len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (writer/tests counterpart of
    :func:`_lzw_decode`; same early-change width schedule)."""
    out = bytearray()
    acc = acc_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8

    table: dict[bytes, int] = {}
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if len(wc) == 1 or wc in table:
            w = wc
            continue
        emit(table[w] if len(w) > 1 else w[0], width)
        table[wc] = 258 + len(table)
        if 258 + len(table) == (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                emit(_LZW_CLEAR, width)
                table = {}
                width = 9
        w = c
    if w:
        emit(table[w] if len(w) > 1 else w[0], width)
    emit(_LZW_EOI, width)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _predict2(block: np.ndarray) -> np.ndarray:
    """Apply horizontal differencing (TIFF Predictor=2) to a
    (rows, cols, bands) block — each sample stores its delta from the
    previous sample of the same band in the row, with wraparound."""
    u = block.astype("<u4", copy=True)
    u[:, 1:, :] -= u[:, :-1, :].copy()
    return u


def _unpredict2(block: np.ndarray) -> np.ndarray:
    """Undo Predictor=2 on a (rows, cols, bands) block: cumulative sum
    along the row axis with 32-bit wraparound."""
    acc = np.cumsum(block.astype(np.uint64), axis=1, dtype=np.uint64)
    return (acc & 0xFFFFFFFF).astype(np.uint32)


def write_tiff(
    arr: np.ndarray,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
    compression: str = "none",
    tile: tuple[int, int] | None = None,
    predictor: int = 1,
    bigtiff: bool = False,
) -> bytes:
    """Serialize a 2-D int32 array — or a 3-D (bands, h, w) array as a
    pixel-interleaved multiband image (PlanarConfiguration=1, GDAL's
    GTiff default) — as a little-endian GeoTIFF with
    ModelPixelScale/ModelTiepoint geo tags (SciDBGDAL.py:12-56 consumes
    exactly these tags; GDALtoSciDB_multiprocessing.py:145-148 loads such
    multiband files as 3-D [band;y;x] arrays).

    ``compression``: "none" or "deflate" (GDAL COMPRESS=DEFLATE, tag 8).
    ``tile``: None for one-strip-per-row, or (tile_width, tile_length)
    (multiples of 16, per the TIFF spec) for a tiled layout — GDAL's
    TILED=YES.  ``predictor``: 1 (none) or 2 (horizontal differencing,
    GDAL PREDICTOR=2).  ``bigtiff``: magic-43 64-bit-offset layout
    (GDAL BIGTIFF=YES — the only format for >4 GB rasters; same tags,
    20-byte IFD entries)."""
    a = np.ascontiguousarray(arr, dtype="<i4")
    if a.ndim == 2:
        bands, (h, w) = 1, a.shape
        a = a[:, :, None]
    elif a.ndim == 3:
        bands, h, w = a.shape
        # pixel-interleaved: row y = [x0:b0..bN, x1:b0..bN, ...]
        a = np.ascontiguousarray(a.transpose(1, 2, 0))
    else:
        raise ValueError(f"write_tiff expects 2-D or 3-D array, got {a.ndim}-D")
    comp = {
        "none": C_NONE,
        "deflate": C_DEFLATE,
        "lzw": C_LZW,
        "packbits": C_PACKBITS,
    }.get(compression)
    if comp is None:
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")

    def _encode(block: np.ndarray) -> bytes:
        # block: (rows, cols, bands) contiguous window
        if predictor == 2:
            block = _predict2(block)
        raw = np.ascontiguousarray(block.astype("<u4", copy=False)).tobytes()
        if comp == C_DEFLATE:
            return zlib.compress(raw, 6)
        if comp == C_LZW:
            return _lzw_encode(raw)
        if comp == C_PACKBITS:
            return _packbits_encode(raw)
        return raw

    segments: list[bytes] = []
    entries = []  # (tag, type, count, values)
    entries.append((T_WIDTH, 4, 1, [w]))
    entries.append((T_HEIGHT, 4, 1, [h]))
    entries.append((T_BITS, 3, bands, [32] * bands))
    entries.append((T_COMPRESSION, 3, 1, [comp]))
    entries.append((T_PHOTOMETRIC, 3, 1, [1]))
    entries.append((T_SAMPLES_PER_PX, 3, 1, [bands]))
    entries.append((T_PLANAR_CONFIG, 3, 1, [1]))
    if predictor == 2:
        entries.append((T_PREDICTOR, 3, 1, [2]))
    entries.append((T_SAMPLE_FORMAT, 3, bands, [2] * bands))  # signed int

    if tile is None:
        for y in range(h):
            segments.append(_encode(a[y : y + 1]))
        entries.append((T_STRIP_OFFSETS, 4, h, None))  # filled below
        entries.append((T_ROWS_PER_STRIP, 4, 1, [1]))
        entries.append((T_STRIP_BYTES, 4, h, [len(s) for s in segments]))
        off_tag = T_STRIP_OFFSETS
    else:
        tw, tl = tile
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("tile dims must be positive multiples of 16")
        # pad to whole tiles (TIFF tiles are always full-size)
        ph, pw = -(-h // tl) * tl, -(-w // tw) * tw
        padded = np.zeros((ph, pw, bands), dtype="<i4")
        padded[:h, :w, :] = a
        for ty in range(0, ph, tl):
            for tx in range(0, pw, tw):
                segments.append(_encode(padded[ty : ty + tl, tx : tx + tw]))
        n_tiles = len(segments)
        entries.append((T_TILE_WIDTH, 4, 1, [tw]))
        entries.append((T_TILE_LENGTH, 4, 1, [tl]))
        entries.append((T_TILE_OFFSETS, 4, n_tiles, None))  # filled below
        entries.append((T_TILE_BYTES, 4, n_tiles, [len(s) for s in segments]))
        off_tag = T_TILE_OFFSETS

    entries.append(
        (T_MODEL_PIXEL_SCALE, 12, 3, [pixel_size[0], pixel_size[1], 0.0])
    )
    entries.append(
        (T_MODEL_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0])
    )
    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ordered

    if bigtiff:  # magic 43: 64-bit offsets, 20-byte entries, 8-byte inline
        ifd_offset, esz, inline, ofmt = 16, 20, 8, "Q"
        ifd_size = 8 + len(entries) * esz + 8
    else:
        ifd_offset, esz, inline, ofmt = 8, 12, 4, "I"
        ifd_size = 2 + len(entries) * esz + 4
    ext_offset = ifd_offset + ifd_size  # external value arrays start here

    # first pass: compute where pixel data lands, so segment offsets
    # (which may be inline for tiny images) are known before serializing
    total_ext = sum(
        _TYPE_SIZES[typ] * count
        for _tag, typ, count, _v in entries
        if _TYPE_SIZES[typ] * count > inline
    )
    data_off = ext_offset + total_ext
    seg_offsets, pos = [], data_off
    for s in segments:
        seg_offsets.append(pos)
        pos += len(s)
    entries = [
        (tag, typ, count, seg_offsets if tag == off_tag else values)
        for tag, typ, count, values in entries
    ]

    ext = bytearray()
    ext_offsets: dict[int, int] = {}
    for tag, typ, count, values in entries:
        size = _TYPE_SIZES[typ] * count
        if size > inline:
            ext_offsets[tag] = ext_offset + len(ext)
            ext += struct.pack("<" + _TYPE_FMT[typ] * count, *values)

    out = bytearray()
    if bigtiff:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_offset)
        out += struct.pack("<Q", len(entries))
    else:
        out += struct.pack("<2sHI", b"II", 42, ifd_offset)
        out += struct.pack("<H", len(entries))
    for tag, typ, count, values in entries:
        size = _TYPE_SIZES[typ] * count
        if size <= inline:
            raw = struct.pack("<" + _TYPE_FMT[typ] * count, *values)
            raw += b"\x00" * (inline - len(raw))
            out += struct.pack("<HH" + ofmt, tag, typ, count) + raw
        else:
            out += struct.pack(
                "<HH" + ofmt + ofmt, tag, typ, count, ext_offsets[tag]
            )
    out += struct.pack("<" + ofmt, 0)  # no next IFD
    out += ext
    for s in segments:
        out += s
    return bytes(out)


def tiff_dims(path: str) -> tuple[int, int]:
    """(height, width) from the first IFD via BOUNDED driver-side range
    reads — 8-byte header, one seek, one ~12*n-byte IFD — never the file
    body.  Fetching whole content to the driver just to read a ~1 KB
    header (binaryFile + .first()) is a driver OOM at production file
    sizes; ImageWidth/ImageLength are count-1 SHORT/LONG tags whose
    values sit INLINE in the IFD entry, so no value-area reads are
    needed.  Local/posix paths (optionally file:-prefixed); a glob must
    resolve to exactly one file, mirroring geotiff_coo's fail-fast."""
    import os as _os

    p = path[7:] if path.startswith("file://") else path
    if any(ch in p for ch in "*?["):
        import glob as _glob

        matches = sorted(_glob.glob(p))
        if len(matches) != 1:
            raise ValueError(
                f"tiff_dims needs exactly one file, glob matched {len(matches)}"
            )
        p = matches[0]
    if _os.path.isdir(p):  # binaryFile-style directory source
        entries = sorted(
            _os.path.join(p, e) for e in _os.listdir(p) if not e.startswith(".")
        )
        if len(entries) != 1:
            raise ValueError(
                f"tiff_dims needs exactly one file, directory holds {len(entries)}"
            )
        p = entries[0]
    with open(p, "rb") as f:
        bo, big, ifd = _tiff_header(f.read(16))
        f.seek(ifd)
        if big:
            (n,) = struct.unpack(bo + "Q", f.read(8))
            esz, ofmt = 20, "Q"
        else:
            (n,) = struct.unpack(bo + "H", f.read(2))
            esz, ofmt = 12, "I"
        entries = f.read(n * esz)
    dims: dict[int, int] = {}
    csz = struct.calcsize(ofmt)
    for i in range(n):
        off = i * esz
        tag, typ = struct.unpack(bo + "HH", entries[off : off + 4])
        (count,) = struct.unpack(bo + ofmt, entries[off + 4 : off + 4 + csz])
        if tag in (T_WIDTH, T_HEIGHT) and count == 1 and typ in (3, 4, 16):
            fmt = _TYPE_FMT[typ]
            size = _TYPE_SIZES[typ]
            vf = off + 4 + csz
            (val,) = struct.unpack(bo + fmt, entries[vf : vf + size])
            dims[tag] = int(val)
    if T_WIDTH not in dims or T_HEIGHT not in dims:
        raise ValueError("TIFF IFD missing ImageWidth/ImageLength")
    return dims[T_HEIGHT], dims[T_WIDTH]


def parse_tiff(data: bytes) -> dict:
    """Parse the first IFD of a TIFF byte string into a header dict:
    {width, height, bands, dtype, layout ("strips"|"tiles"), offsets,
    byte_counts, rows_per_strip | tile_width/tile_length, compression,
    predictor, origin, pixel_size}.  Supports striped and tiled
    organisation, uncompressed and Deflate, predictor 1/2, II/MM."""
    bo, big, ifd = _tiff_header(data[:16])
    if big:
        (n,) = struct.unpack(bo + "Q", data[ifd : ifd + 8])
        ebase, esz, ofmt, inline = ifd + 8, 20, "Q", 8
    else:
        (n,) = struct.unpack(bo + "H", data[ifd : ifd + 2])
        ebase, esz, ofmt, inline = ifd + 2, 12, "I", 4
    tags: dict[int, list] = {}
    for i in range(n):
        off = ebase + i * esz
        tag, typ = struct.unpack(bo + "HH", data[off : off + 4])
        (count,) = struct.unpack(
            bo + ofmt, data[off + 4 : off + 4 + struct.calcsize(ofmt)]
        )
        if typ not in _TYPE_SIZES:
            continue
        vfield = off + 4 + struct.calcsize(ofmt)
        size = _TYPE_SIZES[typ] * count
        if size <= inline:
            raw = data[vfield : vfield + size]
        else:
            (voff,) = struct.unpack(
                bo + ofmt, data[vfield : vfield + struct.calcsize(ofmt)]
            )
            raw = data[voff : voff + size]
        tags[tag] = list(struct.unpack(bo + _TYPE_FMT[typ] * count, raw))

    comp = tags.get(T_COMPRESSION, [C_NONE])[0]
    if comp not in (C_NONE, C_LZW, C_DEFLATE, C_DEFLATE_OLD, C_PACKBITS):
        raise ValueError(
            f"compressed TIFF variant {comp} not supported "
            "(only 1/none, 5/LZW, 8/32946 Deflate, 32773/PackBits)"
        )
    predictor = tags.get(T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    bands = tags.get(T_SAMPLES_PER_PX, [1])[0]
    if bands > 1 and tags.get(T_PLANAR_CONFIG, [1])[0] != 1:
        raise ValueError("planar (band-separate) multiband TIFF not supported")
    bits = tags.get(T_BITS, [8])[0]
    fmt = tags.get(T_SAMPLE_FORMAT, [1])[0]  # 1 unsigned, 2 signed
    kind = {1: "u", 2: "i"}.get(fmt)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {fmt}")
    if predictor == 2 and bits != 32:
        raise ValueError("predictor=2 supported for 32-bit samples only")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    out = {
        "width": tags[T_WIDTH][0],
        "height": tags[T_HEIGHT][0],
        "bands": bands,
        "dtype": dtype,
        "compression": comp,
        "predictor": predictor,
    }
    if T_TILE_OFFSETS in tags:
        out["layout"] = "tiles"
        out["tile_width"] = tags[T_TILE_WIDTH][0]
        out["tile_length"] = tags[T_TILE_LENGTH][0]
        out["offsets"] = tags[T_TILE_OFFSETS]
        out["byte_counts"] = tags[T_TILE_BYTES]
    else:
        out["layout"] = "strips"
        out["offsets"] = tags[T_STRIP_OFFSETS]
        out["byte_counts"] = tags[T_STRIP_BYTES]
        out["rows_per_strip"] = tags.get(T_ROWS_PER_STRIP, [tags[T_HEIGHT][0]])[0]
    # legacy aliases (strip layout) kept for external callers
    if out["layout"] == "strips":
        out["strip_offsets"] = out["offsets"]
        out["strip_byte_counts"] = out["byte_counts"]
    if T_MODEL_TIEPOINT in tags and T_MODEL_PIXEL_SCALE in tags:
        tp, ps = tags[T_MODEL_TIEPOINT], tags[T_MODEL_PIXEL_SCALE]
        out["origin"] = (tp[3], tp[4])
        out["pixel_size"] = (ps[0], ps[1])
    return out


def _decode_segment(data: bytes, hdr: dict, idx: int, rows: int, cols: int):
    """Decode segment ``idx`` (a strip or a tile) to a (rows, cols, bands)
    array in the file's sample dtype, undoing Deflate and Predictor=2."""
    off, cnt = hdr["offsets"][idx], hdr["byte_counts"][idx]
    bands = hdr["bands"]
    if hdr["compression"] in (C_DEFLATE, C_DEFLATE_OLD, C_LZW, C_PACKBITS):
        seg = data[off : off + cnt]
        if hdr["compression"] == C_LZW:
            raw = _lzw_decode(seg)
        elif hdr["compression"] == C_PACKBITS:
            raw = _packbits_decode(seg)
        else:
            raw = zlib.decompress(seg)
        vals = np.frombuffer(raw, dtype=hdr["dtype"])
    else:
        vals = np.frombuffer(
            data, dtype=hdr["dtype"], count=cnt // hdr["dtype"].itemsize, offset=off
        )
    block = vals[: rows * cols * bands].reshape(rows, cols, bands)
    if hdr["predictor"] == 2:
        u = _unpredict2(block)  # native-endian uint32, wraparound-correct
        block = u.view(np.int32) if hdr["dtype"].kind == "i" else u
    return block


def _windows(data: bytes, hdr: dict, batch_rows: int):
    """Yield ``(y0, x0, rows, cols, block)`` read windows where ``block``
    is a (rows, cols, bands) array — executor memory is bounded by the
    window size, not the file size (the mapInPandas analog of the
    reference's per-instance ReadAsArray windows).  Striped files batch
    up to ``batch_rows`` rows per window; tiled files yield one window
    per tile (already bounded by tile_length × tile_width)."""
    h, w = hdr["height"], hdr["width"]
    if hdr["layout"] == "tiles":
        tw, tl = hdr["tile_width"], hdr["tile_length"]
        tiles_across = -(-w // tw)
        for idx in range(len(hdr["offsets"])):
            ty, tx = divmod(idx, tiles_across)
            y0, x0 = ty * tl, tx * tw
            rows, cols = min(tl, h - y0), min(tw, w - x0)
            block = _decode_segment(data, hdr, idx, tl, tw)[:rows, :cols, :]
            yield y0, x0, rows, cols, block
        return
    rps = hdr["rows_per_strip"]
    n_strips = len(hdr["offsets"])
    step = max(1, batch_rows // max(1, rps))
    for s0 in range(0, n_strips, step):
        s1 = min(n_strips, s0 + step)
        chunks = [
            _decode_segment(
                data, hdr, s, min(rps, h - s * rps), w
            )
            for s in range(s0, s1)
        ]
        block = chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0)
        yield s0 * rps, 0, block.shape[0], w, block


def tiff_to_array(data: bytes) -> np.ndarray:
    """Whole-file decode (test/driver-side helper): (h, w) for a
    single-band file, (bands, h, w) for pixel-interleaved multiband."""
    h = parse_tiff(data)
    out = np.zeros((h["height"], h["width"], h["bands"]), dtype=h["dtype"].newbyteorder("="))
    for y0, x0, rows, cols, block in _windows(data, h, batch_rows=256):
        out[y0 : y0 + rows, x0 : x0 + cols, :] = block
    if h["bands"] == 1:
        return out[:, :, 0]
    return out.transpose(2, 0, 1)


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


def geotiff_coo(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    row_offset_pattern: str | None = None,
) -> DataFrame:
    """Distributed single-band GeoTIFF ingest: binaryFile scan ->
    per-window NumPy parse (strips or tiles, Deflate-aware) -> COO rows
    (y, x, value).  Multi-file globs require ``row_offset_pattern``
    (see :func:`_scan_files`)."""
    import pandas as pd

    files, pat = _scan_files(spark, path, row_offset_pattern)
    offsets = row_offset_pattern is not None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pth, data in zip(pdf["path"], pdf["content"]):
                raw = bytes(data)
                hdr = parse_tiff(raw)
                if hdr["bands"] != 1:
                    raise ValueError(
                        f"{pth}: {hdr['bands']}-band file; use geotiff_coo_3d"
                    )
                y_off = _file_row_offset(pth, pat) if offsets else 0
                for y0, x0, rows, cols, block in _windows(raw, hdr, batch_rows):
                    ys = np.repeat(
                        np.arange(y_off + y0, y_off + y0 + rows, dtype=np.int64),
                        cols,
                    )
                    xs = np.tile(np.arange(x0, x0 + cols, dtype=np.int64), rows)
                    yield pd.DataFrame(
                        {
                            "y": ys,
                            "x": xs,
                            "value": block[:, :, 0].ravel().astype(np.int64),
                        }
                    )

    return files.mapInPandas(_parse, schema="y long, x long, value long")


def geotiff_coo_3d(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    row_offset_pattern: str | None = None,
) -> DataFrame:
    """Distributed MULTIBAND GeoTIFF ingest (pixel-interleaved,
    SamplesPerPixel > 1, strips or tiles): binaryFile scan -> per-window
    parse -> 3-D COO rows (band, y, x, value) — the reference's
    [band;y;x] array load (GDALtoSciDB_multiprocessing.py:145-148)
    feeding pack_tiles_3d."""
    import pandas as pd

    files, pat = _scan_files(spark, path, row_offset_pattern)
    offsets = row_offset_pattern is not None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pth, data in zip(pdf["path"], pdf["content"]):
                raw = bytes(data)
                hdr = parse_tiff(raw)
                bands = hdr["bands"]
                y_off = _file_row_offset(pth, pat) if offsets else 0
                for y0, x0, rows, cols, block in _windows(raw, hdr, batch_rows):
                    # interleaved order is (y, x, band) fastest-last
                    ys = np.repeat(
                        np.arange(y_off + y0, y_off + y0 + rows, dtype=np.int64),
                        cols * bands,
                    )
                    xs = np.tile(
                        np.repeat(np.arange(x0, x0 + cols, dtype=np.int64), bands),
                        rows,
                    )
                    bs = np.tile(np.arange(bands, dtype=np.int64), rows * cols)
                    yield pd.DataFrame(
                        {
                            "band": bs,
                            "y": ys,
                            "x": xs,
                            "value": block.ravel().astype(np.int64),
                        }
                    )

    return files.mapInPandas(_parse, schema="band long, y long, x long, value long")
