"""ESRI shapefile (.shp + .dbf) polygon reader — pure NumPy/struct, no
OGR/GDAL — plus a byte-twin fixture writer.

The reference loads its zone layer with OGR on the driver
(SciDB_ZonalStats_CL.py:443-445 ``driver.Open(shapePath, 0)``); here the
binary records parse EXECUTOR-side over ``binaryFile`` rows (the same
pattern as the GeoTIFF reader): each .shp file and its sibling .dbf ride
one task, so a layer sharded into many shapefiles parses in parallel and
no file body ever visits the driver.  Within one file the record stream
is sequential — shapefiles are not splittable without the .shx index,
and vector layers are the engine's small dimension by design
(pip.pip_join_df handles the join-side scale).

Output layer shape is ``(zone_id, ring_no, xs, ys)``: one row per RING,
multi-part polygons (holes, multipolygon parts) become consecutive
``ring_no`` rows and recombine under even-odd semantics in
``pip.pip_join_df``'s refinement.  Formats follow the public ESRI
shapefile whitepaper and dBASE III layouts.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHAPE_POLYGON = 5

LAYER_SCHEMA = "zone_id int, ring_no int, xs array<double>, ys array<double>"


# ---------------------------------------------------------------------------
# parsing (runs executor-side on whole-file byte strings)
# ---------------------------------------------------------------------------


def parse_shp(data: bytes) -> list[list[np.ndarray]]:
    """Polygon records of a .shp byte string -> list (per record) of
    (k, 2) float64 OPEN rings (the spec stores rings closed; the closing
    vertex is dropped to match the engine's ring convention)."""
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError("not a shapefile (.shp magic 9994 missing)")
    (version, shape_type) = struct.unpack("<ii", data[28:36])
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    if shape_type not in (0, SHAPE_POLYGON):
        raise ValueError(f"unsupported shape type {shape_type} (Polygon only)")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    out: list[list[np.ndarray]] = []
    pos = 100
    while pos + 8 <= min(file_len, len(data)):
        _recno, content_words = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        end = pos + content_words * 2
        out.append(parse_polygon_content(data, pos))
        pos = end
    return out


def parse_polygon_content(data: bytes, pos: int = 0) -> list[np.ndarray]:
    """One polygon record's CONTENT (shape type onward, at ``pos``) ->
    list of open rings.  Shared by the whole-file parser and the
    .shx-indexed windowed scan."""
    (rec_type,) = struct.unpack("<i", data[pos : pos + 4])
    if rec_type == 0:  # null shape: keeps record numbering aligned
        return []
    if rec_type != SHAPE_POLYGON:
        raise ValueError(f"record shape type {rec_type} != Polygon")
    n_parts, n_points = struct.unpack("<ii", data[pos + 36 : pos + 44])
    parts = np.frombuffer(data, dtype="<i4", count=n_parts, offset=pos + 44)
    pts = np.frombuffer(
        data, dtype="<f8", count=n_points * 2, offset=pos + 44 + 4 * n_parts
    ).reshape(n_points, 2)
    bounds = np.append(parts, n_points)
    rings = []
    for i in range(n_parts):
        ring = pts[bounds[i] : bounds[i + 1]]
        # spec stores rings closed; engine rings are open
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        rings.append(np.array(ring, dtype=np.float64))
    return rings


def parse_dbf(data: bytes, field: str) -> list[int | None]:
    """Integer values of ``field``, one slot per .dbf record in file
    order; deleted records (flag ``*``) hold ``None`` so the list stays
    index-aligned with the .shp record stream (both scan paths skip the
    Nones, so a file with deleted rows reads identically whole-file and
    .shx-indexed)."""
    if not data or data[0] not in (0x03, 0x83):
        raise ValueError("not a dBASE III .dbf")
    n_records = struct.unpack("<I", data[4:8])[0]
    header_size, record_size = struct.unpack("<HH", data[8:12])
    fields = []  # (name, type, length)
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        length = data[pos + 16]
        fields.append((name, ftype, length))
        pos += 32
    offsets = {}
    off = 1  # skip the deletion flag
    for name, ftype, length in fields:
        offsets[name] = (off, ftype, length)
        off += length
    if field not in offsets:
        raise KeyError(f"dbf field {field!r} not in {[f for f, _, _ in fields]}")
    f_off, f_type, f_len = offsets[field]
    if f_type not in ("N", "F"):
        raise ValueError(
            f"dbf zone field {field!r} has type {f_type!r}; zone ids must "
            "be numeric (N/F) — map string zone names to integer ids "
            "before export, or point zone_field at a numeric column"
        )
    vals: list[int | None] = []
    for r in range(n_records):
        rec = data[header_size + r * record_size :][:record_size]
        if rec[:1] == b"*":  # deleted: placeholder keeps alignment
            vals.append(None)
            continue
        vals.append(int(rec[f_off : f_off + f_len].decode("ascii").strip() or "0"))
    return vals


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------


def polygons_from_shp(
    spark: SparkSession, path: str, zone_field: str = "zone_id"
) -> DataFrame:
    """Shapefile layer -> ``(zone_id, ring_no, xs, ys)`` DataFrame.

    ``path`` points at the .shp file(s) (glob ok); each sibling .dbf is
    located by swapping the extension.  Both files load via binaryFile
    and pair on their stem, then records parse inside mapInPandas —
    per-FILE parallel, driver never touches bytes.  ``ring_no`` numbers a
    polygon's parts in record order; zone ids come from the .dbf
    ``zone_field`` column, aligned by record index per the spec."""
    # extension filters matter for directory paths: binaryFile on a dir
    # loads EVERY sibling (.dbf/.shx/.prj included) and those bytes must
    # not reach the wrong parser
    shp = (
        spark.read.format("binaryFile")
        .load(path)
        .where(F.col("path").endswith(".shp"))
        .select(
            F.regexp_replace(F.col("path"), r"\.shp$", "").alias("stem"),
            F.col("content").alias("shp_bytes"),
        )
    )
    dbf = (
        spark.read.format("binaryFile")
        .load(_dbf_glob(path))
        .where(F.col("path").endswith(".dbf"))
        .select(
            F.regexp_replace(F.col("path"), r"\.dbf$", "").alias("stem"),
            F.col("content").alias("dbf_bytes"),
        )
    )
    paired = shp.join(dbf, "stem", "left")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"zone_id": [], "ring_no": [], "xs": [], "ys": []}
            for _, row in pdf.iterrows():
                recs = parse_shp(bytes(row["shp_bytes"]))
                if row["dbf_bytes"] is None:
                    raise ValueError(f"missing .dbf next to {row['stem']}.shp")
                zids = parse_dbf(bytes(row["dbf_bytes"]), zone_field)
                if len(zids) != len(recs):
                    raise ValueError(
                        f".dbf has {len(zids)} records, .shp has {len(recs)}"
                    )
                for zid, rings in zip(zids, recs):
                    if zid is None:  # deleted .dbf record
                        continue
                    for rno, ring in enumerate(rings):
                        rows["zone_id"].append(zid)
                        rows["ring_no"].append(rno)
                        rows["xs"].append(ring[:, 0].tolist())
                        rows["ys"].append(ring[:, 1].tolist())
            yield pd.DataFrame(rows)

    return paired.mapInPandas(_parse, LAYER_SCHEMA)


def _dbf_glob(path: str) -> str:
    if path.endswith(".shp"):
        return path[:-4] + ".dbf"
    return path  # directory / glob without extension: caller's layout


def polygons_from_shp_indexed(
    spark: SparkSession,
    shp_path: str,
    zone_field: str = "zone_id",
    records_per_task: int = 4096,
) -> DataFrame:
    """Splittable scan of ONE large shapefile via its .shx index — the
    vector analog of the GeoTIFF windowed ingest: record parsing
    parallelizes WITHIN a file, so a multi-GB national parcel layer
    reads at cluster width instead of one task.

    The .shx (8 bytes/record) loads via binaryFile and explodes into
    record-range batches; each task range-reads its .shp byte window
    and its fixed-stride .dbf slice (dBASE records are fixed-size, so
    record i sits at header + i*record_size — a seek, not a scan).
    Executor-side reads use POSIX ``open`` — local/NFS paths in this
    environment; a cluster deployment swaps in the Hadoop/fsspec
    range-read with the same (offset, length) arithmetic."""
    if not shp_path.endswith(".shp"):
        raise ValueError("polygons_from_shp_indexed takes a single .shp path")
    stem = shp_path[:-4]
    shx = (
        spark.read.format("binaryFile")
        .load(stem + ".shx")
        .select(F.col("content").alias("shx_bytes"))
    )
    npt = records_per_task

    def _ranges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                idx = np.frombuffer(bytes(row["shx_bytes"]), dtype=">i4", offset=100)
                idx = idx.reshape(-1, 2)  # (offset_words, content_words)
                for start in range(0, len(idx), npt):
                    part = idx[start : start + npt]
                    yield pd.DataFrame(
                        {
                            "rec_start": [start],
                            "offsets": [(part[:, 0] * 2).tolist()],
                            "lengths": [(part[:, 1] * 2).tolist()],
                        }
                    )

    ranges = shx.mapInPandas(
        _ranges, "rec_start long, offsets array<long>, lengths array<long>"
    ).repartition("rec_start")

    def _read_ranges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(stem + ".dbf", "rb") as f:
            dbf_head = f.read(32)
            header_size, record_size = struct.unpack("<HH", dbf_head[8:12])
            f.seek(0)
            dbf_prefix = f.read(header_size)
        # field layout from the descriptor block (no record bytes read)
        fields, pos = [], 32
        while pos < header_size - 1 and dbf_prefix[pos] != 0x0D:
            fname = dbf_prefix[pos : pos + 11].split(b"\x00")[0].decode("ascii")
            fields.append((fname, chr(dbf_prefix[pos + 11]), dbf_prefix[pos + 16]))
            pos += 32
        off = 1
        f_off = f_len = None
        for fname, ftype, flen in fields:
            if fname == zone_field:
                if ftype not in ("N", "F"):
                    raise ValueError(
                        f"dbf zone field {zone_field!r} has type {ftype!r}; "
                        "zone ids must be numeric (N/F)"
                    )
                f_off, f_len = off, flen
            off += flen
        if f_off is None:
            raise KeyError(
                f"dbf field {zone_field!r} not in {[f for f, _, _ in fields]}"
            )
        for pdf in batches:
            rows = {"zone_id": [], "ring_no": [], "xs": [], "ys": []}
            with open(stem + ".shp", "rb") as shp_f, open(stem + ".dbf", "rb") as dbf_f:
                for _, row in pdf.iterrows():
                    offs, lens = row["offsets"], row["lengths"]
                    rec_no = int(row["rec_start"])
                    for o, ln in zip(offs, lens):
                        # deletion flag first: a deleted record (flag
                        # '*') is skipped BEFORE the .shp bytes are even
                        # read, keeping rec_no aligned — matches the
                        # whole-file reader's skip semantics
                        dbf_f.seek(header_size + rec_no * record_size)
                        if dbf_f.read(1) == b"*":
                            rec_no += 1
                            continue
                        dbf_f.seek(header_size + rec_no * record_size + f_off)
                        zid = int(dbf_f.read(f_len).decode("ascii").strip() or "0")
                        shp_f.seek(int(o) + 8)  # skip the record header
                        content = shp_f.read(int(ln))
                        rings = parse_polygon_content(content)
                        for rno, ring in enumerate(rings):
                            rows["zone_id"].append(zid)
                            rows["ring_no"].append(rno)
                            rows["xs"].append(ring[:, 0].tolist())
                            rows["ys"].append(ring[:, 1].tolist())
                        rec_no += 1
            yield pd.DataFrame(rows)

    return ranges.mapInPandas(_read_ranges, LAYER_SCHEMA)


# ---------------------------------------------------------------------------
# fixture writer (driver-side; fixture layers are tiny)
# ---------------------------------------------------------------------------


def write_shp_fixture(
    path: str, polygons: list[tuple[int, list[np.ndarray]]], zone_field: str = "zone_id"
) -> str:
    """Write ``polygons`` — (zone_id, [rings...]) with OPEN rings — as
    ``path``.shp + .dbf.  A NumPy twin of the reader: closed rings,
    big-endian record headers, dBASE III numeric zone column."""
    if path.endswith(".shp"):
        path = path[:-4]
    records = []
    all_pts = []
    for _zid, rings in polygons:
        closed = [np.vstack([r, r[:1]]) for r in rings]
        n_points = sum(len(r) for r in closed)
        parts, acc = [], 0
        for r in closed:
            parts.append(acc)
            acc += len(r)
        pts = np.vstack(closed) if closed else np.zeros((0, 2))
        all_pts.append(pts)
        content = struct.pack("<i", SHAPE_POLYGON)
        content += struct.pack(
            "<4d", pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
        )
        content += struct.pack("<ii", len(parts), n_points)
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        records.append(content)

    body = b""
    index = b""
    for i, content in enumerate(records):
        index += struct.pack(">ii", (100 + len(body)) // 2, len(content) // 2)
        body += struct.pack(">ii", i + 1, len(content) // 2) + content
    allp = np.vstack(all_pts)

    def _header(body_len: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\x00" * 20
        h += struct.pack(">i", (100 + body_len) // 2)
        h += struct.pack("<ii", 1000, SHAPE_POLYGON)
        h += struct.pack(
            "<4d",
            allp[:, 0].min(),
            allp[:, 1].min(),
            allp[:, 0].max(),
            allp[:, 1].max(),
        )
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        return h

    with open(path + ".shp", "wb") as f:
        f.write(_header(len(body)) + body)
    # .shx index: same header layout, then (offset, length) words/record
    with open(path + ".shx", "wb") as f:
        f.write(_header(len(index)) + index)

    # dBASE III: one numeric column holding the zone id
    f_len = 10
    n = len(polygons)
    dbf_header = struct.pack(
        "<B3BIHH", 0x03, 26, 8, 17, n, 32 + 32 + 1, 1 + f_len
    ) + b"\x00" * 20
    fld = zone_field.encode("ascii")[:11].ljust(11, b"\x00")
    fld += b"N" + b"\x00" * 4 + bytes([f_len, 0]) + b"\x00" * 14
    recs = b"".join(
        b" " + str(int(zid)).rjust(f_len).encode("ascii") for zid, _ in polygons
    )
    with open(path + ".dbf", "wb") as f:
        f.write(dbf_header + fld + b"\x0d" + recs + b"\x1a")
    return path + ".shp"
