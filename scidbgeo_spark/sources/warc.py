"""WARC (ISO 28500 / Common Crawl) source.

The reference ingests rasters via GDAL (SciDBGDAL.py delegates format
parsing); the webtext-side equivalent input is the WARC web-archive
format, parsed here directly from its public spec: records start with a
``WARC/1.0\\r\\n`` version line, carry ``Name: value`` headers up to a
blank line, then exactly ``Content-Length`` payload bytes and a
``\\r\\n\\r\\n`` trailer.  Common Crawl ships each record as its own
gzip member, all members concatenated into one ``.warc.gz`` — both the
plain and the member-gzip layout are supported.

Execution shape: ``binaryFile`` scan -> per-file parse in a vectorized
``mapInPandas`` (one Python pass per WARC file, Arrow-batched out).
Files are the parallelism unit, the natural fit for Common Crawl's
~1 GB segment files (a 100 TB crawl is ~100k files — far more splits
than executors).  A mid-file split (.shx-style range reads, see
sources/shapefile.py:194) is possible for plain WARC by scanning to
the next version line, but member-gzip files do not support byte-range
entry; crawls solve this with many files, and so does this reader.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION = b"WARC/1.0\r\n"

WARC_SCHEMA = "path string, url string, warc_date string, payload binary"


def write_warc(path: str, records: list[tuple[str, str, bytes]], gzip_members: bool = False) -> None:
    """Write (url, warc_date, payload) records as one WARC file —
    driver-side fixture/export writer (small files; the scan side is
    the distributed path).  ``gzip_members`` emits the Common-Crawl
    layout: each record its own gzip member, concatenated."""
    out = bytearray()
    for url, date, payload in records:
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("ascii")
        rec = head + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out += rec
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_warc_bytes(data: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, payload) from WARC bytes (plain or
    concatenated gzip members — sniffed from the magic)."""
    if data[:2] == b"\x1f\x8b":
        chunks = []
        while data:
            do = zlib.decompressobj(32 + zlib.MAX_WBITS)
            chunks.append(do.decompress(data))
            data = do.unused_data
        data = b"".join(chunks)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_VERSION, pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            raise ValueError("WARC record with unterminated header block")
        headers: dict[str, str] = {}
        for line in data[start + len(_VERSION): hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length header")
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = data[body_start: body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield (
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            payload,
        )
        pos = body_start + length


def warc_scan(spark: SparkSession, glob: str) -> DataFrame:
    """Distributed WARC scan: (path, url, warc_date, payload) — one
    parse pass per file inside mapInPandas (Arrow-batched out, no
    driver involvement)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(glob).select("path", "content")

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for url, date, payload in parse_warc_bytes(bytes(content)):
                    rows.append((path, url, date, payload))
            yield pd.DataFrame(
                rows, columns=["path", "url", "warc_date", "payload"]
            )

    return files.mapInPandas(_parse, WARC_SCHEMA)
