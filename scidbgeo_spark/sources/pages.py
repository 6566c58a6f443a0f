"""Synthetic Common-Crawl-style page corpus + geotag extraction.

The engine's canonical input is a pages table ``(url, warc_ts, html,
text, lang)`` (BASELINE.json input_hint / FIXTURES.md F1).  This module

1. generates that corpus deterministically (seeded integer arithmetic,
   distributed via ``spark.range`` — no driver-side data), with exactly
   one machine-readable geotag token ``geo:<lat_milli>,<lon_milli>``
   embedded in each page's text (integer millidegrees so parse-back is
   bitwise exact), a 10% hot cell for skew, and the html wrapper whose
   extraction must be byte-identical to ``text``;
2. extracts text from html and geotags from text with JVM-side
   expressions (``regexp_extract`` + integer arithmetic — no UDF), the
   page -> point-feature step the PIP/kNN/zonal pipelines consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scidbgeo_spark.operators.text import HTML_PREFIX, HTML_SUFFIX

GEO_RE = r"geo:(-?\d+),(-?\d+)"

# corpus constants (FIXTURES.md F1 shape; arithmetic mirrors model.points)
N_SITES = 997
TS_STEP = 9973
LON_MULT = 9973
LAT_MULT = 7919
HOT_MOD = 10

WORDS = "key agg row scan slow fast table value part hash merge batch join".split()


def _lat_lon_milli(i: Column) -> tuple[Column, Column]:
    """Geotag coordinates in integer millidegrees, with the hot cell at
    (10.0, 10.0) — same rule as model.points."""
    hot = (i % HOT_MOD) == 0
    lon_m = F.when(hot, 190000 + (i % 100)).otherwise((i * LON_MULT) % 360000)
    lat_m = F.when(hot, 100000 + ((i / HOT_MOD).cast("long") % 100)).otherwise(
        (i * LAT_MULT) % 180000
    )
    # stored relative to 0: lon = -180 + lon_m/1000, lat = -90 + lat_m/1000
    return lat_m, lon_m


def generate_pages(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic page corpus of n rows — seeded arithmetic only."""
    i = F.col("id")
    lat_m, lon_m = _lat_lon_milli(i)
    words = F.array(*[F.lit(w) for w in WORDS])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), (i % 7) + 20),
            lambda j: F.element_at(words, ((i * 31 + j * 17) % len(WORDS) + 1).cast("int")),
        ),
    )
    text = F.concat(
        body,
        F.lit(" geo:"),
        lat_m.cast("string"),
        F.lit(","),
        lon_m.cast("string"),
    )
    html = F.encode(F.concat(F.lit(HTML_PREFIX), text, F.lit(HTML_SUFFIX)), "utf-8")
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        ((i * 2654435761) % 4 + 1).cast("int"),
    )
    ts = F.timestamp_seconds(F.lit(1735689600) + (i * TS_STEP) % 31536000)  # 2025 epoch
    return spark.range(n).select(
        F.concat(F.lit("https://site"), (i % N_SITES).cast("string"), F.lit(".example/p/"), i.cast("string")).alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text_col(html: Column) -> Column:
    """html binary -> text, byte-identical (north-rule invariant)."""
    s = F.decode(html, "utf-8")
    return F.substring(
        s, len(HTML_PREFIX) + 1, F.length(s) - len(HTML_PREFIX) - len(HTML_SUFFIX)
    )


def extract_geotags(pages: DataFrame, id_col: str = "url") -> DataFrame:
    """pages -> point features (id, lon, lat): regexp parse of the geotag
    token + exact integer->double arithmetic.  All JVM-side.

    Pages WITHOUT a geotag produce no point feature (filtered before the
    parse): on a real web corpus untagged pages are the majority, and
    unfiltered they would feed regexp_extract's empty-string match into
    the long cast — a CAST_INVALID_INPUT crash under Spark's ANSI mode."""
    text = extract_text_col(F.col("html"))
    lat_m = F.regexp_extract(text, GEO_RE, 1).cast("long")
    lon_m = F.regexp_extract(text, GEO_RE, 2).cast("long")
    return pages.where(text.rlike(GEO_RE)).select(
        F.col(id_col),
        (F.lit(-180.0) + lon_m / F.lit(1000.0)).alias("lon"),
        (F.lit(-90.0) + lat_m / F.lit(1000.0)).alias("lat"),
    )
