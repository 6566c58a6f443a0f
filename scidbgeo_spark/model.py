"""Data model: deterministic derivations of the engine's tables.

The reference's data objects are SciDB dense arrays created from GeoTIFF
rasters + zone shapefiles (SURVEY.md §1).  In this repo every geo table is
derived *deterministically, by pure column arithmetic*, from the driver's
testdata parquet so that a DuckDB oracle can compute the identical table
from the identical rows:

- **raster** (dense 2-D grid, SciDB ``<value>[y;x]`` analog) from ``events``:
  ``event_id`` is dense 0..N-1, so ``y = event_id div W``, ``x = event_id
  mod W``, ``value = (event_id * 2654435761) mod 251``  (same Knuth-hash
  fixture rule as FIXTURES.md F3).
- **raster 3-D** (``<value>[band;y;x]``) similarly with ``band = event_id
  mod 4``.
- **points** (geotagged pages; BASELINE.json input_hint) from ``documents``:
  lon/lat by integer arithmetic on ``doc_id``, with a deliberate hot cell
  (10% of points inside [10,10.1)²) to exercise skew handling.

All arithmetic is integer-exact, so Spark and DuckDB produce bitwise
identical values regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# ---- raster fixture constants (mirrored in oracle.py SQL) -----------------
RASTER_W = 100          # fixed raster width in pixels; height = N / W
VALUE_MULT = 2654435761  # Knuth multiplicative hash
VALUE_MOD = 251
CHUNK = 50               # default tile (chunk) size, SciDB chunk analog
# second attribute for multi-attribute arrays (arrayType == 2)
VALUE_MULT_B = 2246822519
VALUE_MOD_B = 509

# 3-D raster constants
BANDS = 4
RASTER3_W = 50

# ---- point fixture constants ----------------------------------------------
LON_MULT = 9973
LAT_MULT = 7919
HOT_MOD = 10             # doc_id % 10 == 0 -> hot cell at (10.0, 10.0)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def raster_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense raster as COO rows ``(y:long, x:long, value:long)``.

    Analog of the reference's 1-D load array ``<y1:int64,x1:int64,value>``
    (scidb.py:283-286).  Derived from ``events`` so the DuckDB oracle can
    rebuild it with the same arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.expr(f"event_id DIV {RASTER_W}").alias("y"),
        (F.col("event_id") % RASTER_W).alias("x"),
        ((F.col("event_id") * F.lit(VALUE_MULT)) % VALUE_MOD).alias("value"),
    )


def raster_dims(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(H, W) of the derived raster.  One metadata-only count action.

    The derivation assumes the dense event-id range fills whole raster
    rows; a non-multiple count would leave a ragged last row that every
    tile path (zonal zip, focal reshape) silently mishandles vs the
    oracle — so fail fast instead."""
    n = load_table(spark, sf_dir, "events").count()
    if n % RASTER_W != 0:
        raise ValueError(
            f"events count {n} is not a multiple of RASTER_W={RASTER_W}; "
            "the derived raster would have a ragged last row"
        )
    return n // RASTER_W, RASTER_W


def raster3_dims(spark: SparkSession, sf_dir: str) -> tuple[int, int, int]:
    """(BANDS, H3, W3) of the derived 3-D raster, with the same
    fail-fast divisibility contract as :func:`raster_dims`."""
    n = load_table(spark, sf_dir, "events").count()
    if n % (BANDS * RASTER3_W) != 0:
        raise ValueError(
            f"events count {n} is not a multiple of BANDS*RASTER3_W="
            f"{BANDS * RASTER3_W}; the 3-D raster would be ragged"
        )
    return BANDS, n // BANDS // RASTER3_W, RASTER3_W


def raster_coo_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-attribute raster COO ``(y, x, va, vb)`` — the reference's
    arrayType == 2 shape: several value attributes per cell in ONE array
    (``RasterShapeLogic``/attribute-list handling, SciDBParallel.py:55-83)
    as opposed to bands-as-dimension (raster3_coo)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.expr(f"event_id DIV {RASTER_W}").alias("y"),
        (F.col("event_id") % RASTER_W).alias("x"),
        ((F.col("event_id") * F.lit(VALUE_MULT)) % VALUE_MOD).alias("va"),
        ((F.col("event_id") * F.lit(VALUE_MULT_B)) % VALUE_MOD_B).alias("vb"),
    )


def raster3_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D raster COO ``(band, y, x, value)`` — SciDB multiband analog
    (GDALtoSciDB_multiprocessing.py:145-148 creates [band;y;x] arrays)."""
    ev = load_table(spark, sf_dir, "events")
    rest = F.expr(f"event_id DIV {BANDS}")
    return ev.select(
        (F.col("event_id") % BANDS).alias("band"),
        F.expr(f"(event_id DIV {BANDS}) DIV {RASTER3_W}").alias("y"),
        (rest % RASTER3_W).alias("x"),
        ((F.col("event_id") * F.lit(VALUE_MULT)) % VALUE_MOD).alias("value"),
    )


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotagged page points ``(doc_id, lon, lat)`` extracted from documents.

    Mirrors the graft's page->geotag extraction (BASELINE.json input_hint);
    coordinates are exact integer-ratio doubles (k/1000) so DuckDB matches
    bitwise.  10% of points pile into one hot cell for skew tests.
    """
    docs = load_table(spark, sf_dir, "documents")
    base_lon = F.lit(-180.0) + ((F.col("doc_id") * LON_MULT) % 360000) / F.lit(1000.0)
    base_lat = F.lit(-90.0) + ((F.col("doc_id") * LAT_MULT) % 180000) / F.lit(1000.0)
    hot = (F.col("doc_id") % HOT_MOD) == 0
    return docs.select(
        "doc_id",
        F.when(hot, F.lit(10.0) + (F.col("doc_id") % 100) / F.lit(1000.0))
        .otherwise(base_lon)
        .alias("lon"),
        F.when(hot, F.lit(10.0) + (F.expr(f"doc_id DIV {HOT_MOD}") % 100) / F.lit(1000.0))
        .otherwise(base_lat)
        .alias("lat"),
    )
