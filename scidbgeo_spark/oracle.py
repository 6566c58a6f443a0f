"""DuckDB oracle SQL for every SQL-expressible engine query.

Each string rebuilds the engine's derived tables (raster COO from
``events``, points from ``documents``) with the *same integer arithmetic*
as scidbgeo_spark.model, so results are bitwise comparable.  Aggregate
sums are CAST to BIGINT (DuckDB promotes sum(BIGINT) to HUGEINT; Spark
keeps LONG).

These strings are consumed by ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from scidbgeo_spark.fixtures import ZONE_H, ZONE_W
from scidbgeo_spark.model import (
    BANDS,
    CHUNK,
    HOT_MOD,
    LAT_MULT,
    LON_MULT,
    RASTER3_W,
    RASTER_W,
    VALUE_MOD,
    VALUE_MOD_B,
    VALUE_MULT,
    VALUE_MULT_B,
)

# -- shared CTE fragments -----------------------------------------------------

COO = f"""
coo AS (
  SELECT event_id // {RASTER_W} AS y,
         event_id % {RASTER_W} AS x,
         (event_id * {VALUE_MULT}) % {VALUE_MOD} AS value
  FROM events
)"""

COO3 = f"""
coo3 AS (
  SELECT event_id % {BANDS} AS band,
         (event_id // {BANDS}) // {RASTER3_W} AS y,
         (event_id // {BANDS}) % {RASTER3_W} AS x,
         (event_id * {VALUE_MULT}) % {VALUE_MOD} AS value
  FROM events
)"""

PTS = f"""
pts AS (
  SELECT doc_id,
         CASE WHEN doc_id % {HOT_MOD} = 0
              THEN 10.0 + (doc_id % 100) / 1000.0
              ELSE -180.0 + ((doc_id * {LON_MULT}) % 360000) / 1000.0 END AS lon,
         CASE WHEN doc_id % {HOT_MOD} = 0
              THEN 10.0 + ((doc_id // {HOT_MOD}) % 100) / 1000.0
              ELSE -90.0 + ((doc_id * {LAT_MULT}) % 180000) / 1000.0 END AS lat
  FROM documents
)"""

NZX = RASTER_W // ZONE_W  # rect-grid zones per raster row
# The rect-grid polygon layer tiles [0, (H div ZONE_H)*ZONE_H) x [0, W);
# rows below the last full zone band are nodata (-999), matching the
# rasterized layer at ANY raster height (H = count(events)/RASTER_W).
RECT_ZONE = f"""CASE
  WHEN y >= (((SELECT count(*) FROM events) // {RASTER_W}) // {ZONE_H}) * {ZONE_H}
  THEN -999
  ELSE (y // {ZONE_H}) * {NZX} + (x // {ZONE_W}) END"""

# membership arithmetic for fixtures.MIXED_POLYGONS (burn order = reverse CASE)
MIXED_ZONE = """CASE
  WHEN x >= 80 AND x < 100 AND y >= 80 AND y < 100 THEN 4
  WHEN x >= 70 AND x < 95  AND y >= 60 AND y < 95  THEN 3
  WHEN (x >= 40 AND x < 60 AND y >= 10 AND y < 50)
    OR (x >= 60 AND x < 90 AND y >= 10 AND y < 30) THEN 2
  WHEN x >= 10 AND y >= 10 AND x + y <= 38 THEN 1
  ELSE -999 END"""

# membership arithmetic for fixtures.GEO_POLYGONS (non-overlapping)
GEO_ZONE = """CASE
  WHEN lon >= 0    AND lon < 45  AND lat >= 0   AND lat < 45  THEN 10
  WHEN (lon >= -120 AND lon < -60 AND lat >= -60 AND lat < 0)
    OR (lon >= -60  AND lon < -30 AND lat >= -60 AND lat < -30) THEN 11
  WHEN lon >= 90   AND lon < 180 AND lat >= 30  AND lat < 90  THEN 12
  END"""

# even-odd membership for fixtures.GEO_POLYGONS_HOLED: zone 20 is a
# rect minus a hole rect, zone 21 a union of two disjoint rect parts —
# the half-open [a,b)x[c,d) semantics of the crossing test make both
# exact CASE arithmetic
GEO_ZONE_HOLED = """CASE
  WHEN (lon >= 0 AND lon < 60 AND lat >= -90 AND lat < -30)
       AND NOT (lon >= 15 AND lon < 30 AND lat >= -75 AND lat < -60) THEN 20
  WHEN (lon >= -45 AND lon < -15 AND lat >= 30 AND lat < 60)
    OR (lon >= 60 AND lon < 90 AND lat >= -30 AND lat < 0) THEN 21
  END"""

ZONAL_AGG = """min(value) AS min_value,
       max(value) AS max_value,
       avg(value) AS avg_value,
       CAST(count(value) AS BIGINT) AS count_value"""


SQL: dict[str, str] = {
    "count_pixels": f"""WITH {COO}
SELECT CAST(sum(value) AS BIGINT) AS pixel_sum FROM coo WHERE value = 42""",
    "count_pixels_tiles": f"""WITH {COO}
SELECT CAST(sum(value) AS BIGINT) AS pixel_sum FROM coo WHERE value = 42""",
    "count_pixels_true": f"""WITH {COO}
SELECT CAST(count(value) AS BIGINT) AS pixel_count FROM coo WHERE value = 42""",
    "reclassify_sum": f"""WITH {COO}
SELECT CAST(sum(CASE WHEN value = 87 THEN 1000 ELSE 0 END) AS BIGINT)
  AS reclass_sum FROM coo""",
    "merge_insert_catalog": f"""WITH {COO}
SELECT y, x,
       CAST(CASE WHEN y < 50
                 THEN CASE WHEN value = 87 THEN 1000 ELSE -99 END
                 ELSE value END AS BIGINT) AS value
FROM coo""",
    "reclassify_persist": f"""WITH {COO}
SELECT y, x, CAST(CASE WHEN value = 87 THEN 1000 ELSE -99 END AS BIGINT)
  AS newvalue FROM coo""",
    "count_pixels_sql": f"""WITH {COO}
SELECT CAST(count(value) AS BIGINT) AS pixel_count FROM coo WHERE value = 42""",
    "merge_insert": f"""WITH {COO}
SELECT y, x,
       CAST(CASE WHEN y < 50
                 THEN CASE WHEN value = 87 THEN 1000 ELSE -99 END
                 ELSE value END AS BIGINT) AS value
FROM coo""",
    "transpose": f"""WITH {COO}
SELECT x AS y, y AS x, value FROM coo""",
    "snapshot_diff": f"""WITH {COO}
SELECT y, x, CAST(value AS BIGINT) AS old_value,
       CAST(-value - 1 AS BIGINT) AS new_value
FROM coo WHERE y < {CHUNK} AND x < {CHUNK}""",
    "downsample": f"""WITH {COO}
SELECT y // 2 AS y, x // 2 AS x, avg(value) AS value_avg
FROM coo GROUP BY 1, 2""",
    "raster_histogram": f"""WITH {COO}
SELECT value, CAST(count(*) AS BIGINT) AS n_pixels FROM coo GROUP BY 1""",
    "upsample": f"""WITH {COO}
SELECT y * 2 + g.d // 2 AS y, x * 2 + g.d % 2 AS x, value
FROM coo, (SELECT unnest(generate_series(0, 3)) AS d) g""",
    "bernoulli_sample": f"""WITH {COO}
SELECT y, x, value FROM coo
WHERE ('0x' || substr(md5(y::VARCHAR || '_' || x::VARCHAR || ':42'), 1, 15))::BIGINT
      % 1000 < 250""",
    "between_window": f"""WITH {COO}
SELECT y, x, value FROM coo
WHERE y BETWEEN 25 AND 75 AND x BETWEEN 10 AND 60""",
    "subarray": f"""WITH {COO}
SELECT y - 25 AS y, x - 10 AS x, value FROM coo
WHERE y BETWEEN 25 AND 75 AND x BETWEEN 10 AND 60""",
    "slice_band": f"""WITH {COO3}
SELECT y, x, value FROM coo3 WHERE band = 2""",
    "raster_add": f"""WITH {COO}
SELECT y, x, a.value + b.value AS result
FROM coo a JOIN coo b USING (y, x)""",
    "redimension_roundtrip": f"""WITH {COO}
SELECT y, x, value FROM coo""",
    "geotiff_ingest": f"""WITH {COO}
SELECT y, x, value FROM coo""",
    "redimension_roundtrip_3d": f"""WITH {COO3}
SELECT band, y, x, value FROM coo3""",
    # multiband-file byte layout must round-trip exactly
    "geotiff_ingest_3d": f"""WITH {COO3}
SELECT band, y, x, value FROM coo3""",
    "zonal_stats_rect": f"""WITH {COO}
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       {ZONAL_AGG}
FROM coo GROUP BY 1""",
    "zonal_stats_poly": f"""WITH {COO}
SELECT CAST({MIXED_ZONE} AS BIGINT) AS id,
       {ZONAL_AGG}
FROM coo GROUP BY 1""",
    "zonal_stats_broadcast": f"""WITH {COO}
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       {ZONAL_AGG}
FROM coo GROUP BY 1""",
    "zonal_stats_sortmerge": f"""WITH {COO}
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       {ZONAL_AGG}
FROM coo GROUP BY 1""",
    "zonal_stats_float": f"""WITH coof AS (
  SELECT event_id // {RASTER_W} AS y, event_id % {RASTER_W} AS x, value FROM events
)
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       min(value) AS min_value, max(value) AS max_value,
       CAST(count(*) AS BIGINT) AS count_value
FROM coof GROUP BY 1""",
    "zonal_histogram": f"""WITH {COO}
SELECT CAST({RECT_ZONE} AS BIGINT) AS id, value, CAST(count(*) AS BIGINT) AS n
FROM coo GROUP BY 1, 2""",
    "zonal_mode": f"""WITH {COO},
hist AS (
  SELECT CAST({RECT_ZONE} AS BIGINT) AS id, value AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM coo GROUP BY 1, 2
)
SELECT id, v AS mode_value, n AS n_pixels
FROM hist QUALIFY row_number() OVER (PARTITION BY id ORDER BY n DESC, v) = 1""",
    "zonal_var": f"""WITH {COO},
g AS (
  SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
         sum(value) AS s,
         sum(value * value) AS ss,
         CAST(count(*) AS BIGINT) AS c
  FROM coo GROUP BY 1
)
SELECT id,
       CAST(c * ss - s * s AS DOUBLE)
         / CAST(CAST(c AS HUGEINT) * c AS DOUBLE) AS var_value,
       sqrt(CAST(c * ss - s * s AS DOUBLE)
         / CAST(CAST(c AS HUGEINT) * c AS DOUBLE)) AS std_value,
       c AS count_value
FROM g""",
    "zonal_median": f"""WITH {COO}
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       quantile_cont(value, 0.5) AS median_value,
       quantile_cont(value, 0.9) AS p90_value
FROM coo GROUP BY 1""",
    "zonal_stats_multi": f"""WITH coom AS (
  SELECT event_id // {RASTER_W} AS y,
         event_id % {RASTER_W} AS x,
         (event_id * {VALUE_MULT}) % {VALUE_MOD} AS va,
         (event_id * {VALUE_MULT_B}) % {VALUE_MOD_B} AS vb
  FROM events
)
SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
       min(va) AS min_a, max(va) AS max_a, avg(va) AS avg_a,
       CAST(count(va) AS BIGINT) AS count_a,
       CAST(sum(vb) AS BIGINT) AS sum_b
FROM coom GROUP BY 1""",
    "extract_geotags": f"""SELECT doc_id,
  -180.0 + (CASE WHEN doc_id % {HOT_MOD} = 0 THEN 190000 + doc_id % 100
                 ELSE (doc_id * {LON_MULT}) % 360000 END) / 1000.0 AS lon,
  -90.0 + (CASE WHEN doc_id % {HOT_MOD} = 0 THEN 100000 + (doc_id // {HOT_MOD}) % 100
                ELSE (doc_id * {LAT_MULT}) % 180000 END) / 1000.0 AS lat
FROM documents""",
    "join_reclass": f"""WITH {COO}
SELECT y, x,
       CAST(CASE WHEN {RECT_ZONE} = 7 THEN 500 ELSE value END AS BIGINT)
  AS newvalue FROM coo""",
    "focal_mean_sum": f"""WITH {COO},
nb AS (
  SELECT a.y AS y, a.x AS x,
         CAST(sum(b.value) AS BIGINT) AS s, count(*) AS c
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
  GROUP BY a.y, a.x
)
SELECT CAST(sum((s * 36) // c) AS BIGINT) AS focal_sum36 FROM nb""",
    "focal_mean_cells": f"""WITH {COO},
nb AS (
  SELECT a.y AS y, a.x AS x,
         CAST(sum(b.value) AS BIGINT) AS s, count(*) AS c
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
  GROUP BY a.y, a.x
)
SELECT y, x, CAST(s AS DOUBLE) / c AS value_avg FROM nb""",
    "focal_minmax": f"""WITH {COO}
SELECT a.y AS y, a.x AS x,
       CAST(min(b.value) AS BIGINT) AS min_value,
       CAST(max(b.value) AS BIGINT) AS max_value
FROM coo a JOIN coo b
  ON b.y BETWEEN a.y - 1 AND a.y + 1
 AND b.x BETWEEN a.x - 1 AND a.x + 1
GROUP BY a.y, a.x""",
    "focal_mean_r2": f"""WITH {COO},
nb AS (
  SELECT a.y AS y, a.x AS x,
         CAST(sum(b.value) AS BIGINT) AS s, count(*) AS c
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 2 AND a.y + 2
   AND b.x BETWEEN a.x - 2 AND a.x + 2
  GROUP BY a.y, a.x
)
SELECT y, x, CAST(s AS DOUBLE) / c AS value_avg FROM nb""",
    # Horn 3x3 terrain derivatives: neighbor values are CLOSED-FORM
    # modular arithmetic on event_id (id = y*W + x, so the (dy,dx)
    # neighbor's value is ((id + dy*W + dx) * MULT) % MOD) — zero joins,
    # fully independent of the engine's halo-exchange path.  Interior
    # cells only (the raster has no ragged row: raster_dims fails fast).
    # slope/hillshade reproduce bitwise: int->double conversions are
    # exact, IEEE sqrt is correctly rounded, /8 /16 /64 are powers of
    # two, and hillshade rounds to an int, collapsing residual ULP risk.
    "terrain": f"""WITH g AS (
  SELECT event_id // {RASTER_W} AS y, event_id % {RASTER_W} AS x,
    (((event_id - {RASTER_W} + 1) * {VALUE_MULT}) % {VALUE_MOD}
     + 2 * (((event_id + 1) * {VALUE_MULT}) % {VALUE_MOD})
     + ((event_id + {RASTER_W} + 1) * {VALUE_MULT}) % {VALUE_MOD})
    - (((event_id - {RASTER_W} - 1) * {VALUE_MULT}) % {VALUE_MOD}
     + 2 * (((event_id - 1) * {VALUE_MULT}) % {VALUE_MOD})
     + ((event_id + {RASTER_W} - 1) * {VALUE_MULT}) % {VALUE_MOD}) AS gx,
    (((event_id + {RASTER_W} - 1) * {VALUE_MULT}) % {VALUE_MOD}
     + 2 * (((event_id + {RASTER_W}) * {VALUE_MULT}) % {VALUE_MOD})
     + ((event_id + {RASTER_W} + 1) * {VALUE_MULT}) % {VALUE_MOD})
    - (((event_id - {RASTER_W} - 1) * {VALUE_MULT}) % {VALUE_MOD}
     + 2 * (((event_id - {RASTER_W}) * {VALUE_MULT}) % {VALUE_MOD})
     + ((event_id - {RASTER_W} + 1) * {VALUE_MULT}) % {VALUE_MOD}) AS gy
  FROM events
  WHERE event_id % {RASTER_W} BETWEEN 1 AND {RASTER_W - 2}
    AND event_id // {RASTER_W}
        BETWEEN 1 AND (SELECT count(*) FROM events) // {RASTER_W} - 2
)
SELECT y, x, gx, gy,
  sqrt(CAST(gx*gx + gy*gy AS DOUBLE)) / 8.0 AS slope,
  CAST(CASE WHEN gx = 0 AND gy = 0 THEN 0
    WHEN gx > 0 AND gy >= 0 AND gy < gx THEN 1
    WHEN gy > 0 AND gx > 0 THEN 2
    WHEN gy > 0 AND gx <= 0 AND abs(gx) < gy THEN 3
    WHEN gy > 0 AND gx < 0 THEN 4
    WHEN gx < 0 AND gy <= 0 AND abs(gy) < abs(gx) THEN 5
    WHEN gy < 0 AND gx < 0 THEN 6
    WHEN gy < 0 AND gx >= 0 AND gx < abs(gy) THEN 7
    ELSE 8 END AS INT) AS d8,
  CAST(floor(greatest(0.0,
    255.0 * ((gx + gy) / 16.0 + sqrt(0.5))
      / sqrt(1.0 + (gx*gx + gy*gy) / 64.0)) + 0.5) AS INT) AS hillshade
FROM g""",
    # binomial-smoothed density: the kernel convolves the aggregated
    # cell counts (offsets cross-join a 9-row VALUES table), mirroring
    # the engine's scatter — weight (2-|dy|)*(2-|dx|)
    "point_density": f"""WITH {PTS},
cells AS (
  SELECT CAST(floor(lat + 90.0) AS BIGINT) AS cy,
         CAST(floor(lon + 180.0) AS BIGINT) AS cx, count(*) AS n
  FROM pts GROUP BY 1, 2
),
offs AS (SELECT a.dy, b.dx
         FROM (VALUES (-1), (0), (1)) a(dy), (VALUES (-1), (0), (1)) b(dx))
SELECT c.cy + o.dy AS cy, c.cx + o.dx AS cx,
       CAST(sum(c.n * (2 - abs(o.dy)) * (2 - abs(o.dx))) AS BIGINT)
         AS density
FROM cells c, offs o
WHERE c.cy + o.dy BETWEEN 0 AND 179 AND c.cx + o.dx BETWEEN 0 AND 359
GROUP BY 1, 2""",
    "between_tiles": f"""WITH {COO}
SELECT y, x, value FROM coo
WHERE y BETWEEN 25 AND 75 AND x BETWEEN 10 AND 60""",
    "overlay_add_bands": f"""WITH {COO3}
SELECT y, x, a.value + b.value AS result
FROM (SELECT y, x, value FROM coo3 WHERE band = 0) a
JOIN (SELECT y, x, value FROM coo3 WHERE band = 1) b USING (y, x)""",
    "cell_index": f"""WITH {PTS}
SELECT doc_id,
       CAST(floor(lat + 90) * 360 + floor(lon + 180) AS BIGINT) AS cell
FROM pts""",
    "pip_grid": f"""WITH {PTS}
SELECT CAST(floor((lon + 180) / 60) * 3 + floor((lat + 90) / 60) AS BIGINT)
         AS zone_id,
       count(*) AS n_points
FROM pts GROUP BY 1""",
    "pip_grid_salted": f"""WITH {PTS}
SELECT CAST(floor((lon + 180) / 60) * 3 + floor((lat + 90) / 60) AS BIGINT)
         AS zone_id,
       count(*) AS n_points
FROM pts GROUP BY 1""",
    "pip_poly": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    "pip_poly_df": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    # WKT-file layer: serialization round-trip must not change results
    "pip_poly_wkt": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    # shapefile layer (pure-NumPy .shp/.dbf reader): the binary
    # round-trip must not change results either
    "pip_poly_shp": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    # .shx-indexed splittable scan: the scan strategy must not change
    # results either
    "pip_poly_shp_indexed": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    # multi-ring layer: POLYGON-with-hole + MULTIPOLYGON under even-odd
    "pip_poly_holes": f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE_HOLED} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL""",
    # north-star composite: pages -> text -> geotags -> PIP -> rollup.
    # The html/extraction stages are byte-exact inverses, so the oracle
    # reduces to the point arithmetic + zone function + token counts.
    "pages_geo_rollup": f"""WITH {PTS},
hits AS (
  SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
    SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
  ) WHERE zone_id IS NOT NULL
),
tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
SELECT zone_id, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM hits JOIN tok USING (doc_id) GROUP BY 1""",
    "extract_text": """SELECT doc_id, text AS extracted FROM documents""",
    "token_count": """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens FROM documents""",
    # same pattern string as text.BPE_TOKEN_RE — no lookarounds, so
    # Java regex (Spark) and RE2 (DuckDB) match identically
    "token_count_bpe": """SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         e'\\'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s\\']+|\\s+'))
         AS INT) AS n_tokens_bpe FROM documents""",
    "distance_join": f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 10
)
SELECT p.doc_id, q.q_id,
       (p.lon - q.qlon) * (p.lon - q.qlon)
     + (p.lat - q.qlat) * (p.lat - q.qlat) AS dist2
FROM pts p CROSS JOIN q
WHERE (p.lon - q.qlon) * (p.lon - q.qlon)
    + (p.lat - q.qlat) * (p.lat - q.qlat) <= 144.0""",
    # DuckDB's NATIVE ASOF JOIN pins the as-of semantics exactly
    "events_asof": """WITH r AS (
  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS state_id
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
SELECT e.event_id, e.user_id,
       CAST(coalesce(r.state_id, -1) AS BIGINT) AS state_id
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.ts""",
    "repetition_stats": """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS b
  FROM tok, lateral (SELECT unnest(generate_series(1, len(t)-1)) AS i)
),
counts AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
           FROM bg GROUP BY 1, 2)
SELECT doc_id,
  CAST(max(n) AS BIGINT) AS top_bigram_n,
  CAST(sum(n) AS BIGINT) AS n_bigrams,
  CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
  max(n) / CAST(sum(n) AS BIGINT) AS top_bigram_frac,
  count(*) / CAST(sum(n) AS BIGINT) AS distinct_bigram_ratio
FROM counts GROUP BY 1""",
    # same variant construction as q_url_dedup and the same
    # normalization regexp chain as dedup.url_normalize
    "url_dedup": """WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
         WHEN 2 THEN 'HTTPS://www.' ELSE 'https://www.' END
    || 'site' || CAST((doc_id // 2) % 7 AS VARCHAR)
    || '.example/p/' || CAST(doc_id // 2 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END AS url
  FROM documents)
SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         lower(url), '^https?://', ''), '^www\\.', ''), '#.*$', ''),
         '/$', '') AS url_norm,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM u GROUP BY 1""",
    # same rule thresholds/bits as text.quality_filter defaults
    "quality_filter": """SELECT doc_id, fail_mask = 0 AS keep, fail_mask FROM (
  SELECT doc_id,
     CAST(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END
        + CASE WHEN cpt < 3.0 OR cpt > 12.0 THEN 2 ELSE 0 END
        + CASE WHEN punct > 0.2 THEN 4 ELSE 0 END
        + CASE WHEN lex < 0.35 THEN 8 ELSE 0 END AS INT) AS fail_mask
  FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) AS BIGINT) / len(string_split(text, ' ')) AS cpt,
           (CAST(length(text) AS BIGINT)
              - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
             / CAST(length(text) AS BIGINT) AS punct,
           len(list_distinct(string_split(text, ' ')))
             / len(string_split(text, ' ')) AS lex
    FROM documents))""",
    "text_quality": """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(text) AS BIGINT) / len(string_split(text, ' ')) AS chars_per_token,
       len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))
         AS lexical_diversity,
       (CAST(length(text) AS BIGINT)
          - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
         / CAST(length(text) AS BIGINT) AS punct_ratio,
       len(list_filter(string_split(text, ' '),
                       t -> list_contains([{stopwords}], t)))
         / len(string_split(text, ' ')) AS stopword_ratio
FROM documents""",
    "doc_fingerprint": """SELECT doc_id,
       list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                   (a, c) -> (a * 257 + c) % 2147483647) AS fingerprint
FROM documents""",
    "multimodal_meta": """SELECT doc_id,
       CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT)
         AS n_bytes,
       lower(hex(encode(substr('<html><body>' || text || '</body></html>', 1, 4))))
         AS magic_hex
FROM documents""",
    "events_hourly": """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 1, 2""",
    "knn": f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 5
)
SELECT q_id, doc_id, CAST(rank AS INT) AS rank FROM (
  SELECT q.q_id, p.doc_id,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY (p.lon - q.qlon) * (p.lon - q.qlon)
                  + (p.lat - q.qlat) * (p.lat - q.qlat),
                    p.doc_id
         ) AS rank
  FROM q CROSS JOIN pts p
) WHERE rank <= 10""",
    "knn_bulk": f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 25
)
SELECT q_id, doc_id, CAST(rank AS INT) AS rank FROM (
  SELECT q.q_id, p.doc_id,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY (p.lon - q.qlon) * (p.lon - q.qlon)
                  + (p.lat - q.qlat) * (p.lat - q.qlat),
                    p.doc_id
         ) AS rank
  FROM q CROSS JOIN pts p
) WHERE rank <= 10""",
}

# ---------------------------------------------------------------------------
# programmatically generated oracle SQL: lang-id, dedup family, ANN
# (mirrors scidbgeo_spark.operators.{text,dedup,similarity} constants)
# ---------------------------------------------------------------------------

from scidbgeo_spark.operators.dedup import A as MH_A, B as MH_B, N_BANDS, N_HASHES, P, SHINGLE_K, SIMHASH_BITS  # noqa: E402
from scidbgeo_spark.operators.text import LANG_MARKERS, STOPWORDS  # noqa: E402

# stopword list injected from the operator's constant (cannot desync)
SQL["text_quality"] = SQL["text_quality"].replace(
    "{stopwords}", ", ".join(f"'{w}'" for w in STOPWORDS)
)

_n = len(LANG_MARKERS)
_enc = {
    lang: f"((length(text) - length(replace(text, '{m}', ''))) / {len(m)}) * 1000 + {_n - 1 - i}"
    for i, (lang, m) in enumerate(LANG_MARKERS)
}
_g = "greatest(" + ", ".join(f"e_{lang}" for lang, _ in LANG_MARKERS) + ")"
_case = " ".join(
    f"WHEN e_{lang} = {_g} THEN '{lang}'" for lang, _ in LANG_MARKERS
)
# text.tfidf_top_terms: integer counts + one exact division -> bitwise
SQL["tfidf_top_terms"] = """WITH
tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents),
tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT lang, term, CAST(tf * n AS DOUBLE) / doc_freq AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN nd
)
SELECT lang, term, score,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY score DESC, term) AS BIGINT) AS rank
FROM scored QUALIFY rank <= 5"""

SQL["lang_id"] = (
    "SELECT doc_id, CASE " + _case + " END AS lang_pred FROM (SELECT doc_id, "
    + ", ".join(f"{expr} AS e_{lang}" for lang, expr in _enc.items())
    + " FROM documents)"
)

# Connected-component labeling: exact recursive min-propagation twin of
# regions.region_label (4-connectivity over cls = value DIV CLASS_DIV;
# region = component-min linear id).  adj0 is equi-joinable (hash keys
# (y, x+1)/(y+1, x)); the WHERE prunes propagation to descending labels,
# which the true component min always satisfies.
from scidbgeo_spark.operators.regions import CLASS_DIV  # noqa: E402

SQL["region_label"] = f"""WITH RECURSIVE {COO},
clsv AS (SELECT y, x, value // {CLASS_DIV} AS cls, y*{RASTER_W}+x AS id FROM coo),
adj0 AS (
  SELECT a.id AS src, b.id AS dst FROM clsv a JOIN clsv b
    ON b.y = a.y AND b.x = a.x + 1 AND b.cls = a.cls
  UNION ALL
  SELECT a.id, b.id FROM clsv a JOIN clsv b
    ON b.y = a.y + 1 AND b.x = a.x AND b.cls = a.cls
),
adj AS (SELECT src, dst FROM adj0 UNION ALL SELECT dst, src FROM adj0),
lbl AS (
  SELECT id, id AS region FROM clsv
  UNION
  SELECT e.dst AS id, l.region
  FROM lbl l JOIN adj e ON e.src = l.id
  WHERE l.region < e.dst
)
SELECT c.y, c.x, CAST(c.cls AS BIGINT) AS cls,
       CAST(min(l.region) AS BIGINT) AS region
FROM lbl l JOIN clsv c ON c.id = l.id GROUP BY 1, 2, 3"""

SQL["region_stats"] = f"""WITH rl AS ({SQL["region_label"]})
SELECT region, CAST(min(cls) AS BIGINT) AS cls,
       CAST(count(*) AS BIGINT) AS n_pixels,
       min(y) AS y_min, max(y) AS y_max, min(x) AS x_min, max(x) AS x_max
FROM rl GROUP BY 1"""

# regions.region_vectorize: envelope-polygon WKT per region under the
# integer affine transform — coordinate strings are BIGINT casts, so the
# concat is bitwise-identical between Spark and DuckDB.
from scidbgeo_spark.operators.regions import (  # noqa: E402
    VEC_UL_X,
    VEC_UL_Y,
    VEC_X_DIST,
    VEC_Y_DIST,
)

SQL["region_vectorize"] = f"""WITH rs AS ({SQL["region_stats"]})
SELECT region, cls, n_pixels,
  'POLYGON((' ||
  CAST({VEC_UL_X} + {VEC_X_DIST}*x_min AS VARCHAR) || ' ' ||
  CAST({VEC_UL_Y} + {VEC_Y_DIST}*y_min AS VARCHAR) || ',' ||
  CAST({VEC_UL_X} + {VEC_X_DIST}*(x_max+1) AS VARCHAR) || ' ' ||
  CAST({VEC_UL_Y} + {VEC_Y_DIST}*y_min AS VARCHAR) || ',' ||
  CAST({VEC_UL_X} + {VEC_X_DIST}*(x_max+1) AS VARCHAR) || ' ' ||
  CAST({VEC_UL_Y} + {VEC_Y_DIST}*(y_max+1) AS VARCHAR) || ',' ||
  CAST({VEC_UL_X} + {VEC_X_DIST}*x_min AS VARCHAR) || ' ' ||
  CAST({VEC_UL_Y} + {VEC_Y_DIST}*(y_max+1) AS VARCHAR) || ',' ||
  CAST({VEC_UL_X} + {VEC_X_DIST}*x_min AS VARCHAR) || ' ' ||
  CAST({VEC_UL_Y} + {VEC_Y_DIST}*y_min AS VARCHAR) ||
  '))' AS wkt
FROM rs"""

CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, 'mutated ' || text AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
)"""

SHINGLES = f"""
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K} + 1, 1) + 1),
           i -> array_to_string(toks[i:i+{SHINGLE_K - 1}], ' '))) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
)"""

_MD5INT = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

SQL["dedup_exact"] = f"""WITH {CORPUS}
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY md5(text)"""

_mh_cols = ", ".join(
    f"list_min(list_transform(sh, s -> (({_MD5INT.format(x='s')} % {P}) * {MH_A[j]} + {MH_B[j]}) % {P})) AS mh_{j}"
    for j in range(N_HASHES)
)
SIG = f"sig AS (SELECT doc_id, {_mh_cols} FROM sh)"
SQL["minhash_signatures"] = f"WITH {CORPUS}, {SHINGLES}, {SIG}\nSELECT * FROM sig"

_rpb = N_HASHES // N_BANDS
def _bucket_expr(b: int) -> str:
    acc = "0"
    for r in range(_rpb):
        acc = f"(({acc}) * 1000003 + mh_{b * _rpb + r}) % {P}"
    return acc

BANDS = "bands AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {_bucket_expr(b)} AS bucket FROM sig"
    for b in range(N_BANDS)
) + ")"
SQL["minhash_bands"] = (
    f"WITH {CORPUS}, {SHINGLES}, {SIG}, {BANDS}\n"
    "SELECT doc_id, CAST(band AS INT) AS band, bucket FROM bands"
)

from scidbgeo_spark.operators.dedup import BUCKET_CAP, NGRAM_DF_CAP  # noqa: E402

# 60-bit shingle hashes (NO mod P) — the verify-join currency: Jaccard
# over these equals Jaccard over shingle strings absent a 2^-61 collision,
# and both engines use the identical hashes so they agree bitwise anyway.
HV64 = f"hv64 AS (SELECT doc_id, list_transform(sh, s -> {_MD5INT.format(x='s')}) AS hs FROM sh)"

_JACCARD_TAIL = """
SELECT c.a, c.b,
       len(list_intersect(l.hs, r.hs))
         / (len(l.hs) + len(r.hs) - len(list_intersect(l.hs, r.hs))) AS jaccard
FROM cand c JOIN hv64 l ON l.doc_id = c.a JOIN hv64 r ON r.doc_id = c.b
WHERE len(list_intersect(l.hs, r.hs))
      / (len(l.hs) + len(r.hs) - len(list_intersect(l.hs, r.hs))) >= 0.5"""

SQL["minhash_dup_pairs"] = f"""WITH {CORPUS}, {SHINGLES}, {HV64}, {SIG}, {BANDS},
bands_c AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands_c l JOIN bands_c r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
)
{_JACCARD_TAIL}"""

# dedup.dedup_clusters: connected components over the verified near-dup
# pair graph (cluster = component-min doc_id, singletons included) — the
# same recursive min-propagation shape as SQL["region_label"]
SQL["dedup_clusters"] = f"""WITH RECURSIVE {CORPUS},
pairs AS (SELECT a, b FROM ({SQL["minhash_dup_pairs"]})),
adj AS (SELECT a AS src, b AS dst FROM pairs
        UNION ALL SELECT b, a FROM pairs),
lbl AS (
  SELECT doc_id AS id, doc_id AS cluster FROM corpus
  UNION
  SELECT e.dst AS id, l.cluster
  FROM lbl l JOIN adj e ON e.src = l.id
  WHERE l.cluster < e.dst
)
SELECT id AS doc_id, CAST(min(cluster) AS BIGINT) AS cluster
FROM lbl GROUP BY 1"""

SQL["ngram_jaccard_pairs"] = f"""WITH {CORPUS}, {SHINGLES}, {HV64},
ex AS (SELECT doc_id, unnest(hs) AS s FROM hv64),
rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {NGRAM_DF_CAP}),
exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM exr l JOIN exr r ON l.s = r.s AND l.doc_id < r.doc_id
)
{_JACCARD_TAIL}"""

# dedup.minhash_recall: fraction of the exact ngram-Jaccard baseline's
# pairs the capped MinHash+LSH route recovers — integer counts + one
# exact division (count/count), bitwise across engines
SQL["minhash_recall"] = f"""WITH
exact AS (SELECT a, b FROM ({SQL["ngram_jaccard_pairs"]})),
approx AS (SELECT a, b FROM ({SQL["minhash_dup_pairs"]}))
SELECT count(*) AS n_exact,
       count(ap.a) AS n_recovered,
       count(ap.a) / count(*) AS recall
FROM exact e LEFT JOIN approx ap ON e.a = ap.a AND e.b = ap.b"""

_sim_bits = " + ".join(
    f"(CASE WHEN list_reduce(list_transform(hs, h -> ((h >> {i}) % 2) * 2 - 1), (a, b) -> a + b) > 0 THEN {2**i} ELSE 0 END)"
    for i in range(SIMHASH_BITS)
)
SQL["simhash"] = f"""WITH {CORPUS}, {SHINGLES},
hv AS (SELECT doc_id, list_transform(sh, s -> {_MD5INT.format(x='s')} % {P}) AS hs FROM sh)
SELECT doc_id, CAST({_sim_bits} AS BIGINT) AS simhash FROM hv"""

# SimHash block-banded near-dup pairs: exact algorithm twin (blocks,
# hot-bucket QUALIFY cap, bit_count(xor) verify) — every parameter
# derives from the operator's constants so they cannot desync
from scidbgeo_spark.operators.dedup import (  # noqa: E402
    SIM_BUCKET_CAP,
    SIM_MAX_HAMMING,
    SIMHASH_BLOCKS,
)

_SIM_BBITS = SIMHASH_BITS // SIMHASH_BLOCKS
SQL["simhash_dup_pairs"] = f"""WITH {CORPUS}, {SHINGLES},
hv AS (SELECT doc_id, list_transform(sh, s -> {_MD5INT.format(x='s')} % {P}) AS hs FROM sh),
fp AS (SELECT doc_id, CAST({_sim_bits} AS BIGINT) AS simhash FROM hv),
blocks AS (
  SELECT doc_id, simhash, bb.b AS blk,
         (simhash >> (bb.b * {_SIM_BBITS})) & {(1 << _SIM_BBITS) - 1} AS bv
  FROM fp, (SELECT unnest(generate_series(0, {SIMHASH_BLOCKS - 1})) AS b) bb
),
blocks_c AS (
  SELECT * FROM blocks
  QUALIFY count(*) OVER (PARTITION BY blk, bv) <= {SIM_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS sa, r.simhash AS sb
  FROM blocks_c l JOIN blocks_c r
    ON l.blk = r.blk AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIM_MAX_HAMMING}"""

SQL["ann_bruteforce_topk"] = """WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 8
),
dots AS (
  SELECT q.q_id, e.vec_id,
         sum(CAST(q.qe[s.i] AS DOUBLE) * CAST(e.embedding[s.i] AS DOUBLE)) AS dot,
         sum(CAST(q.qe[s.i] AS DOUBLE) * CAST(q.qe[s.i] AS DOUBLE)) AS nq,
         sum(CAST(e.embedding[s.i] AS DOUBLE) * CAST(e.embedding[s.i] AS DOUBLE)) AS ne
  FROM q, embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) s
  GROUP BY 1, 2
)
SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT q_id, vec_id,
         row_number() OVER (
           PARTITION BY q_id ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, vec_id) AS rn
  FROM dots
) WHERE rn <= 5"""

# Semantic twin: ALL pairs at cosine >= 0.99 over the dup-injected corpus
# (brute force — no fixture snapshot, so an engine miss or an organic
# near-pair at a future scale factor is a real gate failure).
# list_dot_product is bitwise-equal to the streaming per-index SUM
# (verified against sf0.01 data), which round 1 validated against Spark's
# sequential aggregate fold.
_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

# -- exact oracle twins for the approximate ANN paths -------------------------
# The LSH/IVF pipelines are deterministic (hash-derived hyperplanes, data-
# sample centroids), so DuckDB can reproduce buckets, probes, candidates
# and the rerank exactly — approximation does NOT mean rows-only.

from scidbgeo_spark.operators.similarity import (  # noqa: E402
    IVF_CENTROID_MOD,
    IVF_NPROBE,
    N_PLANES,
    N_TABLES,
    _plane,
)


def _plane_lit(j: int) -> str:
    return "[" + ", ".join(repr(v) for v in _plane(j)) + "]::DOUBLE[]"


_EMB_D = "e AS (SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings)"

_lsh_tables = []
for _t in range(N_TABLES):
    _bits = " + ".join(
        f"(CASE WHEN list_dot_product(ee, {_plane_lit(_t * N_PLANES + _j)}) > 0"
        f" THEN {2 ** _j} ELSE 0 END)"
        for _j in range(N_PLANES)
    )
    _lsh_tables.append(f"SELECT vec_id, {_t} AS tbl, {_bits} AS bucket FROM e")

_ANN_RERANK = f"""sims AS (
  SELECT c.q_id, c.vec_id, {_COS.format(a='qe.ee', b='ce.ee')} AS sim
  FROM cand c JOIN e qe ON qe.vec_id = c.q_id JOIN e ce ON ce.vec_id = c.vec_id
)
SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
  FROM sims
) WHERE rn <= 5"""

SQL["ann_lsh_topk"] = f"""WITH {_EMB_D},
bk AS ({' UNION ALL '.join(_lsh_tables)}),
cand AS (
  SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS vec_id
  FROM bk b JOIN bk q ON b.tbl = q.tbl AND b.bucket = q.bucket
  WHERE q.vec_id < 8
),
{_ANN_RERANK}"""

SQL["ann_ivf_topk"] = f"""WITH {_EMB_D},
cent AS (SELECT vec_id AS centroid_id, ee AS ce FROM e WHERE vec_id % {IVF_CENTROID_MOD} = 0),
csim AS (
  SELECT e.vec_id, cent.centroid_id, {_COS.format(a='cent.ce', b='e.ee')} AS csim
  FROM e CROSS JOIN cent
),
lists AS (
  SELECT vec_id, centroid_id FROM csim
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) <= 1
),
probes AS (
  SELECT vec_id AS q_id, centroid_id FROM csim WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) <= {IVF_NPROBE}
),
cand AS (SELECT p.q_id, l.vec_id FROM lists l JOIN probes p USING (centroid_id)),
{_ANN_RERANK}"""

# Recall-vs-bruteforce of the ANN indexes, computed entirely in SQL by
# nesting both pipelines as subqueries (deterministic -> exact check).
def _recall_sql(approx_sql: str) -> str:
    return f"""SELECT bf.q_id, count(*) / 5 AS recall_at_5
FROM ({SQL['ann_bruteforce_topk']}) bf
JOIN ({approx_sql}) ap ON bf.q_id = ap.q_id AND bf.vec_id = ap.vec_id
GROUP BY 1"""


SQL["ann_lsh_recall"] = _recall_sql(SQL["ann_lsh_topk"])
SQL["ann_ivf_recall"] = _recall_sql(SQL["ann_ivf_topk"])

# Exact algorithm twin of similarity.embedding_neardup_pairs: dup-injected
# corpus -> per-table LSH buckets -> hot-bucket QUALIFY cap (mirrors
# EMB_BUCKET_CAP) -> distinct candidates -> cosine>=0.99 verify.  On the
# fixtures the capped output equals brute force (pytest pins that); the
# oracle reproduces the capped pipeline so the check stays exact at any sf.
from scidbgeo_spark.operators.similarity import EMB_BUCKET_CAP  # noqa: E402

_neardup_tables = [t.replace("FROM e", "FROM corpus") for t in _lsh_tables]
SQL["embedding_neardup_pairs"] = f"""WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding::DOUBLE[] AS ee
  FROM embeddings WHERE vec_id % 5 = 0
),
bk AS ({' UNION ALL '.join(_neardup_tables)}),
bkc AS (
  SELECT * FROM bk
  QUALIFY count(*) OVER (PARTITION BY tbl, bucket) <= {EMB_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM bkc l JOIN bkc r
    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id
)
SELECT c.a, c.b
FROM cand c JOIN corpus ca ON ca.vec_id = c.a JOIN corpus cb ON cb.vec_id = c.b
WHERE {_COS.format(a='ca.ee', b='cb.ee')} >= 0.99"""

# Exact oracle for the stub media featurizer: the features are plain byte
# statistics of the html blob, SQL-computable from its hex dump.
SQL["media_features"] = """WITH pages AS (
  SELECT doc_id, encode('<html><body>' || text || '</body></html>') AS b
  FROM documents
),
byt AS (
  SELECT doc_id,
         list_transform(range(1, octet_length(b) + 1),
                        i -> ('0x' || substr(hex(b), 2 * i - 1, 2))::BIGINT) AS bytes
  FROM pages
)
SELECT doc_id,
       CAST(list_sum(bytes) AS DOUBLE) / len(bytes) AS mean_byte,
       CAST(list_max(bytes) AS DOUBLE) AS max_byte,
       CAST(len(bytes) AS DOUBLE) AS n_bytes
FROM byt"""

# Resize stub: block-8 downsample of the blob — integer block sums, one
# exact division for the mean, sequential rolling hash mod 2^31-1 (the
# [0] prepend gives list_reduce the same acc=0 start as the Python loop).
SQL["media_resize"] = """WITH pages AS (
  SELECT doc_id, encode('<html><body>' || text || '</body></html>') AS b
  FROM documents
),
blk AS (
  SELECT doc_id, octet_length(b) // 8 AS n_blocks,
         list_transform(range(0, octet_length(b) // 8),
           j -> list_sum(list_transform(range(1, 9),
                  i -> ('0x' || substr(hex(b), 2 * (j * 8 + i) - 1, 2))::BIGINT))) AS bsums
  FROM pages
)
SELECT doc_id,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CASE WHEN n_blocks > 0
            THEN CAST(list_sum(bsums) AS DOUBLE) / (n_blocks * 8) END AS mean_byte_resized,
       CAST(list_reduce([CAST(0 AS BIGINT)] || bsums,
                        (a, c) -> (a * 1000003 + c) % 2147483647) AS BIGINT) AS blocks_checksum
FROM blk"""

# Frame-sampling stub: every 4th 16-byte frame, one row per sampled frame
# (generate_series(0, -1, 4) is empty, matching the no-frame truncation).
SQL["frame_sample"] = """WITH pages AS (
  SELECT doc_id, encode('<html><body>' || text || '</body></html>') AS b
  FROM documents
),
fr AS (
  SELECT doc_id, b, octet_length(b) // 16 AS n_frames FROM pages
)
SELECT f.doc_id,
       CAST(g.fi AS BIGINT) AS frame_idx,
       CAST(list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 17),
              i -> ('0x' || substr(hex(f.b), 2 * (g.fi * 16 + i) - 1, 2))::BIGINT),
              (a, c) -> (a * 257 + c) % 2147483647) AS BIGINT) AS frame_hash,
       CAST(list_sum(list_transform(range(1, 17),
              i -> ('0x' || substr(hex(f.b), 2 * (g.fi * 16 + i) - 1, 2))::BIGINT)) AS DOUBLE) / 16
         AS frame_mean
FROM fr f, LATERAL (SELECT unnest(generate_series(0, f.n_frames - 1, 4)) AS fi) g"""

# Z-order (Morton) cell id — mirrors operators.pip.zorder_cell_col bitwise
_zx = "CAST(floor((lon + 180.0) / 0.01) AS BIGINT)"
_zy = "CAST(floor((lat + 90.0) / 0.01) AS BIGINT)"
_zbits = " + ".join(
    f"((({_zx} >> {i}) % 2) << {2 * i}) + ((({_zy} >> {i}) % 2) << {2 * i + 1})"
    for i in range(16)
)
SQL["zorder_cell"] = f"WITH {PTS}\nSELECT doc_id, CAST({_zbits} AS BIGINT) AS zcell FROM pts"

SQL["focal_mean_sum_overlap"] = SQL["focal_mean_sum"]

# pip.cell_rollup: quadkey zoom pyramid via GROUPING SETS (res column is
# derived from which grouping column is non-NULL — identical CASE on
# both engines, no grouping_id needed)
SQL["cell_rollup"] = f"""WITH {PTS},
zc AS (SELECT CAST({_zbits} AS BIGINT) AS z16 FROM pts),
zs AS (SELECT z16, z16 >> 16 AS z8, z16 >> 24 AS z4 FROM zc)
SELECT CAST(CASE WHEN z16 IS NOT NULL THEN 16
            WHEN z8 IS NOT NULL THEN 8 ELSE 4 END AS BIGINT) AS res,
       coalesce(z16, z8, z4) AS cell,
       CAST(count(*) AS BIGINT) AS n_points
FROM zs GROUP BY GROUPING SETS ((z16), (z8), (z4))"""

# Z-order range semantics: the engine filters ONE contiguous zcell range;
# the oracle counts the equivalent lon/lat box directly (independent
# derivation — verifies range == box, not just that both sides share code)
SQL["zorder_range_count"] = f"""WITH {PTS}
SELECT CAST(count(*) AS BIGINT) AS n_points FROM pts
WHERE floor((lon + 180.0) / 0.01) >= 16384 AND floor((lon + 180.0) / 0.01) < 20480
  AND floor((lat + 90.0) / 0.01) >= 8192  AND floor((lat + 90.0) / 0.01) < 12288"""

SQL["sessionize"] = """WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3600
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM marked GROUP BY user_id"""

SQL["top_events_per_user"] = """SELECT user_id, event_id, CAST(rank AS INT) AS rank FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
  FROM events
) WHERE rank <= 3"""

SQL["corpus_curation"] = f"""WITH {CORPUS},
keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
neardrop AS (SELECT doc_id FROM ({SQL["dedup_clusters"]}) WHERE doc_id <> cluster),
kept AS (
  SELECT c.doc_id, c.text, d.lang
  FROM corpus c JOIN keep k ON c.doc_id = k.doc_id
  LEFT JOIN documents d ON d.doc_id = c.doc_id
  WHERE c.doc_id NOT IN (SELECT doc_id FROM neardrop)
)
SELECT coalesce(lang, 'unk') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM kept
WHERE len(string_split(text, ' ')) >= 10
  AND len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) >= 0.3
GROUP BY 1"""

SQL["events_cube"] = """SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY CUBE (event_type, date_trunc('hour', ts))"""


# ---------------------------------------------------------------------------
# curation operators (operators/curation.py) — constants are imported so
# both engines share one definition.
from scidbgeo_spark.operators.curation import (  # noqa: E402
    CONTAM_K,
    EMAIL_RE,
    EVAL_MOD,
    EVAL_REM,
    PACK_BUDGET,
    PACK_SHARDS,
    PHONE_RE,
    RATE_DEFAULT,
    SAMPLE_RATES,
    SAMPLE_SEED,
)


def _kshingles(src: str, k: int) -> str:
    """Parameterized twin of operators.dedup.shingles_col(k): distinct
    k-word shingles (short docs yield their whole token list once)."""
    return f"""(
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {k} + 1, 1) + 1),
           i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}))"""


SQL["contamination_check"] = f"""WITH {CORPUS},
eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
corp AS (SELECT doc_id, text FROM corpus
         WHERE NOT (doc_id % {EVAL_MOD} = {EVAL_REM} AND doc_id < 100000)),
eng AS (SELECT DISTINCT unnest(list_transform(sh, s -> {_MD5INT.format(x='s')})) AS h
        FROM {_kshingles('eval_docs', CONTAM_K)}),
cng AS (SELECT doc_id, unnest(list_transform(sh, s -> {_MD5INT.format(x='s')})) AS h
        FROM {_kshingles('corp', CONTAM_K)})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM cng JOIN eng USING (h)
GROUP BY doc_id"""

# deterministic PII-bearing corpus: the same construction lives in
# __spark_entry__.q_pii_redact (docs %3==0 gain an email + phone, docs
# %5==1 gain a second email).
_PII_TEXT = """
pii AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' Contact user' || doc_id || '@mail.example or call +1-555-'
                      || (1000 + doc_id % 9000)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 1
                 THEN ' alt' || doc_id || '@example.org'
                 ELSE '' END AS text
  FROM documents
)"""

SQL["pii_redact"] = f"""WITH {_PII_TEXT}
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM pii"""

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {r}" for lg, r in sorted(SAMPLE_RATES.items()))
    + f" ELSE {RATE_DEFAULT} END"
)

SQL["stratified_sample"] = f"""SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
FROM documents
WHERE ({_MD5INT.format(x=f"'{SAMPLE_SEED}:' || doc_id")}) % 1000 < {_RATE_CASE}"""

SQL["pack_sequences"] = f"""WITH t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), c AS (
  SELECT shard, doc_id, n_toks,
         sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT shard, CAST(floor((cum - n_toks) / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY shard, chunk_id"""

# end-to-end freeze: benchmark removal -> exact dedup -> decontamination
# -> seeded stratified sample -> sequence packing (one exact pipeline,
# mirrors __spark_entry__.q_corpus_freeze stage for stage).
SQL["corpus_freeze"] = f"""WITH {CORPUS},
eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
corp AS (SELECT doc_id, text FROM corpus
         WHERE NOT (doc_id % {EVAL_MOD} = {EVAL_REM} AND doc_id < 100000)),
keep AS (SELECT min(doc_id) AS doc_id FROM corp GROUP BY md5(text)),
eng AS (SELECT DISTINCT unnest(list_transform(sh, s -> {_MD5INT.format(x='s')})) AS h
        FROM {_kshingles('eval_docs', CONTAM_K)}),
cng AS (SELECT doc_id, unnest(list_transform(sh, s -> {_MD5INT.format(x='s')})) AS h
        FROM {_kshingles('corp', CONTAM_K)}),
contam AS (SELECT DISTINCT doc_id FROM cng JOIN eng USING (h)),
kept AS (
  SELECT c.doc_id, c.text, coalesce(d.lang, 'unk') AS lang
  FROM corp c JOIN keep k ON c.doc_id = k.doc_id
  LEFT JOIN documents d ON d.doc_id = c.doc_id
  WHERE c.doc_id NOT IN (SELECT doc_id FROM contam)
),
samp AS (
  SELECT doc_id, text FROM kept
  WHERE ({_MD5INT.format(x=f"'{SAMPLE_SEED}:' || doc_id")}) % 1000 < {_RATE_CASE}
),
t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM samp
),
c AS (
  SELECT shard, doc_id, n_toks,
         sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT shard, CAST(floor((cum - n_toks) / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY shard, chunk_id"""

# crawl-freshness url dedup: arg_max pins max_by semantics engine-to-
# engine; timestamps are tie-free by construction (9973 coprime with
# 31536000).
SQL["url_dedup_latest"] = """WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
         WHEN 2 THEN 'HTTPS://www.' ELSE 'https://www.' END
    || 'site' || CAST((doc_id // 2) % 7 AS VARCHAR)
    || '.example/p/' || CAST(doc_id // 2 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END AS url,
    1735689600 + (doc_id * 9973) % 31536000 AS warc_ts
  FROM documents)
SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         lower(url), '^https?://', ''), '^www\\.', ''), '#.*$', ''),
         '/$', '') AS url_norm,
       CAST(arg_max(doc_id, warc_ts) AS BIGINT) AS keep_id,
       CAST(max(warc_ts) AS BIGINT) AS latest_ts,
       CAST(count(*) AS BIGINT) AS n_captures
FROM u GROUP BY 1"""


# exact-substring (duplicated n-gram span) dedup — positional twin of
# operators/dedup.dup_span_dedup over the planted-dup corpus.
from scidbgeo_spark.operators.dedup import DUPSPAN_N  # noqa: E402

SQL["dup_span_dedup"] = f"""WITH {CORPUS},
t AS (SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS nt FROM corpus),
g AS (SELECT doc_id, s,
             {_MD5INT.format(x=f"array_to_string(toks[s:s+{DUPSPAN_N - 1}], ' ')")} AS h
      FROM t, LATERAL (SELECT unnest(generate_series(1, nt - {DUPSPAN_N} + 1)) AS s) u
      WHERE nt >= {DUPSPAN_N}),
d AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
hits AS (SELECT doc_id, s FROM g JOIN d USING (h)),
cov AS (SELECT DISTINCT doc_id, p
        FROM hits, LATERAL (SELECT unnest(generate_series(s, s + {DUPSPAN_N - 1})) AS p) v),
tok AS (SELECT doc_id, p, toks[p] AS tok
        FROM t, LATERAL (SELECT unnest(generate_series(1, nt)) AS p) w),
keptt AS (SELECT k.doc_id, k.p, k.tok
          FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.p = c.p
          WHERE c.p IS NULL),
reb AS (SELECT doc_id, md5(array_to_string(list(tok ORDER BY p), ' ')) AS kept_fp
        FROM keptt GROUP BY doc_id),
sg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ndg FROM hits GROUP BY doc_id),
sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ncov FROM cov GROUP BY doc_id)
SELECT t.doc_id, CAST(nt AS INT) AS n_tokens,
       coalesce(ndg, 0) AS n_dup_grams,
       coalesce(ncov, 0) AS n_covered,
       CASE WHEN nt > 0 THEN coalesce(ncov, 0) / nt END AS frac_covered,
       coalesce(kept_fp, md5('')) AS kept_fp
FROM t LEFT JOIN sg USING (doc_id) LEFT JOIN sc USING (doc_id)
       LEFT JOIN reb USING (doc_id)"""


# token-budget sampling — sharded greedy selection, constants shared with
# operators/curation.token_budget_sample.
from scidbgeo_spark.operators.curation import (  # noqa: E402
    TB_SEED,
    TB_SHARDS,
    TB_SHARD_BUDGET,
)

SQL["token_budget_sample"] = f"""WITH t AS (
  SELECT doc_id, lang,
         {_MD5INT.format(x=f"'{TB_SEED}:' || doc_id")} AS pri,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, lang, pri % {TB_SHARDS} AS shard, n_toks,
         CAST(sum(n_toks) OVER (PARTITION BY lang, pri % {TB_SHARDS}
                                ORDER BY pri, doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, lang, shard, n_toks, cum
FROM c WHERE cum <= {TB_SHARD_BUDGET}"""


# domain mixture weights — identical float expression text on both sides
# (BIGINT/BIGINT divides as DOUBLE in DuckDB, matching Spark long/long).
SQL["domain_mix_weights"] = """WITH agg AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_domains
  FROM agg
)
SELECT lang, source, n_docs, n_tokens,
       n_tokens / tot AS token_share,
       CASE WHEN n_tokens > 0
            THEN (CAST(1.0 AS DOUBLE) / n_domains) / (n_tokens / tot) END
         AS mix_weight
FROM agg, tot"""


# ---- incremental dedup + bloom prefilter (crawl_batch twin) -------------
from scidbgeo_spark.operators.dedup import (  # noqa: E402
    BLOOM_BITS_PER_WORD,
    BLOOM_K,
    BLOOM_M,
)

BATCH = """
batch AS (
  SELECT doc_id + 100000 AS doc_id, 'mutated ' || text AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, 'fresh ' || text AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 400000 AS doc_id, 'fresh ' || text AS text
  FROM documents WHERE doc_id % 10 = 0
)"""

SQL["dedup_incremental"] = f"""WITH {BATCH}
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_batch_copies
FROM (SELECT doc_id, md5(text) AS h FROM batch) b
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = b.h)
GROUP BY h"""

# Bloom bitmap: identical nonnegative integer arithmetic on both engines
# (63 usable bits per word — DuckDB's BIGINT << throws on shift 63).
_BLOOM_H = (
    f"SELECT doc_id, h64 % {BLOOM_M} AS h1, "
    f"(((h64 >> 16) % {BLOOM_M}) | 1) AS h2 "
    f"FROM (SELECT doc_id, {_MD5INT.format(x='text')} AS h64 FROM {{src}})"
)
_BLOOM_I = f"(SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i)"

SQL["bloom_prefilter"] = f"""WITH {BATCH},
fpos AS (
  SELECT ((h1 + i * h2) % {BLOOM_M}) AS pos
  FROM ({_BLOOM_H.format(src='documents')}) f, {_BLOOM_I}
),
bitmap AS (
  SELECT pos // {BLOOM_BITS_PER_WORD} AS word,
         bit_or(1::BIGINT << (pos % {BLOOM_BITS_PER_WORD})::INT) AS bits
  FROM fpos GROUP BY 1
),
bprobe AS (
  SELECT doc_id, ((h1 + i * h2) % {BLOOM_M}) AS pos
  FROM ({_BLOOM_H.format(src='batch')}) b, {_BLOOM_I}
),
maybe AS (
  SELECT doc_id,
         bool_and((coalesce(bits, 0)
                   & (1::BIGINT << (pos % {BLOOM_BITS_PER_WORD})::INT)) <> 0)
           AS maybe_seen
  FROM (SELECT doc_id, pos // {BLOOM_BITS_PER_WORD} AS word, pos FROM bprobe) p
  LEFT JOIN bitmap USING (word)
  GROUP BY doc_id
)
SELECT m.doc_id, maybe_seen,
       EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = md5(b.text)) AS seen
FROM maybe m JOIN batch b USING (doc_id)"""


# ---- k-means (two deterministic Lloyd rounds) + HLL sketch --------------
from scidbgeo_spark.operators.similarity import (  # noqa: E402
    DIM as _KM_DIM,
    KMEANS_K,
    KMEANS_SCALE,
)
from scidbgeo_spark.operators.dedup import (  # noqa: E402
    HLL_ALPHA_EXPR,
    HLL_M,
    HLL_P,
)

SQL["kmeans_assign"] = f"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {KMEANS_SCALE})::BIGINT) AS sv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, sv AS cv FROM e WHERE vec_id < {KMEANS_K}),
d1 AS (
  SELECT vec_id, cid,
         list_reduce(list_transform(range(1, {_KM_DIM + 1}),
                                    i -> (sv[i] - cv[i]) * (sv[i] - cv[i])),
                     (a, b) -> a + b) AS dist
  FROM e CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid AS cluster FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
s1 AS (
  SELECT cluster, i AS dim, CAST(sum(sv[i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM e JOIN a1 USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, {_KM_DIM})) AS i)
  GROUP BY cluster, i
),
c1 AS (
  SELECT cluster AS cid, list(s::DOUBLE / n::DOUBLE ORDER BY dim) AS cv
  FROM s1 GROUP BY cluster
),
d2 AS (
  SELECT vec_id, cid,
         list_reduce(list_transform(range(1, {_KM_DIM + 1}),
                                    i -> (sv[i]::DOUBLE - cv[i]) * (sv[i]::DOUBLE - cv[i])),
                     (a, b) -> a + b) AS dist
  FROM e CROSS JOIN c1
)
SELECT vec_id, cid AS cluster FROM d2
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1"""

_HLL_RANK_BITS = 60 - HLL_P  # 50 hashed bits above the register index
SQL["hll_shingle_ndv"] = f"""WITH {CORPUS}, {SHINGLES},
vals AS (SELECT unnest(sh) AS v FROM sh),
hr AS (
  SELECT h % {HLL_M} AS reg,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_RANK_BITS + 1}
              ELSE {_HLL_RANK_BITS + 1} - length(bin(h >> {HLL_P})) END AS rank
  FROM (SELECT {_MD5INT.format(x='v')} AS h FROM vals)
),
regs AS (SELECT reg, max(rank) AS r FROM hr GROUP BY reg),
packed AS (
  SELECT list(r ORDER BY reg) AS rr, CAST(count(*) AS BIGINT) AS n_hit FROM regs
),
zt AS (
  SELECT n_hit,
         (list_reduce(list_transform(rr, r -> (1::BIGINT << ({_HLL_RANK_BITS + 1} - r)::INT)),
                      (a, b) -> a + b)
          + ({HLL_M} - n_hit) * (1::BIGINT << {_HLL_RANK_BITS + 1}))
         / (1::BIGINT << {_HLL_RANK_BITS + 1}) AS z
  FROM packed
)
SELECT n_hit AS n_registers_hit,
       ({HLL_ALPHA_EXPR}) * {HLL_M} * {HLL_M} / z AS hll_estimate,
       (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM vals) AS true_ndv
FROM zt"""


# ---- count-min sketch heavy hitters -------------------------------------
from scidbgeo_spark.operators.text import (  # noqa: E402
    CMS_A,
    CMS_B,
    CMS_D,
    CMS_W,
    FP_MOD as _CMS_P,
)

_CMS_CELLS = " UNION ALL ".join(
    f"SELECT token, {j} AS row, "
    f"(((hp * {CMS_A[j]} + {CMS_B[j]}) % {_CMS_P}) % {CMS_W}) AS col FROM toks"
    for j in range(CMS_D)
)

SQL["cms_heavy_hitters"] = f"""WITH toks AS (
  SELECT token, {_MD5INT.format(x='token')} % {_CMS_P} AS hp
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
),
allcells AS ({_CMS_CELLS}),
cells AS (
  SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
  FROM allcells GROUP BY row, col
),
top AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_count
  FROM toks GROUP BY token
  ORDER BY true_count DESC, token ASC LIMIT 10
),
probes AS (
  SELECT t.token, t.true_count, a.row, a.col
  FROM top t JOIN (SELECT DISTINCT token, row, col FROM allcells) a
    ON a.token = t.token
)
SELECT p.token, p.true_count, min(c.cnt) AS cms_estimate
FROM probes p JOIN cells c USING (row, col)
GROUP BY p.token, p.true_count"""


# ---- host-graph PageRank (3 unrolled integer iterations) ----------------
from scidbgeo_spark.operators.graph import (  # noqa: E402
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_DAMP_NUM_BASE,
    PR_ITERS,
    PR_SCALE,
)


def _pr_iter(prev: str, new: str) -> str:
    return f"""c_{new} AS (
  SELECT e.dst AS node,
         CAST(sum((((r.rank * {PR_DAMP_NUM}) // {PR_DAMP_DEN}) * e.w) // o.tw)
              AS BIGINT) AS c
  FROM edges e JOIN outw o USING (src) JOIN r_{prev} r ON r.node = e.src
  GROUP BY e.dst
),
r_{new} AS (
  SELECT n.node,
         ({PR_SCALE} * {PR_DAMP_NUM_BASE}) // ({PR_DAMP_DEN} * nn.nn)
           + coalesce(c.c, 0) AS rank
  FROM nodes n CROSS JOIN nn LEFT JOIN c_{new} c ON c.node = n.node
)"""


_PR_ITER_CTES = ",\n".join(_pr_iter(str(i), str(i + 1)) for i in range(PR_ITERS))

SQL["host_pagerank"] = f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
),
edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  )
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
r_0 AS (SELECT node, {PR_SCALE} // nn.nn AS rank FROM nodes CROSS JOIN nn),
{_PR_ITER_CTES}
SELECT node AS source, CAST(rank AS BIGINT) AS rank_scaled FROM r_{PR_ITERS}"""


# ---- inverted index -----------------------------------------------------
from scidbgeo_spark.operators.text import (  # noqa: E402
    IDX_MIN_DF,
    IDX_POSTING_CAP,
)

SQL["inverted_index"] = f"""WITH tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term, doc_id
),
ranked AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM tf
)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       array_to_string(list(doc_id ORDER BY doc_id) FILTER (WHERE rn <= {IDX_POSTING_CAP}), ',')
         AS postings_head
FROM ranked
GROUP BY term
HAVING count(*) >= {IDX_MIN_DF}"""


# ---- WARC ingest round-trips --------------------------------------------
SQL["warc_ingest"] = "SELECT doc_id, text FROM documents"
SQL["warc_ingest_gz"] = "SELECT doc_id, text FROM documents"


# ---- URL filter (same variant construction as url_dedup; same rule
# constants as curation.url_filter) ---------------------------------------
from scidbgeo_spark.operators.curation import (  # noqa: E402
    URL_BLOCKED_HOSTS,
    URL_BLOCKED_KEYWORDS,
    URL_MAX_LEN,
    U_BLOCK_DOMAIN,
    U_KEYWORD,
    U_SCHEME,
    U_TOO_LONG,
)

_UF_HOSTS = ", ".join(f"'{h}'" for h in URL_BLOCKED_HOSTS)
_UF_KW = " OR ".join(f"contains(u, '{k}')" for k in URL_BLOCKED_KEYWORDS)

SQL["url_filter"] = f"""WITH u AS (
  SELECT doc_id,
    lower(CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
         WHEN 2 THEN 'HTTPS://www.' ELSE 'https://www.' END
    || 'site' || CAST((doc_id // 2) % 7 AS VARCHAR)
    || '.example/p/' || CAST(doc_id // 2 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) AS u
  FROM documents),
m AS (
  SELECT doc_id,
    regexp_extract(u, '^(?:[a-z+]+://)?(?:www\\.)?([^/]+)', 1) AS url_host,
    CAST(CASE WHEN regexp_extract(u, '^(?:[a-z+]+://)?(?:www\\.)?([^/]+)', 1)
                   IN ({_UF_HOSTS}) THEN {U_BLOCK_DOMAIN} ELSE 0 END
       + CASE WHEN {_UF_KW} THEN {U_KEYWORD} ELSE 0 END
       + CASE WHEN NOT regexp_matches(u, '^https?://') THEN {U_SCHEME} ELSE 0 END
       + CASE WHEN length(u) > {URL_MAX_LEN} THEN {U_TOO_LONG} ELSE 0 END
      AS INTEGER) AS reason_mask
  FROM u)
SELECT doc_id, url_host, reason_mask = 0 AS keep, reason_mask FROM m"""


SQL["jsonl_ingest"] = "SELECT doc_id, text, lang, source, n_chars FROM documents"


# ---- SQ8 scalar-quantized ANN -------------------------------------------
from scidbgeo_spark.operators.similarity import SQ8_LEVELS  # noqa: E402

_SQ8_QV = f"""s AS (
  SELECT i.i AS dim, CAST(min(embedding[i.i]::DOUBLE) AS DOUBLE) AS mn,
         CAST(max(embedding[i.i]::DOUBLE) AS DOUBLE) AS mx
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
  GROUP BY i.i
),
packed AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM s),
qv AS (
  SELECT vec_id,
         list_transform(range(1, 65), i ->
           CASE WHEN (maxs[i] - mins[i]) > 0
                THEN least(greatest(
                       floor((embedding[i]::DOUBLE - mins[i]) * {SQ8_LEVELS}
                             / (maxs[i] - mins[i]))::BIGINT, 0), {SQ8_LEVELS})
                ELSE 0 END) AS q
  FROM embeddings CROSS JOIN packed
)"""

SQL["ann_sq8_topk"] = f"""WITH {_SQ8_QV},
qq AS (SELECT vec_id AS q_id, q AS qvec FROM qv WHERE vec_id < 8),
dists AS (
  SELECT qq.q_id, e.vec_id,
         list_reduce(list_transform(range(1, 65),
                                    i -> (e.q[i] - qq.qvec[i]) * (e.q[i] - qq.qvec[i])),
                     (a, b) -> a + b) AS dist
  FROM qv e CROSS JOIN qq
)
SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rn
  FROM dists
) WHERE rn <= 5"""

SQL["ann_sq8_recall"] = _recall_sql(SQL["ann_sq8_topk"])


# end-to-end rolling refresh: URL gate -> quality gate -> incremental
# dedup vs frozen -> packing (mirrors __spark_entry__.q_crawl_refresh
# stage for stage; shares every constant with the single-stage oracles).
SQL["crawl_refresh"] = f"""WITH {BATCH},
u AS (
  SELECT doc_id,
    lower(CASE doc_id % 4 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://'
         WHEN 2 THEN 'HTTPS://www.' ELSE 'https://www.' END
    || 'site' || CAST((doc_id // 2) % 7 AS VARCHAR)
    || '.example/p/' || CAST(doc_id // 2 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) AS u
  FROM batch),
ug AS (
  SELECT doc_id FROM u
  WHERE CASE WHEN regexp_extract(u, '^(?:[a-z+]+://)?(?:www\\.)?([^/]+)', 1)
                  IN ({_UF_HOSTS}) THEN {U_BLOCK_DOMAIN} ELSE 0 END
      + CASE WHEN {_UF_KW} THEN {U_KEYWORD} ELSE 0 END
      + CASE WHEN NOT regexp_matches(u, '^https?://') THEN {U_SCHEME} ELSE 0 END
      + CASE WHEN length(u) > {URL_MAX_LEN} THEN {U_TOO_LONG} ELSE 0 END = 0
),
qg AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) AS BIGINT) / len(string_split(text, ' ')) AS cpt,
           (CAST(length(text) AS BIGINT)
              - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
             / CAST(length(text) AS BIGINT) AS punct,
           len(list_distinct(string_split(text, ' ')))
             / len(string_split(text, ' ')) AS lex
    FROM batch)
  WHERE NOT (n_tokens < 30) AND NOT (cpt < 3.0 OR cpt > 12.0)
    AND NOT (punct > 0.2) AND NOT (lex < 0.35)
),
gated AS (
  SELECT b.doc_id, b.text FROM batch b
  JOIN ug USING (doc_id) JOIN qg USING (doc_id)
),
inc AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(text) AS h FROM gated) g
  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = g.h)
  GROUP BY h
),
kept AS (SELECT g.doc_id, g.text FROM gated g JOIN inc USING (doc_id)),
t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM kept
),
c AS (
  SELECT shard, doc_id, n_toks,
         sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT shard, CAST(floor((cum - n_toks) / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY shard, chunk_id"""


# ---- funnel (stage CTE chain mirrors temporal.funnel) -------------------
from scidbgeo_spark.operators.temporal import FUNNEL_STAGES  # noqa: E402

_FN_CTES = [
    f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
    f"WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id)"
]
for _i, _st in enumerate(FUNNEL_STAGES[1:], start=1):
    _FN_CTES.append(
        f"s{_i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        f"JOIN s{_i - 1} p USING (user_id) "
        f"WHERE e.event_type = '{_st}' AND e.ts > p.t GROUP BY e.user_id)"
    )
_FN_SEL = " UNION ALL ".join(
    f"SELECT CAST({i} AS INT) AS stage_idx, '{st}' AS stage, "
    f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
    for i, st in enumerate(FUNNEL_STAGES)
)
SQL["funnel"] = "WITH " + ",\n".join(_FN_CTES) + "\n" + _FN_SEL


SQL["props_rollup"] = """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY event_type"""


SQL["retention_cohorts"] = """WITH su AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
ac AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
j AS (
  SELECT s.cohort, a.wk, a.user_id
  FROM ac a JOIN su s USING (user_id) WHERE a.wk >= s.cohort
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort, wk) // 7 AS INT) AS weeks_since,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM j GROUP BY 1, 2"""


# text.lm_quality_score: integer counts + two single exact divisions ->
# bitwise; tokens hash through the shared 60-bit md5 twin so both
# engines count the same keys.
from scidbgeo_spark.operators.text import LM_RARE_MAX  # noqa: E402

SQL["lm_quality_score"] = f"""WITH
tok AS (SELECT doc_id, {_MD5INT.format(x='t')} AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM documents)),
freq AS (SELECT h, count(*) AS cnt FROM tok GROUP BY h),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(cnt) AS BIGINT) AS sum_freq,
               CAST(sum((cnt <= {LM_RARE_MAX})::INT) AS BIGINT) AS n_rare
        FROM tok JOIN freq USING (h) GROUP BY doc_id)
SELECT doc_id, n_toks, sum_freq,
       CAST(sum_freq AS DOUBLE) / n_toks AS mean_freq,
       CAST(n_rare AS DOUBLE) / n_toks AS rare_frac
FROM per"""


# text.boilerplate_spans over text.boiler_corpus: positional twin of the
# dup_span oracle, scoped per source with a distinct-doc threshold.
from scidbgeo_spark.operators.text import BOILER_MIN_DOCS, BOILER_N  # noqa: E402

SQL["boilerplate_spans"] = f"""WITH
bcorp AS (SELECT doc_id, source,
  CASE WHEN doc_id % 3 < 2
       THEN 'copyright ' || source ||
            ' all rights reserved terms of service apply ' || text
       ELSE text END AS text
  FROM documents),
t AS (SELECT doc_id, source, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS nt FROM bcorp),
g AS (SELECT doc_id, source, s,
             {_MD5INT.format(x=f"array_to_string(toks[s:s+{BOILER_N - 1}], ' ')")} AS h
      FROM t, LATERAL (SELECT unnest(generate_series(1, nt - {BOILER_N} + 1)) AS s) u
      WHERE nt >= {BOILER_N}),
b AS (SELECT source, h FROM g GROUP BY source, h
      HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}),
hits AS (SELECT doc_id, s FROM g JOIN b USING (source, h)),
cov AS (SELECT DISTINCT doc_id, p
        FROM hits, LATERAL (SELECT unnest(generate_series(s, s + {BOILER_N - 1})) AS p) v),
tok AS (SELECT doc_id, p, toks[p] AS tok
        FROM t, LATERAL (SELECT unnest(generate_series(1, nt)) AS p) w),
keptt AS (SELECT k.doc_id, k.p, k.tok
          FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.p = c.p
          WHERE c.p IS NULL),
reb AS (SELECT doc_id, md5(array_to_string(list(tok ORDER BY p), ' ')) AS clean_fp
        FROM keptt GROUP BY doc_id),
sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ncov FROM cov GROUP BY doc_id)
SELECT t.doc_id, t.source, CAST(nt AS BIGINT) AS n_tokens,
       coalesce(ncov, 0) AS n_boiler,
       CASE WHEN nt > 0 THEN coalesce(ncov, 0) / nt END AS frac_boiler,
       coalesce(clean_fp, md5('')) AS clean_fp
FROM t LEFT JOIN sc USING (doc_id) LEFT JOIN reb USING (doc_id)"""


# zonal.zonal_stats_time: per-(zone, band) stats over the 3-D raster.
# Zone arithmetic mirrors RECT_ZONE at the 3-D dims (w3 = RASTER3_W,
# h3 = n / (BANDS * RASTER3_W)); the x ragged edge also falls to the
# nodata zone when ZONE_W does not tile RASTER3_W.
from scidbgeo_spark.model import BANDS as _BANDS3  # noqa: E402
from scidbgeo_spark.model import RASTER3_W as _W3  # noqa: E402

_H3 = f"((SELECT count(*) FROM events) // {_BANDS3 * _W3})"
_NZX3 = _W3 // ZONE_W
_RECT_ZONE3 = f"""CASE
  WHEN y >= ({_H3} // {ZONE_H}) * {ZONE_H} OR x >= {_NZX3 * ZONE_W}
  THEN -999
  ELSE (y // {ZONE_H}) * {_NZX3} + (x // {ZONE_W}) END"""

SQL["zonal_stats_time"] = f"""WITH {COO3}
SELECT CAST({_RECT_ZONE3} AS BIGINT) AS id, CAST(band AS INT) AS band,
       min(value) AS min_value,
       max(value) AS max_value,
       avg(value) AS avg_value,
       CAST(count(value) AS BIGINT) AS count_value
FROM coo3 GROUP BY 1, 2"""


# pip anti-join: points outside every polygon of the layer
SQL["pip_unmatched"] = f"""WITH {PTS}
SELECT doc_id, lon, lat FROM (
  SELECT doc_id, lon, lat, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NULL"""


# dedup.crawl_delta over the deterministic snapshot synth: full-outer
# join on the canonical url + CASE status.
SQL["crawl_delta"] = """WITH
old AS (SELECT doc_id AS old_id,
               'site.example/p/' || CAST(doc_id AS VARCHAR) AS url_norm,
               md5(text) AS old_fp
        FROM documents),
new AS (
  SELECT doc_id AS new_id,
         'site.example/p/' || CAST(doc_id AS VARCHAR) AS url_norm,
         md5(CASE WHEN doc_id % 3 = 0 THEN 'edited ' || text ELSE text END) AS new_fp
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT doc_id + 500000 AS new_id,
         'site.example/new/' || CAST(doc_id AS VARCHAR) AS url_norm,
         md5(text) AS new_fp
  FROM documents WHERE doc_id % 5 = 0
)
SELECT coalesce(old.url_norm, new.url_norm) AS url_norm,
       CASE WHEN old_id IS NULL THEN 'added'
            WHEN new_id IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       coalesce(old_id, -1) AS old_id, coalesce(new_id, -1) AS new_id
FROM old FULL OUTER JOIN new USING (url_norm)"""


# regions.zone_geometry: per-ring shoelace area / centroid / bbox over
# the SAME fixture layer, as literal ring rows.  All coordinates are
# integer-valued doubles, so every product/sum is exact and the sums
# are order-independent; centroid is one exact division.
from scidbgeo_spark import fixtures as _fx  # noqa: E402


def _geom_values() -> str:
    layer = [(z, [r], False) for z, r in _fx.GEO_POLYGONS] + [
        (z, rs, m) for z, rs, m in _fx.GEO_POLYGONS_HOLED
    ]
    rows = []
    for z, rs, _m in layer:
        for rn, r in enumerate(rs):
            xs = ", ".join(repr(float(v)) for v in r[:, 0])
            ys = ", ".join(repr(float(v)) for v in r[:, 1])
            rows.append(f"({z}, {rn}, [{xs}], [{ys}])")
    return ",\n  ".join(rows)


SQL["zone_geometry"] = f"""WITH
rings(zone_id, ring_no, xs, ys) AS (VALUES
  {_geom_values()}),
t AS (SELECT zone_id, ring_no, len(xs) AS n, xs, ys FROM rings),
tm AS (SELECT zone_id, ring_no,
         xs[i] * ys[(i % n) + 1] - xs[(i % n) + 1] * ys[i] AS cr,
         xs[i] + xs[(i % n) + 1] AS xsum,
         ys[i] + ys[(i % n) + 1] AS ysum
       FROM t, LATERAL (SELECT unnest(generate_series(1, n)) AS i) u),
ag AS (SELECT zone_id, ring_no, sum(cr) AS s2,
              sum(xsum * cr) AS sx, sum(ysum * cr) AS sy
       FROM tm GROUP BY 1, 2)
SELECT CAST(t.zone_id AS INT) AS zone_id, CAST(t.ring_no AS INT) AS ring_no,
       CAST(t.n AS BIGINT) AS n_vertices,
       abs(s2) / 2 AS area,
       CASE WHEN s2 <> 0 THEN sx / (3 * s2) END AS cx,
       CASE WHEN s2 <> 0 THEN sy / (3 * s2) END AS cy,
       list_min(xs) AS min_x, list_max(xs) AS max_x,
       list_min(ys) AS min_y, list_max(ys) AS max_y
FROM t JOIN ag USING (zone_id, ring_no)"""


# knn.knn_classify: brute-force 10-NN + majority lang per query point
SQL["knn_classify"] = f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 25
),
nn AS (SELECT q_id, doc_id FROM (
  SELECT q.q_id, p.doc_id,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY (p.lon - q.qlon) * (p.lon - q.qlon)
                  + (p.lat - q.qlat) * (p.lat - q.qlat),
                    p.doc_id
         ) AS rank
  FROM q CROSS JOIN pts p
) WHERE rank <= 10),
v AS (SELECT q_id, lang AS label, CAST(count(*) AS BIGINT) AS votes
      FROM nn JOIN documents USING (doc_id) GROUP BY 1, 2)
SELECT q_id, label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY votes DESC, label) AS rn
  FROM v
) WHERE rn = 1"""


# curation.quality_deciles: integer score key + value-based deciles
from scidbgeo_spark.operators.curation import QD_SCALE  # noqa: E402

SQL["quality_deciles"] = f"""WITH
tok AS (SELECT doc_id, {_MD5INT.format(x='t')} AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM documents)),
freq AS (SELECT h, count(*) AS cnt FROM tok GROUP BY h),
per AS (SELECT doc_id, count(*) AS n_toks, sum(cnt) AS sum_freq
        FROM tok JOIN freq USING (h) GROUP BY doc_id),
s AS (SELECT doc_id,
           (sum_freq // n_toks) * {QD_SCALE}
           + ((sum_freq % n_toks) * {QD_SCALE}) // n_toks AS score_key FROM per),
pk AS (SELECT score_key, count(*) AS n FROM s GROUP BY 1),
c AS (SELECT score_key,
             coalesce(sum(n) OVER (ORDER BY score_key
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum_below
      FROM pk),
nt AS (SELECT count(*) AS n_total FROM documents)
SELECT doc_id, CAST(score_key AS BIGINT) AS score_key,
       CAST((10 * cum_below) // n_total AS INT) AS decile
FROM s JOIN c USING (score_key) CROSS JOIN nt"""


# pixel.raster_pyramid: per-level true base-block means
SQL["raster_pyramid"] = f"""WITH {COO}
SELECT CAST(1 AS INT) AS level, y // 2 AS y, x // 2 AS x,
       avg(value) AS value_avg FROM coo GROUP BY 2, 3
UNION ALL
SELECT CAST(2 AS INT), y // 4, x // 4, avg(value) FROM coo GROUP BY 2, 3
UNION ALL
SELECT CAST(3 AS INT), y // 8, x // 8, avg(value) FROM coo GROUP BY 2, 3"""


# focal.focal_mean_time: per-band spatial 3x3 shrinking-window mean
SQL["focal_mean_time"] = f"""WITH {COO3},
nb AS (
  SELECT a.band, a.y AS y, a.x AS x,
         CAST(sum(b.value) AS BIGINT) AS s, count(*) AS c
  FROM coo3 a JOIN coo3 b
    ON b.band = a.band
   AND b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
  GROUP BY 1, 2, 3
)
SELECT CAST(band AS INT) AS band, y, x,
       CAST(s AS DOUBLE) / c AS value_avg FROM nb"""


# zonal_stats_shp: binary shapefile round-trip + DISTRIBUTED rasterize
# must not change the zonal result — oracle identical to zonal_stats_rect
SQL["zonal_stats_shp"] = SQL["zonal_stats_rect"]

# between on the 3-D array
SQL["between_3d"] = f"""WITH {COO3}
SELECT band, y, x, value FROM coo3
WHERE band BETWEEN 1 AND 2 AND y BETWEEN 10 AND 40 AND x BETWEEN 5 AND 30"""


# SnapshotCatalog.rollback: current content after rollback(1) == the raw
# raster, bit for bit
SQL["snapshot_rollback"] = f"""WITH {COO}
SELECT y, x, CAST(value AS BIGINT) AS value FROM coo"""


# ---- product quantization (encode + ADC), all-integer twin --------------
from scidbgeo_spark.operators.similarity import PQ_K, PQ_M  # noqa: E402

_PQ_SUB = _KM_DIM // PQ_M
_PQ_SUBS = " UNION ALL ".join(
    f"SELECT vec_id, CAST({m} AS INT) AS m, sv[{m * _PQ_SUB + 1}:{(m + 1) * _PQ_SUB}] AS q FROM sve"
    for m in range(PQ_M)
)

SQL["ann_pq_topk"] = f"""WITH sve AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {KMEANS_SCALE})::BIGINT) AS sv
  FROM embeddings
),
subs AS ({_PQ_SUBS}),
cb AS (SELECT m, CAST(vec_id AS INT) AS cid, q AS cv FROM subs WHERE vec_id < {PQ_K}),
enc AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT s.vec_id, s.m, c.cid,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY list_reduce(list_transform(range(1, {_PQ_SUB + 1}),
                                  i -> (s.q[i] - c.cv[i]) * (s.q[i] - c.cv[i])),
                                  (a, b) -> a + b), c.cid) AS rn
    FROM subs s JOIN cb c USING (m))
  WHERE rn = 1
),
lut AS (
  SELECT s.vec_id AS q_id, s.m, c.cid,
         list_reduce(list_transform(range(1, {_PQ_SUB + 1}),
                      i -> (s.q[i] - c.cv[i]) * (s.q[i] - c.cv[i])),
                     (a, b) -> a + b) AS d
  FROM subs s JOIN cb c USING (m) WHERE s.vec_id < 8
),
adc AS (
  SELECT l.q_id, e.vec_id, sum(l.d) AS dist
  FROM enc e JOIN lut l ON l.m = e.m AND l.cid = e.code
  GROUP BY 1, 2
)
SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rn
  FROM adc
) WHERE rn <= 5"""

SQL["ann_pq_recall"] = _recall_sql(SQL["ann_pq_topk"])


# per-zone change detection between time slices (band 1 - band 0)
SQL["zonal_change"] = f"""WITH {COO3},
a AS (SELECT y, x, value FROM coo3 WHERE band = 0),
b AS (SELECT y, x, value FROM coo3 WHERE band = 1),
d AS (SELECT y, x, b.value - a.value AS value FROM a JOIN b USING (y, x))
SELECT CAST({_RECT_ZONE3} AS BIGINT) AS id,
       min(value) AS min_value,
       max(value) AS max_value,
       avg(value) AS avg_value,
       CAST(count(value) AS BIGINT) AS count_value
FROM d GROUP BY 1"""


# hourly spike score vs the trailing 24-hour window (sentinel 0, not
# NULL, when no baseline exists yet)
SQL["traffic_spikes"] = """WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, hour, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch(hour)
                        RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS ts_,
         count(cnt) OVER (PARTITION BY event_type ORDER BY epoch(hour)
                          RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS th
  FROM h
)
SELECT event_type, hour, cnt,
       CAST(coalesce(ts_, 0) AS BIGINT) AS trailing_sum,
       CAST(th AS BIGINT) AS trailing_hours,
       CASE WHEN ts_ > 0 THEN CAST(cnt * th AS DOUBLE) / ts_
            ELSE 0.0 END AS spike_score
FROM w"""


# language-share drift between crawl halves (doc_id parity split)
SQL["lang_drift"] = """WITH
o AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_old,
             count(*) / (SELECT count(*) FROM documents WHERE doc_id % 2 = 0)
               AS share_old
      FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_new,
             count(*) / (SELECT count(*) FROM documents WHERE doc_id % 2 = 1)
               AS share_new
      FROM documents WHERE doc_id % 2 = 1 GROUP BY lang)
SELECT lang,
       coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
       coalesce(share_old, 0.0) AS share_old,
       coalesce(share_new, 0.0) AS share_new,
       coalesce(share_new, 0.0) - coalesce(share_old, 0.0) AS drift
FROM o FULL OUTER JOIN n USING (lang)"""


# duplicate burden per source over the planted-dup corpus (injected
# copies carry no source row -> the 'injected' bucket)
SQL["dup_rate_by_source"] = f"""WITH {CORPUS},
j AS (SELECT coalesce(d.source, 'injected') AS source, md5(c.text) AS h
      FROM corpus c LEFT JOIN documents d ON c.doc_id = d.doc_id),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
        FROM j GROUP BY source)
SELECT source, n_docs, n_distinct,
       CAST(n_docs - n_distinct AS DOUBLE) / n_docs AS dup_rate
FROM per"""


# areal interpolation: 20x20 'states' zonal sums -> offset 30x30
# 'weather' grid by exact intersection-area weights.  The oracle joins
# on raw bbox overlap (fine at sf0.01); the engine meets in a
# covering-cell EQUI-join (regions.areal_interpolate).  est_value is
# one exact integer sum divided once by the uniform source area —
# bitwise engine-independent.
SQL["areal_interp"] = f"""WITH {COO},
dims AS (SELECT (((SELECT count(*) FROM events) // {RASTER_W}) // {ZONE_H})
                * {ZONE_H} AS ext_y),
a AS (
  SELECT (y // {ZONE_H}) * {NZX} + (x // {ZONE_W}) AS zid_a,
         CAST(SUM(value) AS BIGINT) AS value
  FROM coo, dims WHERE y < ext_y
  GROUP BY 1
),
ar AS (
  SELECT zid_a, value,
         (zid_a // {NZX}) * {ZONE_H} AS ay0,
         (zid_a // {NZX}) * {ZONE_H} + {ZONE_H} AS ay1,
         (zid_a % {NZX}) * {ZONE_W} AS ax0,
         (zid_a % {NZX}) * {ZONE_W} + {ZONE_W} AS ax1
  FROM a
),
br AS (
  SELECT j * ((({RASTER_W} - 11) // 30) + 1) + i AS zid_b,
         10 + j * 30 AS by0,
         LEAST(10 + j * 30 + 30, ext_y) AS by1,
         10 + i * 30 AS bx0,
         LEAST(10 + i * 30 + 30, {RASTER_W}) AS bx1
  FROM generate_series(0, 100000) t1(j),
       generate_series(0, ({RASTER_W} - 11) // 30) t2(i),
       dims
  WHERE 10 + j * 30 < ext_y
)
SELECT zid_b,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM((LEAST(ay1, by1) - GREATEST(ay0, by0))
              * (LEAST(ax1, bx1) - GREATEST(ax0, bx0))) AS BIGINT)
         AS covered_area,
       CAST(SUM(value * (LEAST(ay1, by1) - GREATEST(ay0, by0))
                      * (LEAST(ax1, bx1) - GREATEST(ax0, bx0))) AS BIGINT)
         / {400.0} AS est_value
FROM br JOIN ar
  ON LEAST(ay1, by1) > GREATEST(ay0, by0)
 AND LEAST(ax1, bx1) > GREATEST(ax0, bx0)
GROUP BY 1"""

# focal.flow_accum_coo: D8 flow accumulation.  Edges = each cell's
# in-grid 8-neighbor with the smallest value (ties: smallest ty, tx),
# kept only when STRICTLY below the cell's own value (strict descent =>
# acyclic, so the recursion terminates).  acc(c) = count of (src, cur)
# path pairs landing on c — identical to the engine's topological peel.
SQL["flow_accum"] = f"""WITH RECURSIVE {COO},
cand AS (
  SELECT a.y AS uy, a.x AS ux, b.y AS ty, b.x AS tx,
         row_number() OVER (PARTITION BY a.y, a.x
                            ORDER BY b.value, b.y, b.x) AS rn
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
   AND NOT (b.y = a.y AND b.x = a.x)
  WHERE b.value < a.value
),
edges AS (SELECT uy, ux, ty, tx FROM cand WHERE rn = 1),
paths AS (
  SELECT uy AS sy, ux AS sx, ty AS cy, tx AS cx FROM edges
  UNION ALL
  SELECT p.sy, p.sx, e.ty, e.tx
  FROM paths p JOIN edges e ON e.uy = p.cy AND e.ux = p.cx
)
SELECT cy AS y, cx AS x, count(*) AS acc FROM paths GROUP BY 1, 2"""

# knn.moran_i: queen-adjacency Moran's I over occupied 1-degree cells.
# All-integer algebra (n*z_i = n*x_i - S), HUGEINT sums, one final
# int->double division — the zonal_var exactness precedent.
SQL["moran_i"] = f"""WITH {PTS},
cells AS (
  SELECT CAST(floor((lat + 90.0) / 10.0) AS BIGINT) AS cy,
         CAST(floor((lon + 180.0) / 10.0) AS BIGINT) AS cx, count(*) AS x
  FROM pts GROUP BY 1, 2
),
st AS (SELECT count(*) AS n, sum(x) AS s FROM cells),
z AS (
  SELECT cy, cx, CAST(x AS HUGEINT) * (SELECT n FROM st)
                 - (SELECT s FROM st) AS z
  FROM cells
),
agg AS (
  SELECT count(*) AS w, sum(a.z * b.z) AS num
  FROM z a JOIN z b
    ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND NOT (b.cy = a.cy AND b.cx = a.cx)
),
d AS (SELECT sum(z * z) AS den FROM z)
SELECT (SELECT n FROM st) AS n_cells,
       (SELECT w FROM agg) AS w_pairs,
       CAST((SELECT n FROM st) AS DOUBLE) * CAST((SELECT num FROM agg) AS DOUBLE)
         / (CAST((SELECT w FROM agg) AS DOUBLE)
            * CAST((SELECT den FROM d) AS DOUBLE)) AS moran_i"""

# temporal.trajectory_stats: per-user movement rollup on the integer
# milli-degree lattice — lag window + grouped integer algebra; first/
# last positions via arg-ordered aggregates, all exact.
SQL["trajectory_stats"] = """WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 180000 AS py,
         (event_id * 9973) % 360000 AS px
  FROM events
),
stepped AS (
  SELECT user_id, py, px,
         py - lag(py) OVER w AS dy,
         px - lag(px) OVER w AS dx,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS np
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_pts,
       CAST(COALESCE(sum(dy*dy + dx*dx), 0) AS BIGINT) AS path_len2,
       (max(CASE WHEN rn = np THEN py END) - max(CASE WHEN rn = 1 THEN py END))
         * (max(CASE WHEN rn = np THEN py END) - max(CASE WHEN rn = 1 THEN py END))
       + (max(CASE WHEN rn = np THEN px END) - max(CASE WHEN rn = 1 THEN px END))
         * (max(CASE WHEN rn = np THEN px END) - max(CASE WHEN rn = 1 THEN px END))
         AS net_disp2,
       max(py) - min(py) AS bbox_h,
       max(px) - min(px) AS bbox_w
FROM stepped GROUP BY user_id"""

# focal.join_counts_coo: rook-adjacent unordered pair counts by binary
# color (black = value >= 126) — right + down equi-joins count each
# pair exactly once, mirroring the kernel's per-cell (0,1)/(1,0) scan.
SQL["join_counts"] = f"""WITH {COO},
b AS (SELECT y, x, CASE WHEN value >= 126 THEN 1 ELSE 0 END AS c FROM coo),
prs AS (
  SELECT a.c + t.c AS s FROM b a JOIN b t ON t.y = a.y AND t.x = a.x + 1
  UNION ALL
  SELECT a.c + t.c AS s FROM b a JOIN b t ON t.y = a.y + 1 AND t.x = a.x
)
SELECT CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bb,
       CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bw,
       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ww
FROM prs"""

# pixel.affine_warp: 90-degree clockwise rotation of the raster
# ((y,x) -> (x, H-1-y): a=0,b=1,ty=0; c=-1,d=0,tx=H-1) — closed-form
# column algebra, H derived from the row count like every COO oracle.
SQL["rotate90"] = f"""WITH {COO},
dims AS (SELECT count(*) // {RASTER_W} AS h FROM coo)
SELECT x AS y, (SELECT h FROM dims) - 1 - y AS x, value
FROM coo"""


def _cost_reach_sql(rounds: int = 4) -> str:
    """Unroll the K cost-propagation rounds as chained CTEs — the exact
    twin of focal.cost_reach_coo's unrolled DataFrame loop."""
    offs = ", ".join(
        f"({dy}, {dx})"
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0)
    )
    parts = [
        COO.strip(),
        "offs(dy, dx) AS (VALUES " + offs + ")",
        "d0 AS (SELECT y, x, CAST(0 AS BIGINT) AS cost FROM coo WHERE value = 0)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"s{k} AS (SELECT d.y + o.dy AS y, d.x + o.dx AS x,"
            f" min(d.cost) AS best_in FROM d{k-1} d, offs o GROUP BY 1, 2)"
        )
        parts.append(
            f"c{k} AS (SELECT s.y, s.x, CASE WHEN v.value = 0 THEN 0"
            f" ELSE s.best_in + v.value END AS cost"
            f" FROM s{k} s JOIN coo v ON v.y = s.y AND v.x = s.x)"
        )
        parts.append(
            f"d{k} AS (SELECT y, x, min(cost) AS cost FROM"
            f" (SELECT * FROM d{k-1} UNION ALL SELECT * FROM c{k})"
            f" GROUP BY 1, 2)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT y, x, CAST(cost AS BIGINT) AS cost FROM d{rounds}"
    )


SQL["cost_reach"] = _cost_reach_sql()

# knn.local_moran: LISA per occupied 10-degree cell — exact n-scaled
# deviations, queen-lag sums, product emitted as the deterministic
# int->double cast.  Cells with no occupied neighbor emit no row
# (inner join), matching the engine.
SQL["local_moran"] = f"""WITH {PTS},
cells AS (
  SELECT CAST(floor((lat + 90.0) / 10.0) AS BIGINT) AS cy,
         CAST(floor((lon + 180.0) / 10.0) AS BIGINT) AS cx, count(*) AS x
  FROM pts GROUP BY 1, 2
),
st AS (SELECT count(*) AS n, sum(x) AS s FROM cells),
z AS (
  SELECT cy, cx, CAST(x AS HUGEINT) * (SELECT n FROM st)
                 - (SELECT s FROM st) AS nz
  FROM cells
),
lag AS (
  SELECT a.cy, a.cx, sum(b.nz) AS lag_nz, count(*) AS n_nbrs
  FROM z a JOIN z b
    ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND NOT (b.cy = a.cy AND b.cx = a.cx)
  GROUP BY a.cy, a.cx
)
SELECT z.cy, z.cx, CAST(z.nz AS BIGINT) AS nz,
       CAST(lag.lag_nz AS BIGINT) AS lag_nz,
       lag.n_nbrs AS n_nbrs,
       CAST(z.nz * lag.lag_nz AS DOUBLE) AS local_num
FROM z JOIN lag ON lag.cy = z.cy AND lag.cx = z.cx"""

# focal.watershed_basins_coo: per-cell terminal D8 sink (watershed
# decomposition).  Same edge rule as flow_accum; the walk CTE follows
# each cell's single out-path and the final filter keeps the step whose
# position has no outgoing edge (= the sink); sinks/isolated cells seed
# the walk pointing at themselves.
SQL["watershed_basins"] = f"""WITH RECURSIVE {COO},
cand AS (
  SELECT a.y AS uy, a.x AS ux, b.y AS ty, b.x AS tx,
         row_number() OVER (PARTITION BY a.y, a.x
                            ORDER BY b.value, b.y, b.x) AS rn
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
   AND NOT (b.y = a.y AND b.x = a.x)
  WHERE b.value < a.value
),
edges AS (SELECT uy, ux, ty, tx FROM cand WHERE rn = 1),
walk AS (
  SELECT y, x, y AS cy, x AS cx FROM coo
  UNION ALL
  SELECT w.y, w.x, e.ty, e.tx
  FROM walk w JOIN edges e ON e.uy = w.cy AND e.ux = w.cx
)
SELECT y, x, cy AS basin_y, cx AS basin_x
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.uy = w.cy AND e.ux = w.cx)"""

# knn.gi_star: Getis-Ord Gi* per occupied 10-degree cell (queen + self).
# All-integer interior (HUGEINT), then one double expression whose only
# irrational steps are IEEE-correctly-rounded sqrts — identical bits in
# both engines; degenerate neighborhoods yield NULL on both sides.
SQL["gi_star"] = f"""WITH {PTS},
cells AS (
  SELECT CAST(floor((lat + 90.0) / 10.0) AS BIGINT) AS cy,
         CAST(floor((lon + 180.0) / 10.0) AS BIGINT) AS cx, count(*) AS x
  FROM pts GROUP BY 1, 2
),
st AS (SELECT count(*) AS n, sum(x) AS s,
              sum(CAST(x AS HUGEINT) * x) AS s2 FROM cells),
nbr AS (
  SELECT a.cy, a.cx, sum(b.x) AS sum_nbr, count(*) AS w
  FROM cells a JOIN cells b
    ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
  GROUP BY a.cy, a.cx
)
SELECT c.cy, c.cx, c.x, nbr.w AS w_nbrs,
       CAST(nbr.sum_nbr AS BIGINT) AS sum_nbr,
       CAST(CAST(nbr.sum_nbr AS HUGEINT) * st.n - st.s * nbr.w AS DOUBLE)
         AS gi_num,
       CASE WHEN st.n > 1 AND nbr.w < st.n
                 AND st.n * st.s2 - CAST(st.s AS HUGEINT) * st.s > 0
            THEN CAST(CAST(nbr.sum_nbr AS HUGEINT) * st.n
                      - st.s * nbr.w AS DOUBLE)
                 / (sqrt(CAST(st.n * st.s2
                              - CAST(st.s AS HUGEINT) * st.s AS DOUBLE))
                    * sqrt(CAST(nbr.w * (st.n - nbr.w) AS DOUBLE)
                           / CAST(st.n - 1 AS DOUBLE)))
            END AS gi_z
FROM cells c JOIN nbr ON nbr.cy = c.cy AND nbr.cx = c.cx, st"""

# temporal.mk_trend: Mann-Kendall S per cell across bands — the literal
# ordered pair join the engine's array fold replaces.
SQL["mk_trend"] = f"""WITH {COO3},
pairs AS (
  SELECT a.y, a.x,
         CASE WHEN b.value > a.value THEN 1
              WHEN b.value < a.value THEN -1 ELSE 0 END AS sgn
  FROM coo3 a JOIN coo3 b ON b.y = a.y AND b.x = a.x AND b.band > a.band
),
nb AS (SELECT y, x, count(*) AS n_bands FROM coo3 GROUP BY 1, 2)
SELECT nb.y, nb.x, nb.n_bands,
       nb.n_bands * (nb.n_bands - 1) // 2 AS n_pairs,
       COALESCE(p.s_stat, 0) AS s_stat
FROM nb LEFT JOIN (
  SELECT y, x, CAST(sum(sgn) AS BIGINT) AS s_stat FROM pairs GROUP BY 1, 2
) p ON p.y = nb.y AND p.x = nb.x"""

# text.vocab_growth: Heaps-law curve over the 3-word shingle vocabulary
# — per doc-id slice, the count of first-seen phrases and the cumulative
# vocabulary (same 60-bit md5 hash + shingle rule as the engine).
SQL["vocab_growth"] = f"""WITH
tok AS (SELECT doc_id, {_MD5INT.format(x='t')} AS h
        FROM (SELECT doc_id, unnest(sh) AS t
              FROM {_kshingles('documents', 3)})),
n AS (SELECT count(*) AS n_docs FROM documents),
first AS (SELECT h, min(doc_id) AS first_doc FROM tok GROUP BY h),
b AS (SELECT LEAST(first_doc * 10 // n_docs, 9) AS bucket FROM first, n),
per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_terms
        FROM b GROUP BY bucket)
SELECT bucket, new_terms,
       CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
FROM per"""

# knn.idw_interp: distance-decay interpolation at the 10 nation-derived
# POI sites, weight = R^2 - d^2 on the milli-degree integer lattice —
# exact HUGEINT sums, one double division (v = doc_id % 997).
SQL["idw_interp"] = f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 10
),
ip AS (SELECT doc_id % 997 AS v,
              CAST(round((lon + 180.0) * 1000.0) AS BIGINT) AS mx,
              CAST(round((lat + 90.0) * 1000.0) AS BIGINT) AS my
       FROM pts),
iq AS (SELECT q_id,
              CAST(round((qlon + 180.0) * 1000.0) AS BIGINT) AS qmx,
              CAST(round((qlat + 90.0) * 1000.0) AS BIGINT) AS qmy
       FROM q),
pairs AS (
  SELECT q_id, v,
         (mx - qmx) * (mx - qmx) + (my - qmy) * (my - qmy) AS dm2
  FROM ip CROSS JOIN iq
  WHERE (mx - qmx) * (mx - qmx) + (my - qmy) * (my - qmy) <= 144000000
)
SELECT q_id, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(CAST(144000000 - dm2 AS HUGEINT)) AS DOUBLE) AS sum_w,
       CAST(sum(CAST(v AS HUGEINT) * (144000000 - dm2)) AS DOUBLE)
         / nullif(CAST(sum(CAST(144000000 - dm2 AS HUGEINT)) AS DOUBLE), 0)
         AS idw_value
FROM pairs GROUP BY q_id"""

# knn.grid_dbscan: density clustering on the 10-degree occupied grid —
# core cells (npts >= 2), recursive queen reachability among cores, label
# = min reachable linear cell id, borders take the min adjacent core
# cluster, noise stays NULL.
SQL["grid_dbscan"] = f"""WITH RECURSIVE {PTS},
cells AS (
  SELECT CAST(floor((lat + 90.0) / 10.0) AS BIGINT) AS cy,
         CAST(floor((lon + 180.0) / 10.0) AS BIGINT) AS cx, count(*) AS npts
  FROM pts GROUP BY 1, 2
),
core AS (SELECT cy, cx, cy * 36 + cx AS id FROM cells WHERE npts >= 2),
edge AS (
  SELECT a.id AS ida, b.id AS idb
  FROM core a JOIN core b
    ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND NOT (b.cy = a.cy AND b.cx = a.cx)
),
reach AS (
  SELECT id AS src, id AS dst FROM core
  UNION
  SELECT r.src, e.idb FROM reach r JOIN edge e ON e.ida = r.dst
),
lbl AS (SELECT src AS id, min(dst) AS cluster FROM reach GROUP BY src),
cl AS (SELECT core.cy, core.cx, lbl.cluster
       FROM core JOIN lbl ON lbl.id = core.id)
SELECT c.cy, c.cx, CAST(c.npts AS BIGINT) AS npts,
       c.npts >= 2 AS is_core,
       COALESCE(cl.cluster,
                (SELECT min(c2.cluster) FROM cl c2
                 WHERE c2.cy BETWEEN c.cy - 1 AND c.cy + 1
                   AND c2.cx BETWEEN c.cx - 1 AND c.cx + 1),
                -1) AS cluster
FROM cells c LEFT JOIN cl ON cl.cy = c.cy AND cl.cx = c.cx"""

# focal.focal_mode_coo: 3x3 majority filter, ties -> smallest value —
# the literal neighbor-join + count-rank the kernel's sorted-stack
# argmax replaces.
SQL["focal_mode"] = f"""WITH {COO},
nbr AS (
  SELECT a.y, a.x, b.value AS v
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
),
cnt AS (SELECT y, x, v, count(*) AS n FROM nbr GROUP BY 1, 2, 3),
r AS (SELECT y, x, v,
             row_number() OVER (PARTITION BY y, x ORDER BY n DESC, v) AS rn
      FROM cnt)
SELECT y, x, v AS mode_value FROM r WHERE rn = 1"""

# pixel.upsample_bilinear: 2x bilinear resample at quarter-lattice
# sample points — the same 16-message scatter, clamped at edges, exact
# x16 integers + one division.
_BIL_OFFS = ", ".join(
    f"({dy}, {dx}, {wy * wx})"
    for dy, wy in ((0, 3), (1, 3), (-1, 1), (2, 1))
    for dx, wx in ((0, 3), (1, 3), (-1, 1), (2, 1))
)
SQL["upsample_bilinear"] = f"""WITH {COO},
dims AS (SELECT 2 * (count(*) // {RASTER_W}) AS h2 FROM events),
offs(dy, dx, w) AS (VALUES {_BIL_OFFS}),
msg AS (
  SELECT greatest(least(y * 2 + dy, h2 - 1), 0) AS ty,
         greatest(least(x * 2 + dx, {2 * RASTER_W} - 1), 0) AS tx,
         value * w AS c
  FROM coo CROSS JOIN offs CROSS JOIN dims
)
SELECT ty AS y, tx AS x, CAST(sum(c) AS BIGINT) AS value16,
       CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 16.0 AS value
FROM msg GROUP BY 1, 2"""

# pixel.los_visibility: west-edge line of sight per raster row — the
# plain prefix-max window the engine's segmented two-level scan equals.
SQL["los_visibility"] = f"""WITH {COO},
pm AS (
  SELECT y, x, value,
         COALESCE(max(value) OVER (PARTITION BY y ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           AS horizon
  FROM coo
)
SELECT y, x, horizon, value > horizon AS visible FROM pm"""

# pixel.hist_equalize: integer histogram equalization — value-keyed CDF
# remap, (cum - cdf_min)*(levels-1) // (n - cdf_min), constant -> 0.
SQL["hist_equalize"] = f"""WITH {COO},
hist AS (SELECT value, count(*) AS cnt FROM coo GROUP BY value),
st AS (SELECT min_by(cnt, value) AS cdf_min, sum(cnt) AS n FROM hist),
cdf AS (
  SELECT value, sum(cnt) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
remap AS (
  SELECT value,
         CASE WHEN st.n > st.cdf_min
              THEN CAST((cdf.cum - st.cdf_min) * 255
                        // (st.n - st.cdf_min) AS BIGINT)
              ELSE 0 END AS eq_value
  FROM cdf, st
)
SELECT c.y, c.x, r.eq_value FROM coo c JOIN remap r USING (value)"""

# graph.host_degree_stats: degree/weight/reciprocity profile of the
# deterministic host graph (same edge derivation as host_pagerank).
SQL["host_degree_stats"] = """WITH
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
),
edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          FROM e0 GROUP BY src, dst),
o AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg,
             CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
i AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_deg,
             CAST(sum(w) AS BIGINT) AS in_w FROM edges GROUP BY dst),
rc AS (
  SELECT e.src AS host, CAST(count(*) AS BIGINT) AS n_reciprocal
  FROM edges e JOIN (SELECT DISTINCT dst AS src, src AS dst FROM edges) r
    ON r.src = e.src AND r.dst = e.dst
  GROUP BY e.src
)
SELECT COALESCE(o.host, i.host) AS host,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(i.in_deg, 0) AS in_deg,
       COALESCE(o.out_w, 0) AS out_w,
       COALESCE(i.in_w, 0) AS in_w,
       COALESCE(rc.n_reciprocal, 0) AS n_reciprocal
FROM o FULL JOIN i ON i.host = o.host
LEFT JOIN rc ON rc.host = COALESCE(o.host, i.host)"""

# regions.region_sieve: one-pass GDAL SieveFilter analog — regions under
# min_pixels flip to the class of their largest 4-adjacent neighbor
# region (ties -> smallest region id), no-neighbor regions keep theirs.
SQL["region_sieve"] = f"""WITH rl AS ({SQL["region_label"]}),
st AS (SELECT region, count(*) AS n_pixels, min(cls) AS rcls
       FROM rl GROUP BY 1),
adj0 AS (
  SELECT a.region AS region, b.region AS region_b FROM rl a JOIN rl b
    ON b.y = a.y AND b.x = a.x + 1 AND b.region <> a.region
  UNION ALL
  SELECT a.region, b.region FROM rl a JOIN rl b
    ON b.y = a.y + 1 AND b.x = a.x AND b.region <> a.region
),
adj AS (SELECT DISTINCT region, region_b FROM (
  SELECT region, region_b FROM adj0
  UNION ALL
  SELECT region_b AS region, region AS region_b FROM adj0
)),
ch AS (
  SELECT adj.region, nb.rcls,
         row_number() OVER (PARTITION BY adj.region
                            ORDER BY nb.n_pixels DESC, adj.region_b) AS rn
  FROM adj JOIN st nb ON nb.region = adj.region_b
),
choice AS (SELECT region, rcls AS new_cls FROM ch WHERE rn = 1),
small AS (SELECT region FROM st WHERE n_pixels < 3)
SELECT rl.y, rl.x,
       CAST(CASE WHEN small.region IS NOT NULL AND choice.new_cls IS NOT NULL
                 THEN choice.new_cls ELSE rl.cls END AS BIGINT) AS cls_out
FROM rl LEFT JOIN small ON small.region = rl.region
LEFT JOIN choice ON choice.region = rl.region"""

# text.doc_novelty: per-doc fraction of distinct shingles first seen in
# this doc (same shingle rule + 60-bit hash as the engine).
SQL["doc_novelty"] = f"""WITH
tok AS (SELECT doc_id, {_MD5INT.format(x='t')} AS h
        FROM (SELECT doc_id, unnest(sh) AS t
              FROM {_kshingles('documents', 3)})),
first AS (SELECT h, min(doc_id) AS first_doc FROM tok GROUP BY h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum((first_doc = doc_id)::INT) AS BIGINT) AS n_novel,
       CAST(sum((first_doc = doc_id)::INT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty
FROM tok JOIN first USING (h) GROUP BY doc_id"""

# temporal.trajectory_rose: per-user 8-octant step histogram — identical
# integer sign tests over the lag differences.
SQL["trajectory_rose"] = """WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 180000 AS py,
         (event_id * 9973) % 360000 AS px
  FROM events
),
st AS (
  SELECT user_id,
         py - lag(py) OVER w AS dy,
         px - lag(px) OVER w AS dx
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
oc AS (
  SELECT user_id,
         CASE
           WHEN dy < 0 AND abs(dy) > abs(dx) THEN 0
           WHEN dy < 0 AND dx > 0 AND abs(dy) = abs(dx) THEN 1
           WHEN dx > 0 AND abs(dx) > abs(dy) THEN 2
           WHEN dy > 0 AND dx > 0 AND abs(dy) = abs(dx) THEN 3
           WHEN dy > 0 AND abs(dy) > abs(dx) THEN 4
           WHEN dy > 0 AND dx < 0 AND abs(dy) = abs(dx) THEN 5
           WHEN dx < 0 AND abs(dx) > abs(dy) THEN 6
           ELSE 7
         END AS octant
  FROM st
  WHERE dy IS NOT NULL AND NOT (dy = 0 AND dx = 0)
)
SELECT user_id, CAST(octant AS BIGINT) AS octant,
       CAST(count(*) AS BIGINT) AS n_steps
FROM oc GROUP BY 1, 2"""

# focal.focal_var_coo: local-variance texture filter — literal 3x3
# neighbor join; nvar = n*sum(v^2) - sum(v)^2 exactly as the kernel.
SQL["focal_var"] = f"""WITH {COO},
nb AS (
  SELECT a.y AS y, a.x AS x,
         count(*) AS n_cells,
         CAST(sum(b.value) AS BIGINT) AS sum_v,
         CAST(sum(b.value * b.value) AS BIGINT) AS s2
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
  GROUP BY a.y, a.x
)
SELECT y, x, CAST(n_cells AS BIGINT) AS n_cells, sum_v,
       CAST(n_cells * s2 - sum_v * sum_v AS BIGINT) AS nvar,
       CAST(n_cells * s2 - sum_v * sum_v AS DOUBLE)
         / CAST(n_cells * n_cells AS DOUBLE) AS var_pop
FROM nb"""

# temporal.band_argmax: max-value composite across bands, ties to the
# smallest band — max per cell, then min(band) among the maxima.
SQL["band_argmax"] = f"""WITH {COO3},
m AS (SELECT y, x, max(value) AS best_value FROM coo3 GROUP BY y, x)
SELECT c.y, c.x, CAST(min(c.band) AS BIGINT) AS best_band,
       CAST(m.best_value AS BIGINT) AS best_value
FROM coo3 c JOIN m ON c.y = m.y AND c.x = m.x AND c.value = m.best_value
GROUP BY c.y, c.x, m.best_value"""

# temporal.gap_fill: LOCF along the band axis; the identical value-
# derived miss mask (value % 10 = 0) and growing-frame window.
SQL["gap_fill"] = f"""WITH {COO3}
SELECT band, y, x,
       CAST(COALESCE(
            last_value(CASE WHEN value % 10 != 0 THEN value END IGNORE NULLS)
            OVER (PARTITION BY y, x ORDER BY band
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            -1) AS BIGINT) AS filled,
       (value % 10 = 0) AS is_gap
FROM coo3"""

# text.phrase_search: positional posting-list intersection for the
# exact 2-word phrase "table key" (0-based positions, adjacency join).
SQL["phrase_search"] = """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
p AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tokv
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
),
a AS (SELECT doc_id, pos FROM p WHERE tokv = 'table'),
b AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE tokv = 'key')
SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(a.pos) AS BIGINT) AS first_pos
FROM a JOIN b ON a.doc_id = b.doc_id AND a.pos = b.pos
GROUP BY a.doc_id"""

# text.doc_chunks: 64-token windows advancing by 48; chunk_no is the
# 0-based window ordinal (= start // stride), md5 over the window text.
SQL["doc_chunks"] = """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents
),
st AS (
  SELECT doc_id, l, n, s.sp AS start_pos
  FROM tok, LATERAL (SELECT unnest(generate_series(0, n - 1, 48)) AS sp) s
)
SELECT doc_id,
       CAST(start_pos // 48 AS BIGINT) AS chunk_no,
       CAST(start_pos AS BIGINT) AS start_pos,
       CAST(LEAST(64, n - start_pos) AS BIGINT) AS n_tokens,
       md5(array_to_string(l[start_pos + 1 : start_pos + 64], ' ')) AS chunk_md5
FROM st"""

# temporal.event_transitions: first-order Markov transition counts +
# conditional probabilities over per-user consecutive event pairs.
SQL["event_transitions"] = """WITH st AS (
  SELECT lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
)
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_trans,
       CAST(count(*) AS DOUBLE)
         / CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS p_trans
FROM st WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type"""

# knn.ripley_k: ordered pairs within each radius on the milli-degree
# lattice — the oracle is the plain self-join (candidate cells only
# change the plan, never the exact d^2 <= r^2 test).
SQL["ripley_k"] = f"""WITH {PTS},
ip AS (SELECT doc_id,
              CAST(round((lon + 180.0) * 1000.0) AS BIGINT) AS mx,
              CAST(round((lat + 90.0) * 1000.0) AS BIGINT) AS my
       FROM pts),
rr AS (SELECT CAST(r AS BIGINT) AS r_milli FROM (VALUES (2000), (6000), (12000)) t(r)),
cnt AS (
  SELECT rr.r_milli, CAST(count(*) AS BIGINT) AS n_pairs
  FROM rr, ip a, ip b
  WHERE a.doc_id != b.doc_id
    AND (a.mx - b.mx) * (a.mx - b.mx) + (a.my - b.my) * (a.my - b.my)
        <= rr.r_milli * rr.r_milli
  GROUP BY rr.r_milli
),
n AS (SELECT count(*) AS n_pts FROM pts)
SELECT rr.r_milli, COALESCE(c.n_pairs, 0) AS n_pairs,
       COALESCE(c.n_pairs, 0) * 64800000000.0
         / (n.n_pts * (n.n_pts - 1)) AS k_hat
FROM rr LEFT JOIN cnt c USING (r_milli), n"""

# text.winnow_fingerprints: identical packed-key winnowing (min over
# each 4-hash window of 3-gram hashes, ties to the rightmost position).
SQL["winnow_fingerprints"] = f"""WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents
),
kg AS (
  SELECT doc_id, i,
         (({_MD5INT.format(x="array_to_string(l[i+1:i+3], ' ')")}
            % 1099511627776) * 1048576 + (1048575 - i)) AS key
  FROM tok, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
  WHERE n >= 6
),
wj AS (SELECT doc_id, unnest(generate_series(0, n - 6)) AS j
       FROM tok WHERE n >= 6),
wins AS (
  SELECT kg.doc_id, wj.j, min(kg.key) AS key
  FROM kg JOIN wj ON kg.doc_id = wj.doc_id
                 AND kg.i BETWEEN wj.j AND wj.j + 3
  GROUP BY kg.doc_id, wj.j
),
sel AS (SELECT DISTINCT doc_id, key FROM wins)
SELECT doc_id,
       CAST(1048575 - (key % 1048576) AS BIGINT) AS pos,
       CAST(key // 1048576 AS BIGINT) AS h40
FROM sel"""

# focal.edge_density_coo: rook-adjacent unordered class-pair counts
# (value // 86 classes) — the literal adjacency self-join.
SQL["edge_density"] = f"""WITH {COO},
c AS (SELECT y, x, value // 86 AS cls FROM coo),
e AS (
  SELECT LEAST(a.cls, b.cls) AS cls_a, GREATEST(a.cls, b.cls) AS cls_b
  FROM c a JOIN c b
    ON (b.y = a.y AND b.x = a.x + 1) OR (b.y = a.y + 1 AND b.x = a.x)
)
SELECT cls_a, cls_b, CAST(count(*) AS BIGINT) AS n_edges
FROM e GROUP BY 1, 2"""

# knn.geary_c: difference-based global autocorrelation — the moran_i
# oracle shape with (x_a - x_b)^2 pair sums (no mean in the numerator).
SQL["geary_c"] = f"""WITH {PTS},
cells AS (
  SELECT CAST(floor((lat + 90.0) / 10.0) AS BIGINT) AS cy,
         CAST(floor((lon + 180.0) / 10.0) AS BIGINT) AS cx, count(*) AS x
  FROM pts GROUP BY 1, 2
),
st AS (SELECT count(*) AS n, sum(x) AS s,
              sum(CAST(x AS HUGEINT) * x) AS sx2 FROM cells),
agg AS (
  SELECT count(*) AS w,
         sum(CAST((a.x - b.x) AS HUGEINT) * (a.x - b.x)) AS num
  FROM cells a JOIN cells b
    ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND NOT (b.cy = a.cy AND b.cx = a.cx)
)
SELECT (SELECT n FROM st) AS n_cells,
       (SELECT w FROM agg) AS w_pairs,
       (CAST((SELECT n FROM st) AS DOUBLE)
          * CAST((SELECT n FROM st) - 1 AS DOUBLE))
         * CAST((SELECT num FROM agg) AS DOUBLE)
       / ((2.0 * CAST((SELECT w FROM agg) AS DOUBLE))
          * CAST((SELECT n FROM st) * (SELECT sx2 FROM st)
                 - (SELECT s FROM st) * (SELECT s FROM st) AS DOUBLE))
         AS geary_c"""

# knn.semivariogram: per-lag-bin pair counts + squared value-difference
# sums (v = doc_id % 997) — plain self-join oracle, bins by d^2.
SQL["semivariogram"] = f"""WITH {PTS},
ip AS (SELECT doc_id, doc_id % 997 AS v,
              CAST(round((lon + 180.0) * 1000.0) AS BIGINT) AS mx,
              CAST(round((lat + 90.0) * 1000.0) AS BIGINT) AS my
       FROM pts),
rr AS (SELECT lo, hi FROM (VALUES (0, 2000), (2000, 6000), (6000, 12000)) t(lo, hi)),
cnt AS (
  SELECT rr.hi, CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST((a.v - b.v) AS HUGEINT) * (a.v - b.v)) AS ssd
  FROM rr, ip a, ip b
  WHERE a.doc_id != b.doc_id
    AND (a.mx - b.mx) * (a.mx - b.mx) + (a.my - b.my) * (a.my - b.my)
        > rr.lo * rr.lo
    AND (a.mx - b.mx) * (a.mx - b.mx) + (a.my - b.my) * (a.my - b.my)
        <= rr.hi * rr.hi
  GROUP BY rr.hi
)
SELECT CAST(rr.hi AS BIGINT) AS lag_milli,
       COALESCE(c.n_pairs, 0) AS n_pairs,
       CASE WHEN COALESCE(c.n_pairs, 0) > 0
            THEN CAST(c.ssd AS DOUBLE) / (2.0 * CAST(c.n_pairs AS DOUBLE))
            ELSE 0.0 END AS gamma
FROM rr LEFT JOIN cnt c ON c.hi = rr.hi"""

# curation.simpson_diversity: per-language Simpson source concentration.
SQL["simpson_diversity"] = """WITH per AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
)
SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sources,
       CASE WHEN sum(n) > 1
            THEN CAST(sum(n * (n - 1)) AS DOUBLE)
                 / CAST(sum(n) * (sum(n) - 1) AS DOUBLE)
            ELSE 0.0 END AS simpson
FROM per GROUP BY lang"""

# temporal.user_burst: per-user peak-minute profile.
SQL["user_burst"] = """WITH pm AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(max(n) AS BIGINT) AS peak_min_events,
       CAST(count(*) AS BIGINT) AS n_active_minutes,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(n) AS DOUBLE) / count(*) AS events_per_minute
FROM pm GROUP BY user_id"""

# text.winnow_dup_pairs: pairs sharing >= 2 winnowing fingerprint
# hashes, hot hashes (> 200 docs) dropped — nested winnow CTE reuse.
SQL["winnow_dup_pairs"] = f"""WITH fpq AS ({SQL["winnow_fingerprints"]}),
fp AS (SELECT DISTINCT doc_id, h40 FROM fpq),
capped AS (
  SELECT doc_id, h40 FROM (
    SELECT doc_id, h40, count(*) OVER (PARTITION BY h40) AS hsz FROM fp
  ) WHERE hsz <= 200
)
SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
FROM capped a JOIN capped b ON a.h40 = b.h40 AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2"""

# temporal.session_stats: sessionize -> per-session duration/count ->
# one-row rollup; quantile_cont matches Spark's exact percentile.
SQL["session_stats"] = """WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM marked
),
per AS (
  SELECT user_id, sess_no,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
         count(*) AS n_ev
  FROM sess GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       quantile_cont(dur_us, 0.5) AS median_dur_us,
       quantile_cont(dur_us, 0.9) AS p90_dur_us,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       CAST(sum(n_ev) AS DOUBLE) / count(*) AS events_per_session
FROM per"""

# dedup.cluster_survivors: longest member per transitive near-dup
# cluster (ties -> smallest doc_id) — nested dedup_clusters CTE + one
# length probe join; arg-ordered max mirrors the struct-max trick.
SQL["cluster_survivors"] = f"""WITH {CORPUS},
cl AS (SELECT doc_id, cluster FROM ({SQL["dedup_clusters"]})),
sized AS (
  SELECT cl.cluster, cl.doc_id, length(c.text) AS len
  FROM cl JOIN corpus c ON c.doc_id = cl.doc_id
)
SELECT cluster,
       CAST(first(doc_id ORDER BY len DESC, doc_id) AS BIGINT) AS keep_id,
       CAST(max(len) AS BIGINT) AS keep_chars,
       CAST(count(*) AS BIGINT) AS n_members
FROM sized GROUP BY cluster"""

# pixel.integral_image: the 2-window closed form — row prefix then
# column prefix of the row prefixes IS the summed-area table.
SQL["integral_image"] = f"""WITH {COO},
r AS (SELECT y, x, sum(value) OVER (PARTITION BY y ORDER BY x) AS rp
      FROM coo)
SELECT y, x, CAST(sum(rp) OVER (PARTITION BY x ORDER BY y) AS BIGINT) AS sat
FROM r"""

# graph.host_triangles: degree-ordered oriented triangle count + global
# clustering coefficient over the deterministic host link graph.
SQL["host_triangles"] = """WITH
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
  UNION ALL
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2
    ON d2.doc_id = (d1.doc_id * d1.doc_id // 5 + 2) % nd.n_docs
),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e0 WHERE src != dst),
deg AS (SELECT node, count(*) AS deg FROM (
          SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node),
o AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS v
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM o e1 JOIN o e2 ON e2.u = e1.v
            JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
),
st AS (SELECT count(*) AS n_nodes,
              sum(deg * (deg - 1) // 2) AS wedges FROM deg),
ne AS (SELECT count(*) AS n_edges FROM e)
SELECT CAST(st.n_nodes AS BIGINT) AS n_nodes,
       CAST(ne.n_edges AS BIGINT) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles,
       CASE WHEN st.wedges > 0
            THEN (3.0 * CAST(tri.n_triangles AS DOUBLE))
                 / CAST(st.wedges AS DOUBLE)
            ELSE 0.0 END AS gcc
FROM st, ne, tri"""

# GeoPackage layer (pure-sqlite3 + WKB reader): the SQLite round-trip
# must not change results either
SQL["pip_poly_gpkg"] = f"""WITH {PTS}
SELECT doc_id, CAST(zone_id AS BIGINT) AS zone_id FROM (
  SELECT doc_id, {GEO_ZONE} AS zone_id FROM pts
) WHERE zone_id IS NOT NULL"""

# BigTIFF (magic 43) ingest: same oracle as geotiff_ingest — the
# 64-bit-offset header layout must not change a single pixel.
SQL["geotiff_ingest_big"] = f"""WITH {COO}
SELECT y, x, CAST(value AS BIGINT) AS value FROM coo"""

# zonal.zonal_ivm_apply: incremental zonal maintenance — the oracle is
# the closed-form base+delta recompute (identical for additive sums).
SQL["zonal_ivm"] = f"""WITH {COO},
zz AS (SELECT y, x, value, CAST({RECT_ZONE} AS BIGINT) AS id FROM coo),
base AS (SELECT id, sum(value) AS s, count(*) AS c FROM zz GROUP BY id),
delta AS (
  SELECT CAST({RECT_ZONE} AS BIGINT) AS id,
         ((y * {RASTER_W} + x) * 31) % 11 AS dv
  FROM coo WHERE (y * {RASTER_W} + x) % 97 = 0
),
dsum AS (SELECT id, sum(dv) AS ds FROM delta GROUP BY id)
SELECT base.id,
       CAST(base.s + COALESCE(dsum.ds, 0) AS BIGINT) AS sum_value,
       CAST(base.c AS BIGINT) AS count_value,
       CAST(base.s + COALESCE(dsum.ds, 0) AS DOUBLE)
         / CAST(base.c AS DOUBLE) AS avg_value
FROM base LEFT JOIN dsum ON dsum.id = base.id"""

# text.lang_confusion: lang_id prediction vs labeled lang, per-actual
# recall shares — reuses the lang_id SQL as a CTE.
SQL["lang_confusion"] = f"""WITH pred AS ({SQL["lang_id"]}),
j AS (
  SELECT d.lang AS lang_actual, p.lang_pred
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
),
per AS (SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM j GROUP BY 1, 2)
SELECT lang_actual, lang_pred, n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY lang_actual) AS DOUBLE)
         AS recall_share
FROM per"""

# text.proximity_search: 'table ... key' within slop=2 (w2 strictly
# after w1, gap in [1, 3]).
SQL["proximity_search"] = """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
p AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tokv
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
),
a AS (SELECT doc_id, pos AS apos FROM p WHERE tokv = 'table'),
b AS (SELECT doc_id, pos FROM p WHERE tokv = 'key')
SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(b.pos - a.apos) AS BIGINT) AS min_gap
FROM a JOIN b ON b.doc_id = a.doc_id
             AND b.pos BETWEEN a.apos + 1 AND a.apos + 3
GROUP BY a.doc_id"""

# temporal.event_cooccurrence: ordered event-type pairs within 5 min —
# the plain per-user self-join oracle (buckets only change the plan).
SQL["event_cooccurrence"] = """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM e a JOIN e b ON b.user_id = a.user_id
 AND b.t - a.t > 0 AND b.t - a.t <= 300000000
GROUP BY 1, 2"""

# pixel.coregister_shift vs the wrap-shifted twin raster: per-offset
# exact agreement counts; zero-match offsets emit no row on both sides.
SQL["coregister"] = f"""WITH {COO},
hh AS (SELECT count(*) // {RASTER_W} AS h FROM events),
b AS (
  SELECT y, x,
         ((((y + 1) % hh.h) * {RASTER_W} + (x + 2) % {RASTER_W})
           * {VALUE_MULT}) % {VALUE_MOD} AS vb
  FROM coo, hh
),
ac AS (SELECT y, x, value FROM coo),
sh AS (SELECT a.dy, b2.dx
       FROM (VALUES (-2),(-1),(0),(1),(2)) a(dy),
            (VALUES (-2),(-1),(0),(1),(2)) b2(dx)),
m AS (
  SELECT sh.dy, sh.dx, CAST(count(*) AS BIGINT) AS n_match
  FROM sh, ac a, b
  WHERE b.y = a.y + sh.dy AND b.x = a.x + sh.dx AND b.vb = a.value
  GROUP BY sh.dy, sh.dx
)
SELECT CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx, n_match,
       row_number() OVER (ORDER BY n_match DESC, dy, dx) = 1 AS is_best
FROM m"""

# temporal.path_rasterize: integer-DDA supercover walk of each
# consecutive trajectory step on the 18000-milli-degree cell grid.
# greatest(s, 1) in the denominator mirrors the Spark guard: at s = 0
# the sign factor is 0, so the division value never matters.
SQL["path_cells"] = """WITH pts AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 180000) // 18000 AS cy,
         ((event_id * 9973) % 360000) // 18000 AS cx
  FROM events
),
st AS (
  SELECT user_id,
         lag(cy) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cy0,
         lag(cx) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cx0,
         cy, cx
  FROM pts
),
seg AS (
  SELECT cy0, cx0, cy - cy0 AS dy, cx - cx0 AS dx,
         greatest(abs(cy - cy0), abs(cx - cx0)) AS s
  FROM st WHERE cy0 IS NOT NULL
),
cells AS (
  SELECT seg.cy0
           + (CASE WHEN dy < 0 THEN -1 WHEN dy > 0 THEN 1 ELSE 0 END)
           * ((2 * g.t * abs(dy) + s) // (2 * greatest(s, 1))) AS cy,
         seg.cx0
           + (CASE WHEN dx < 0 THEN -1 WHEN dx > 0 THEN 1 ELSE 0 END)
           * ((2 * g.t * abs(dx) + s) // (2 * greatest(s, 1))) AS cx
  FROM seg, LATERAL unnest(generate_series(0, seg.s)) AS g(t)
)
SELECT CAST(cy AS BIGINT) AS cy, CAST(cx AS BIGINT) AS cx,
       count(*) AS n_visits
FROM cells GROUP BY 1, 2"""

# temporal.coverage_gaps: fixed 50x100 grid anti-joined against the
# distinct visited cells.
SQL["coverage_gaps"] = """WITH grid AS (
  SELECT gy.cy, gx.cx
  FROM unnest(generate_series(0, 49)) AS gy(cy),
       unnest(generate_series(0, 99)) AS gx(cx)
),
visited AS (
  SELECT DISTINCT ((event_id * 7919) % 180000) // 3600 AS cy,
                  ((event_id * 9973) % 360000) // 3600 AS cx
  FROM events
)
SELECT CAST(g.cy AS BIGINT) AS cy, CAST(g.cx AS BIGINT) AS cx
FROM grid g
WHERE NOT EXISTS (
  SELECT 1 FROM visited v WHERE v.cy = g.cy AND v.cx = g.cx
)"""

# knn.colocation_pairs: distinct user-cell memberships on the
# 9000-milli-degree grid, hub cells (> 15 distinct users) dropped
# BEFORE pairing (cap mirrored from the Spark side), pairs sharing
# >= 10 surviving cells.
SQL["colocation_pairs"] = """WITH uc AS (
  SELECT DISTINCT user_id,
         ((event_id * 7919) % 180000) // 9000 AS cy,
         ((event_id * 9973) % 360000) // 9000 AS cx
  FROM events
),
kept AS (
  SELECT uc.* FROM uc
  JOIN (
    SELECT cy, cx FROM uc GROUP BY cy, cx HAVING count(*) <= 15
  ) k USING (cy, cx)
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       count(*) AS n_shared
FROM kept a JOIN kept b
  ON a.cy = b.cy AND a.cx = b.cx AND a.user_id < b.user_id
GROUP BY 1, 2
HAVING count(*) >= 10"""

# temporal.funnel_steps: per-user earliest strictly-increasing
# signup->view->click->purchase chain.  The oracle uses the recursive
# chained-min definition (stage i = min ts of type i strictly after the
# stage i-1 time), which the engine's greedy sorted fold equals: any
# valid chain's k-th element is >= the greedy one's, so the greedy
# chain exists iff any chain exists and is pointwise minimal.
SQL["funnel_chain"] = """WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_view
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s0.t_signup
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t_view
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_click
  GROUP BY e.user_id
)
SELECT s0.user_id, s0.t_signup, s1.t_view, s2.t_click, s3.t_purchase
FROM s0 JOIN s1 ON s0.user_id = s1.user_id
        JOIN s2 ON s0.user_id = s2.user_id
        JOIN s3 ON s0.user_id = s3.user_id"""

# curation.longest_prefix_join: the oracle states the longest-prefix
# SPEC declaratively — a rule matches iff it is "/" or equals the path
# or is a segment-boundary prefix (path starts with prefix + "/") — and
# picks the argmax by prefix length (tie-free: all matches for one url
# are prefixes of its path, hence distinct lengths).  The engine's
# bounded prefix-explosion + broadcast equi-join must agree exactly.
SQL["robots_gate"] = """WITH urls AS (
  SELECT doc_id,
         'h' || (doc_id % 20) || '.example' AS host,
         '/s' || (doc_id % 7) || '/t' || (doc_id % 5) ||
         CASE WHEN doc_id % 3 = 0 THEN '/p' || (doc_id % 11) ELSE '' END AS path
  FROM documents
),
rules AS (
  SELECT 'h' || t.k || '.example' AS host, r.prefix AS prefix, r.allow AS allow
  FROM range(20) t(k),
  LATERAL (VALUES ('/', t.k % 2 = 0),
                  ('/s' || (t.k % 7), false),
                  ('/s' || ((t.k + 1) % 7) || '/t' || (t.k % 5), true)
          ) r(prefix, allow)
),
m AS (
  SELECT u.doc_id, r.prefix, r.allow
  FROM urls u JOIN rules r
    ON u.host = r.host
   AND (r.prefix = '/' OR u.path = r.prefix
        OR starts_with(u.path, r.prefix || '/'))
),
best AS (
  SELECT doc_id, max_by(prefix, length(prefix)) AS rule_prefix,
         max_by(allow, length(prefix)) AS allow
  FROM m GROUP BY doc_id
)
SELECT u.doc_id, u.host, u.path, b.rule_prefix,
       coalesce(b.allow, true) AS allow
FROM urls u LEFT JOIN best b ON u.doc_id = b.doc_id"""

# curation.host_split: the polynomial host hash is the SAME fold in
# both engines — Spark F.aggregate over split chars, DuckDB list_reduce
# (list_prepend supplies the init accumulator) — verified to agree
# character-for-character; sums cast to BIGINT (DuckDB sum(bigint) is
# otherwise HUGEINT).
SQL["host_split"] = """WITH d AS (
  SELECT doc_id, 'h' || (doc_id % 20) || '.example' AS host, n_chars
  FROM documents
),
h AS (
  SELECT host, n_chars,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(host)),
                            i -> CAST(ascii(substr(host, i, 1)) AS BIGINT))),
           (a, c) -> (a * 31 + c) % 1000003) % 10 AS m
  FROM d
)
SELECT CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM h GROUP BY 1"""

# curation.crawl_schedule: slot = per-host row_number (doc_id order) - 1
SQL["crawl_schedule"] = """WITH urls AS (
  SELECT doc_id, 'h' || (doc_id % 20) || '.example' AS host FROM documents
),
delays AS (
  SELECT 'h' || t.k || '.example' AS host,
         CAST(1 + (t.k % 5) AS BIGINT) AS delay_s
  FROM range(20) t(k)
)
SELECT u.doc_id, u.host,
       CAST(row_number() OVER w - 1 AS INTEGER) AS slot,
       CAST((row_number() OVER w - 1) * d.delay_s AS BIGINT) AS fetch_at_s
FROM urls u JOIN delays d ON u.host = d.host
WINDOW w AS (PARTITION BY u.host ORDER BY u.doc_id)"""

# curation.pareto_frontier: strict 2-D dominance — a doc survives iff
# no other doc has BOTH strictly larger q (distinct tokens) and n
# (chars); computed as per-q max(n) then a running strict max over the
# reduced q levels (ROWS ... 1 PRECEDING = strictly-greater q, levels
# are distinct).
SQL["pareto_docs"] = """WITH m AS (
  SELECT doc_id,
         CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS q,
         CAST(length(text) AS BIGINT) AS n
  FROM documents
),
best AS (SELECT q, max(n) AS best_n FROM m GROUP BY q),
strict AS (
  SELECT q, max(best_n) OVER (ORDER BY q DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dom_n
  FROM best
)
SELECT m.doc_id, m.q, m.n
FROM m JOIN strict ON m.q = strict.q
WHERE strict.dom_n IS NULL OR m.n > strict.dom_n"""

# pip.hilbert_cell_col: identical Morton-quad fold through the 4-state
# Hilbert orientation machine (state*4+quad LUTs are the shared
# constants pip.HILBERT_DLUT/TLUT); list_prepend supplies the (d=0,
# t=0) init accumulator, quads run MSB-first.
SQL["hilbert_cell"] = f"""WITH {PTS},
g AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 0.01) AS BIGINT) AS cx,
         CAST(floor((lat + 90.0) / 0.01) AS BIGINT) AS cy
  FROM pts
)
SELECT doc_id,
  list_reduce(
    list_prepend({{'d': CAST(0 AS BIGINT), 't': 0}},
      list_transform(generate_series(0, 15),
        i -> {{'d': CAST(2 * ((cx // (1 << (15 - i))) % 2)
                        + ((cy // (1 << (15 - i))) % 2) AS BIGINT),
               't': 0}})),
    (acc, e) -> {{
      'd': acc.d * 4 + [0,1,3,2, 0,3,1,2, 2,1,3,0, 2,3,1,0]
                         [acc.t * 4 + CAST(e.d AS INTEGER) + 1],
      't': [1,0,2,0, 0,3,1,1, 2,2,0,3, 3,1,3,2]
             [acc.t * 4 + CAST(e.d AS INTEGER) + 1]}}
  ).d AS hcell
FROM g"""

from scidbgeo_spark.operators.knn import GEO_KM_PER_DEG, geo_row_scales  # noqa: E402

# knn.distance_join_geo: brute-force cross join under the SAME banded
# equirectangular metric.  The per-row km-per-lon-degree LUT is
# computed ONCE in Python (111.32 * cos folded driver-side) and
# embedded as repr() literals — repr round-trips doubles exactly, so
# neither engine evaluates any trig AND each term is a single multiply
# of identical doubles (a triple product lets DuckDB reassociate the
# constant through the array extract and drift the last ulp off
# Spark's left-assoc evaluation).
# the "e0" suffix forces DuckDB to type each element DOUBLE — a bare
# decimal repr becomes DECIMAL[], and DuckDB's decimal->double
# conversion is not correctly rounded (observed 1-ulp drift)
_GEO_LONKM = "[" + ", ".join(
    (lambda r: r + ("" if "e" in r else "e0"))(repr(GEO_KM_PER_DEG * s))
    for s in geo_row_scales(15.0)
) + "]"
SQL["distance_join_geo"] = f"""WITH {PTS},
q AS (
  SELECT n_nationkey AS q_id,
         -180.0 + ((n_nationkey * 77777) % 360000) / 1000.0 AS qlon,
         -90.0 + ((n_nationkey * 33333) % 180000) / 1000.0 AS qlat
  FROM nation WHERE n_nationkey < 10
),
s AS (
  SELECT p.doc_id, q.q_id,
         (p.lat - q.qlat) * 111.32 AS dlat_km,
         (p.lon - q.qlon)
           * ({_GEO_LONKM}[CAST(least(floor((p.lat + 90.0) / 15.0), 11)
                          AS INTEGER) + 1]) AS dlon_km
  FROM pts p CROSS JOIN q
)
SELECT doc_id, q_id, dlat_km * dlat_km + dlon_km * dlon_km AS dist_km2
FROM s
WHERE dlat_km * dlat_km + dlon_km * dlon_km <= 2250000.0"""

# pixel.regrid_area: identical integer overlap-weight arithmetic; the
# single num/den division is the only float op on either side.
SQL["regrid_area"] = f"""WITH {COO},
ey AS (
  SELECT c.x, c.value, g.ty,
         least(c.y * 4 + 4, (g.ty + 1) * 5) - greatest(c.y * 4, g.ty * 5) AS wy
  FROM coo c, LATERAL unnest(generate_series((c.y * 4) // 5,
                                             (c.y * 4 + 3) // 5)) g(ty)
),
ex AS (
  SELECT e.ty, g.tx, e.value,
         e.wy * (least(e.x * 4 + 4, (g.tx + 1) * 5)
                 - greatest(e.x * 4, g.tx * 5)) AS w
  FROM ey e, LATERAL unnest(generate_series((e.x * 4) // 5,
                                            (e.x * 4 + 3) // 5)) g(tx)
)
SELECT ty AS y, tx AS x,
       CAST(sum(value * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS value_avg
FROM ex GROUP BY 1, 2"""

# temporal.interval_join: brute-force containment theta join — the
# engine's bucket replication must recover exactly this pair set.
SQL["interval_join"] = """WITH iv AS (
  SELECT t.k AS iv_id,
         1704067200000000 + ((t.k * 6133) % 720) * 3600000000 AS t0_us,
         1704067200000000 + ((t.k * 6133) % 720) * 3600000000
           + (1 + t.k % 4) * 3600000000 AS t1_us
  FROM range(40) t(k)
)
SELECT e.event_id, e.user_id, iv.iv_id, epoch_us(e.ts) AS t_us
FROM events e JOIN iv
  ON epoch_us(e.ts) >= iv.t0_us AND epoch_us(e.ts) < iv.t1_us"""

# temporal.theil_sen: identical dense-spine pairwise-slope median; the
# 167-hour window makes the pair count odd so median is an exact
# middle element in both engines (no interpolation arithmetic).
SQL["theil_sen"] = """WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
),
mx AS (SELECT max(h) AS hmax FROM base),
counts AS (
  SELECT event_type, (SELECT hmax FROM mx) - h AS age, count(*) AS cnt
  FROM base WHERE h > (SELECT hmax FROM mx) - 167
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM counts),
spine AS (
  SELECT t.event_type, g.age
  FROM types t, LATERAL unnest(generate_series(0, 166)) g(age)
),
dense AS (
  SELECT s.event_type, s.age, coalesce(c.cnt, 0) AS cnt
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.age = c.age
),
pairs AS (
  SELECT a.event_type, (a.cnt - b.cnt) / (b.age - a.age) AS slope
  FROM dense a JOIN dense b
    ON a.event_type = b.event_type AND a.age < b.age
)
SELECT event_type, median(slope) AS slope_per_hour,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1"""

# temporal.decayed_counts: same exact integer-numerator trick; the
# numerator sum is a BIGINT (cast guards DuckDB's hugeint sum).
SQL["decayed_counts"] = """WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
),
mx AS (SELECT max(h) AS hmax FROM base),
aged AS (
  SELECT event_type,
         least((SELECT hmax FROM mx) - h, 40) AS age
  FROM base
)
SELECT event_type,
       CAST(sum(CAST(1 AS BIGINT) << (40 - age)) AS DOUBLE)
         / 1099511627776.0 AS decayed,
       CAST(count(*) AS BIGINT) AS n_events
FROM aged GROUP BY 1"""

# pip.quadtree_split: the same one-pass monotone-count formulation —
# ancestor prefixes per point, (r, cell) counts, shallowest eligible
# ancestor via min(r) (the cell follows functionally from (doc, r)).
SQL["quadtree_split"] = f"""WITH {PTS},
z AS (SELECT doc_id, CAST({_zbits} AS BIGINT) AS z16 FROM pts),
lv AS (
  SELECT doc_id, g.r, z16 >> CAST(2 * (16 - g.r) AS INTEGER) AS cell
  FROM z, LATERAL unnest(generate_series(4, 16)) g(r)
),
counts AS (SELECT r, cell, count(*) AS n FROM lv GROUP BY 1, 2),
elig AS (
  SELECT l.doc_id, l.r, l.cell
  FROM lv l JOIN counts c ON l.r = c.r AND l.cell = c.cell
  WHERE c.n <= 20 OR l.r = 16
),
leaf AS (
  SELECT doc_id, min(r) AS res, min_by(cell, r) AS cell
  FROM elig GROUP BY doc_id
)
SELECT CAST(res AS INTEGER) AS res, cell,
       CAST(count(*) AS BIGINT) AS n_points
FROM leaf GROUP BY 1, 2"""

# knn.rect_join: brute-force overlap theta join — the engine's
# responsible-cell dedup must reproduce exactly this pair set, each
# pair once.
SQL["rect_join"] = """WITH a AS (
  SELECT doc_id AS a_id,
         (doc_id * 9973) % 340000 AS ax0,
         (doc_id * 7919) % 160000 AS ay0,
         (doc_id * 9973) % 340000 + 100 + (doc_id % 199) * 100 AS ax1,
         (doc_id * 7919) % 160000 + 100 + (doc_id % 193) * 100 AS ay1
  FROM documents
),
b AS (
  SELECT t.k AS b_id,
         (t.k * 77777) % 340000 AS bx0,
         (t.k * 33333) % 160000 AS by0,
         (t.k * 77777) % 340000 + (1 + t.k % 4) * 5000 AS bx1,
         (t.k * 33333) % 160000 + (1 + t.k % 5) * 4000 AS by1
  FROM range(60) t(k)
)
SELECT a.a_id, b.b_id
FROM a JOIN b
  ON a.ax0 <= b.bx1 AND b.bx0 <= a.ax1
 AND a.ay0 <= b.by1 AND b.by0 <= a.ay1"""

# pip.hilbert_block_range: the oracle verifies SEMANTICS independently
# (range == the same lon/lat box as zorder_range_count).
SQL["hilbert_range_count"] = SQL["zorder_range_count"]

from scidbgeo_spark.operators.text import BM25_K1P1, BM25_K1B, BM25_K1_1B  # noqa: E402

# text.bm25_topk: identical association order per binary float op; the
# pre-folded constants are injected from the SAME Python floats with
# the e0 suffix (a bare '0.5' is DECIMAL(2,1) in DuckDB and decimal
# arithmetic drifts the compare — same hazard as distance_join_geo).
_B25 = {
    "k1p1": f"{BM25_K1P1!r}e0",
    "k11b": f"{BM25_K1_1B!r}e0",
    "k1b": f"{BM25_K1B!r}e0",
}
SQL["bm25_topk"] = f"""WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tq AS (SELECT * FROM toks WHERE term IN ('hash', 'join', 'vector')),
tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM tq GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
           / count(*) AS avgdl
  FROM documents
),
scored AS (
  SELECT tf.doc_id, tf.term,
         (((st.n_docs - dfq.df) + 0.5e0) / (dfq.df + 0.5e0))
         * ((tf.tf * {_B25["k1p1"]})
            / (tf.tf + ({_B25["k11b"]} + (tf.dl * {_B25["k1b"]}) / st.avgdl)))
           AS s
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st
),
pv AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'hash' THEN s END) AS s0,
         sum(CASE WHEN term = 'join' THEN s END) AS s1,
         sum(CASE WHEN term = 'vector' THEN s END) AS s2,
         count(*) AS n_hit
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       ((0.0e0 + coalesce(s0, 0.0e0)) + coalesce(s1, 0.0e0))
         + coalesce(s2, 0.0e0) AS score,
       CAST(n_hit AS BIGINT) AS n_hit
FROM pv
ORDER BY score DESC, doc_id
LIMIT 20"""

# zonal.zonal_weighted: exact long numerator/denominator, one division,
# NULL on zero weight mass; ragged tail rows -> -999 like the rect
# zonal family.
SQL["zonal_weighted"] = f"""WITH cm AS (
  SELECT event_id // {RASTER_W} AS y,
         event_id % {RASTER_W} AS x,
         (event_id * {VALUE_MULT}) % {VALUE_MOD} AS va,
         (event_id * {VALUE_MULT_B}) % {VALUE_MOD_B} AS vb
  FROM events
),
g AS (
  SELECT CAST(CASE
           WHEN y >= (((SELECT count(*) FROM events) // {RASTER_W}) // {ZONE_H}) * {ZONE_H}
           THEN -999
           ELSE (y // {ZONE_H}) * {NZX} + (x // {ZONE_W}) END AS BIGINT) AS id,
         CAST(sum(va * vb) AS BIGINT) AS wsum,
         CAST(sum(vb) AS BIGINT) AS wtot,
         CAST(count(*) AS BIGINT) AS n
  FROM cm GROUP BY 1
)
SELECT id, wsum, wtot, n,
       CASE WHEN wtot > 0 THEN wsum / wtot END AS wavg
FROM g"""

# pixel.gaussian_blur: the oracle deliberately uses the DIRECT 9-fan
# 2-D form where the engine runs two separable 1-D passes — the exact
# match pins the separability identity itself.
SQL["gaussian_blur"] = f"""WITH {COO},
dims AS (SELECT (SELECT count(*) FROM events) // {RASTER_W} AS h),
sc AS (
  SELECT c.y + wy.d AS y, c.x + wx.d AS x,
         c.value * (wy.wt * wx.wt) AS v
  FROM coo c,
       dims,
       (VALUES (-1, 1), (0, 2), (1, 1)) wy(d, wt),
       (VALUES (-1, 1), (0, 2), (1, 1)) wx(d, wt)
  WHERE c.y + wy.d >= 0 AND c.y + wy.d < dims.h
    AND c.x + wx.d >= 0 AND c.x + wx.d < {RASTER_W}
)
SELECT y, x, CAST(sum(v) AS BIGINT) AS blur16
FROM sc GROUP BY 1, 2"""

# pixel.matmul_coo: identical relational form over the same synthetic
# operands.
SQL["matmul"] = """WITH a AS (
  SELECT t.k // 50 AS i, t.k % 50 AS k2, (t.k * 2654435761) % 97 - 48 AS v
  FROM range(3000) t(k)
),
b AS (
  SELECT t.k // 40 AS k2, t.k % 40 AS j, (t.k * 2246822519) % 89 - 44 AS w
  FROM range(2000) t(k)
)
SELECT a.i, b.j, CAST(sum(a.v * b.w) AS BIGINT) AS val
FROM a JOIN b ON a.k2 = b.k2
GROUP BY 1, 2"""

# temporal.events_ohlc: row_number twins under the same total order;
# all four value outputs are PICKED doubles, no float arithmetic.
SQL["events_ohlc"] = """WITH base AS (
  SELECT event_type, event_id, ts, value,
         epoch_us(ts) // 900000000 AS bkt
  FROM events
),
rn AS (
  SELECT event_type, bkt, value,
         row_number() OVER (PARTITION BY event_type, bkt
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type, bkt
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM base
)
SELECT event_type, bkt,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rd = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM rn GROUP BY 1, 2"""

# q_orc_ingest: the oracle aggregates the SAME rows straight from
# parquet — the ORC round-trip must be invisible.
SQL["orc_ingest"] = """SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents GROUP BY 1"""


# ---- HITS hubs/authorities (graph.host_hits) -----------------------------
# Same 2 max-normalized half-step pairs as operators.graph.hits, unrolled;
# the SCALE*raw product runs in HUGEINT where Spark uses decimal(38,0) —
# both floor the nonnegative quotient.
from scidbgeo_spark.operators.graph import HITS_ITERS, HITS_SCALE  # noqa: E402


def _hits_iter(prev_a: str, i: str) -> str:
    return f"""hr_{i} AS (
  SELECT e.src AS node, CAST(sum(e.w * a.s) AS BIGINT) AS raw
  FROM edges e JOIN a_{prev_a} a ON a.node = e.dst GROUP BY e.src
),
hm_{i} AS (SELECT greatest(max(raw), 1) AS mx FROM hr_{i}),
h_{i} AS (
  SELECT n.node,
         CAST((CAST({HITS_SCALE} AS HUGEINT) * coalesce(r.raw, 0)) // m.mx
              AS BIGINT) AS s
  FROM nodes n CROSS JOIN hm_{i} m LEFT JOIN hr_{i} r ON r.node = n.node
),
ar_{i} AS (
  SELECT e.dst AS node, CAST(sum(e.w * h.s) AS BIGINT) AS raw
  FROM edges e JOIN h_{i} h ON h.node = e.src GROUP BY e.dst
),
am_{i} AS (SELECT greatest(max(raw), 1) AS mx FROM ar_{i}),
a_{i} AS (
  SELECT n.node,
         CAST((CAST({HITS_SCALE} AS HUGEINT) * coalesce(r.raw, 0)) // m.mx
              AS BIGINT) AS s
  FROM nodes n CROSS JOIN am_{i} m LEFT JOIN ar_{i} r ON r.node = n.node
)"""


_HITS_CTES = ",\n".join(
    _hits_iter(str(i), str(i + 1)) for i in range(HITS_ITERS)
)

SQL["host_hits"] = f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
),
edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
  )
),
a_0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS s FROM nodes),
{_HITS_CTES}
SELECT h.node AS source, h.s AS hub_scaled, a.s AS auth_scaled
FROM h_{HITS_ITERS} h JOIN a_{HITS_ITERS} a USING (node)"""


# ---- anchor-text aggregation (graph.anchor_text_agg) ---------------------
from scidbgeo_spark.operators.graph import ANCHOR_WORDS  # noqa: E402

SQL["anchor_text_agg"] = f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
links AS (
  SELECT (d.doc_id * 7 + 3) % nd.n_docs AS dst_doc,
         array_to_string(list_slice(string_split(d.text, ' '), 1, {ANCHOR_WORDS}), ' ')
           AS anchor
  FROM documents d CROSS JOIN nd
),
per AS (
  SELECT t.source AS host, l.anchor, CAST(count(*) AS BIGINT) AS c
  FROM links l JOIN documents t ON t.doc_id = l.dst_doc
  GROUP BY 1, 2
),
rk AS (
  SELECT host, anchor, c,
         row_number() OVER (PARTITION BY host ORDER BY c DESC, anchor ASC) AS rn
  FROM per
)
SELECT host, CAST(sum(c) AS BIGINT) AS n_links,
       CAST(count(*) AS BIGINT) AS n_anchors,
       max(CASE WHEN rn = 1 THEN anchor END) AS top_anchor,
       CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top_count
FROM rk GROUP BY host"""


# ---- time-weighted average (temporal.time_weighted_avg) ------------------
# LOCF weighting: each observation's weight is its holding duration in
# epoch microseconds; the last observation per user holds nothing.  Values
# are nonnegative, so Spark's DIV (truncate) and // (floor) agree.
SQL["time_weighted_avg"] = """WITH s AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(sum(cents * dur_us) AS BIGINT) AS twa_num,
       CAST(sum(dur_us) AS BIGINT) AS twa_den,
       CAST(sum(cents * dur_us) // sum(dur_us) AS BIGINT) AS twa_cents
FROM s WHERE dur_us IS NOT NULL
GROUP BY user_id HAVING sum(dur_us) > 0"""


# ---- SimHash recall gauge (dedup.simhash_recall) --------------------------
SQL["simhash_recall"] = f"""WITH
exact AS (SELECT a, b FROM ({SQL["ngram_jaccard_pairs"]})),
approx AS (SELECT a, b FROM ({SQL["simhash_dup_pairs"]}))
SELECT count(*) AS n_exact,
       count(ap.a) AS n_recovered,
       count(ap.a) / count(*) AS recall
FROM exact e LEFT JOIN approx ap ON e.a = ap.a AND e.b = ap.b"""


# ---- bigram-LM fluency score (text.bigram_lm_score) -----------------------
from scidbgeo_spark.operators.text import LM2_SCALE  # noqa: E402

SQL["bigram_lm_score"] = f"""WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id,
         {_MD5INT.format(x="t[i]")} AS h1,
         {_MD5INT.format(x="t[i] || ' ' || t[i+1]")} AS h2
  FROM tok, lateral (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
),
c2 AS (SELECT h1, h2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT h1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
st AS (
  SELECT h2, (c2.c2 * {LM2_SCALE}) // c1.c1 AS p_scaled
  FROM c2 JOIN c1 USING (h1)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(p_scaled) AS BIGINT) AS sum_p,
       CAST(sum(p_scaled) // count(*) AS BIGINT) AS lm2_score
FROM bg JOIN st USING (h2) GROUP BY doc_id"""


# ---- curriculum shards (curation.curriculum_shards) -----------------------
# The oracle states the SPEC (one row_number per shard over the
# short-to-long order); the engine runs the decomposed bucket-count +
# prefix + intra-bucket rank plan — same function, different physical
# strategy, which is exactly what the value-hash pins.
from scidbgeo_spark.operators.curation import (  # noqa: E402
    CUR_A,
    CUR_B,
    CUR_P,
    CUR_SHARDS,
)

_CUR_SHARD = f"(doc_id * {CUR_A} + {CUR_B}) % {CUR_P} % {CUR_SHARDS}"
SQL["curriculum_shards"] = f"""SELECT doc_id,
       CAST({_CUR_SHARD} AS BIGINT) AS shard,
       CAST(row_number() OVER (
          PARTITION BY {_CUR_SHARD}
          ORDER BY n_chars, doc_id) AS BIGINT) AS pos
FROM documents"""


# ---- zonal IQR + Tukey-fence outliers (q_zonal_iqr) -----------------------
SQL["zonal_iqr"] = f"""WITH {COO},
z AS (SELECT CAST({RECT_ZONE} AS BIGINT) AS id, value FROM coo),
q AS (
  SELECT id, quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.75) AS p75
  FROM z GROUP BY 1
)
SELECT q.id, q.p25, q.p75, q.p75 - q.p25 AS iqr,
       CAST(coalesce(sum(CASE
         WHEN z.value < q.p25 - 1.5 * (q.p75 - q.p25)
           OR z.value > q.p75 + 1.5 * (q.p75 - q.p25) THEN 1 END), 0)
         AS BIGINT) AS n_outliers
FROM q JOIN z USING (id) GROUP BY 1, 2, 3, 4"""


# ---- geohash cell (pip.geohash_cell_col) ----------------------------------
from scidbgeo_spark.operators.pip import GEOHASH_B32, GEOHASH_BITS  # noqa: E402

_GH_SCALE = 1 << GEOHASH_BITS
_gh_bits = " + ".join(
    f"(((qx >> {j}) & 1) << {2 * j + 1}) + (((qy >> {j}) & 1) << {2 * j})"
    for j in range(GEOHASH_BITS)
)
_gh_chars = " || ".join(
    f"substr('{GEOHASH_B32}', CAST(((gcell >> {25 - 5 * c}) & 31) + 1 AS INT), 1)"
    for c in range(6)
)
SQL["geohash_cell"] = f"""WITH {PTS},
q AS (
  SELECT doc_id,
         least(CAST(floor((lon + 180.0) / 360.0 * {_GH_SCALE}) AS BIGINT),
               {_GH_SCALE - 1}) AS qx,
         least(CAST(floor((lat + 90.0) / 180.0 * {_GH_SCALE}) AS BIGINT),
               {_GH_SCALE - 1}) AS qy
  FROM pts
),
c AS (SELECT doc_id, CAST({_gh_bits} AS BIGINT) AS gcell FROM q)
SELECT doc_id, gcell, {_gh_chars} AS gh FROM c"""


# ---- distributed Douglas-Peucker (temporal.trajectory_simplify) -----------
# The engine's data-parallel recursion levels unrolled as CTEs: one
# argmax (QUALIFY row_number) + one reassignment join per level, both
# bounded at DP_MAX_ROUNDS on BOTH engines, squares in HUGEINT where
# Spark runs decimal(38,0).
from scidbgeo_spark.operators.temporal import (  # noqa: E402
    DP_EPS,
    DP_MAX_ROUNDS,
)


def _dp_round(p: str, i: str) -> str:
    return f"""sc_{i} AS MATERIALIZED (
  SELECT user_id, s, e, idx, py, px, sy, sx, ey, ex,
         CAST((ex - sx) * (py - sy) - (ey - sy) * (px - sx) AS HUGEINT) AS cr,
         CAST((ex - sx) * (ex - sx) + (ey - sy) * (ey - sy) AS HUGEINT) AS len2
  FROM a_{p}
),
best_{i} AS MATERIALIZED (
  SELECT user_id, s, e, idx AS m_idx, py AS my, px AS mx2,
         cr * cr AS c2, {DP_EPS * DP_EPS} * len2 AS thr
  FROM sc_{i}
  QUALIFY row_number() OVER (PARTITION BY user_id, s, e
                             ORDER BY cr * cr DESC, idx ASC) = 1
),
sp_{i} AS MATERIALIZED (SELECT * FROM best_{i} WHERE c2 > thr),
k_{i} AS MATERIALIZED (SELECT user_id, idx FROM k_{p}
          UNION ALL SELECT user_id, m_idx FROM sp_{i}),
a_{i} AS MATERIALIZED (
  SELECT a.user_id,
         CASE WHEN a.idx < t.m_idx THEN a.s ELSE t.m_idx END AS s,
         CASE WHEN a.idx < t.m_idx THEN t.m_idx ELSE a.e END AS e,
         a.idx, a.py, a.px,
         CASE WHEN a.idx < t.m_idx THEN a.sy ELSE t.my END AS sy,
         CASE WHEN a.idx < t.m_idx THEN a.sx ELSE t.mx2 END AS sx,
         CASE WHEN a.idx < t.m_idx THEN t.my ELSE a.ey END AS ey,
         CASE WHEN a.idx < t.m_idx THEN t.mx2 ELSE a.ex END AS ex
  FROM a_{p} a JOIN sp_{i} t USING (user_id, s, e)
  WHERE a.idx <> t.m_idx
)"""


_DP_CTES = ",\n".join(
    _dp_round(str(i), str(i + 1)) for i in range(DP_MAX_ROUNDS)
)

SQL["trajectory_simplify"] = f"""WITH pts AS MATERIALIZED (
  SELECT user_id,
         CAST((event_id * 7919) % 180000 AS BIGINT) AS py,
         CAST((event_id * 9973) % 360000 AS BIGINT) AS px,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1 AS BIGINT) AS idx
  FROM events
),
ends AS MATERIALIZED (SELECT user_id, max(idx) AS mx FROM pts GROUP BY 1),
k_0 AS MATERIALIZED (
  SELECT DISTINCT user_id, idx FROM (
    SELECT user_id, CAST(0 AS BIGINT) AS idx FROM ends
    UNION ALL SELECT user_id, mx FROM ends)
),
a_0 AS MATERIALIZED (
  SELECT p.user_id, CAST(0 AS BIGINT) AS s, en.mx AS e, p.idx, p.py, p.px,
         s0.py AS sy, s0.px AS sx, e1.py AS ey, e1.px AS ex
  FROM pts p
  JOIN ends en USING (user_id)
  JOIN pts s0 ON s0.user_id = p.user_id AND s0.idx = 0
  JOIN pts e1 ON e1.user_id = p.user_id AND e1.idx = en.mx
  WHERE p.idx > 0 AND p.idx < en.mx
),
{_DP_CTES}
SELECT k.user_id, k.idx, p.py, p.px
FROM k_{DP_MAX_ROUNDS} k JOIN pts p USING (user_id, idx)"""


# ---- k-means cluster quality (similarity.cluster_quality) -----------------
from scidbgeo_spark.operators.similarity import KMEANS_SCALE as _KQ_SCALE  # noqa: E402
from scidbgeo_spark.operators.similarity import DIM as _KQ_DIM  # noqa: E402

SQL["cluster_quality"] = f"""WITH asg AS (
  SELECT vec_id, cluster FROM ({SQL["kmeans_assign"]})
),
e AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {_KQ_SCALE})::BIGINT) AS sv
  FROM embeddings
),
m AS (SELECT a.cluster, e.sv FROM asg a JOIN e USING (vec_id)),
per AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(list_reduce(list_transform(sv, x -> x * x),
                              (p, q) -> p + q)) AS BIGINT) AS ssq
  FROM m GROUP BY 1
),
dims AS (
  SELECT cluster, i AS dim, CAST(sum(sv[i]) AS BIGINT) AS s
  FROM m, lateral (SELECT unnest(range(1, {_KQ_DIM} + 1)) AS i)
  GROUP BY 1, 2
),
sn AS (SELECT cluster, sum(CAST(s AS HUGEINT) * s) AS snorm2 FROM dims GROUP BY 1)
SELECT p.cluster, p.n, p.ssq,
       CAST(CAST(p.n AS HUGEINT) * p.ssq - sn.snorm2 AS DOUBLE) AS wcss_num,
       CAST((CAST(p.n AS HUGEINT) * p.ssq - sn.snorm2)
            // (CAST(p.n AS HUGEINT) * p.n) AS BIGINT) AS msd
FROM per p JOIN sn USING (cluster)"""


# ---- cross-source duplication matrix (q_dup_source_matrix) ----------------
SQL["dup_source_matrix"] = f"""WITH pr AS (
  SELECT a, b FROM ({SQL["minhash_dup_pairs"]})
),
m AS (SELECT a % 100000 AS oa, b % 100000 AS ob FROM pr),
j AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b
  FROM m JOIN documents da ON da.doc_id = m.oa
         JOIN documents db ON db.doc_id = m.ob
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1, 2"""


# ---- cell skew profile (q_cell_skew_stats) --------------------------------
SQL["cell_skew_stats"] = f"""WITH {PTS},
counts AS (
  SELECT CAST(floor(lat + 90) * 360 + floor(lon + 180) AS BIGINT) AS cell,
         CAST(count(*) AS BIGINT) AS c
  FROM pts GROUP BY 1
),
r AS (SELECT c, row_number() OVER (ORDER BY c, cell) AS rk FROM counts)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(c) AS BIGINT) AS n_points,
       CAST(max(c) AS BIGINT) AS max_cell_n,
       CAST(2 * sum(rk * c) - (count(*) + 1) * sum(c) AS BIGINT) AS gini_num,
       CAST(count(*) * sum(c) AS BIGINT) AS gini_den,
       CAST(2 * sum(rk * c) - (count(*) + 1) * sum(c) AS DOUBLE)
         / CAST(count(*) * sum(c) AS DOUBLE) AS gini
FROM r"""


# ---- trajectory segmentation + OD flows (temporal) ------------------------
from scidbgeo_spark.operators.temporal import OD_CELL, SEG_JUMP2  # noqa: E402

SQL["trajectory_segments"] = f"""WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 180000 AS py,
         (event_id * 9973) % 360000 AS px
  FROM events
),
s AS (
  SELECT user_id, py, px, ts, event_id,
         py - lag(py) OVER w AS dy,
         px - lag(px) OVER w AS dx
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
b AS (
  SELECT *, CASE WHEN dy IS NULL OR dy*dy + dx*dx > {SEG_JUMP2}
                 THEN 1 ELSE 0 END AS brk
  FROM s
),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS seg_id
  FROM b
)
SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id,
       CAST(count(*) AS BIGINT) AS n_pts,
       CAST(coalesce(sum(CASE WHEN brk = 0 THEN dy*dy + dx*dx END), 0)
            AS BIGINT) AS path_len2,
       CAST(max(py) - min(py) AS BIGINT) AS bbox_h,
       CAST(max(px) - min(px) AS BIGINT) AS bbox_w
FROM g GROUP BY 1, 2"""

_OD_NX = 360000 // OD_CELL
SQL["od_flows"] = f"""WITH t AS (
  SELECT lag(((event_id * 7919) % 180000) // {OD_CELL} * {_OD_NX}
             + ((event_id * 9973) % 360000) // {OD_CELL})
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS o_cell,
         ((event_id * 7919) % 180000) // {OD_CELL} * {_OD_NX}
           + ((event_id * 9973) % 360000) // {OD_CELL} AS d_cell
  FROM events
)
SELECT CAST(o_cell AS BIGINT) AS o_cell, CAST(d_cell AS BIGINT) AS d_cell,
       CAST(count(*) AS BIGINT) AS n_trips
FROM t WHERE o_cell IS NOT NULL AND o_cell <> d_cell
GROUP BY 1, 2"""


# ---- cell dwell heat map (temporal.cell_dwell) ----------------------------
SQL["cell_dwell"] = f"""WITH s AS (
  SELECT ((event_id * 7919) % 180000) // {OD_CELL} * {_OD_NX}
           + ((event_id * 9973) % 360000) // {OD_CELL} AS cell,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(sum(dur_us) AS BIGINT) AS dwell_us,
       CAST(count(*) AS BIGINT) AS n_visits
FROM s WHERE dur_us IS NOT NULL GROUP BY 1"""


# ---- SimHash precision gauge (dedup.simhash_precision) --------------------
SQL["simhash_precision"] = f"""WITH {CORPUS}, {SHINGLES}, {HV64},
pr AS (SELECT a, b FROM ({SQL["simhash_dup_pairs"]})),
sc AS (
  SELECT CASE WHEN len(list_intersect(l.hs, r.hs))
                   / (len(l.hs) + len(r.hs) - len(list_intersect(l.hs, r.hs)))
                 >= 0.5
              THEN 1 ELSE 0 END AS hit
  FROM pr JOIN hv64 l ON l.doc_id = pr.a JOIN hv64 r ON r.doc_id = pr.b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(hit) AS BIGINT) AS n_true,
       sum(hit) / count(*) AS prec
FROM sc"""


# ---- winding-number vs even-odd PIP (pip.winding_join) --------------------
from scidbgeo_spark.operators.pip import winding_zone_edges  # noqa: E402

_W_EDGES = ",\n         ".join(
    f"({zid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})"
    for zid, x1, y1, x2, y2 in winding_zone_edges()
)
SQL["pip_poly_winding"] = f"""WITH {PTS},
edges(zone_id, x1, y1, x2, y2) AS (
  VALUES {_W_EDGES}
),
c AS (
  SELECT p.doc_id, e.zone_id,
         CASE WHEN e.y1 <= p.lat AND p.lat < e.y2
                   AND (e.x2 - e.x1) * (p.lat - e.y1)
                     - (p.lon - e.x1) * (e.y2 - e.y1) > 0 THEN 1
              WHEN e.y2 <= p.lat AND p.lat < e.y1
                   AND (e.x2 - e.x1) * (p.lat - e.y1)
                     - (p.lon - e.x1) * (e.y2 - e.y1) < 0 THEN -1
              ELSE 0 END AS w
  FROM pts p CROSS JOIN edges e
),
g AS (SELECT doc_id, zone_id, sum(w) AS wn, sum(abs(w)) AS cr
      FROM c GROUP BY 1, 2)
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       CAST(sum(CASE WHEN wn <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_winding,
       CAST(sum(CASE WHEN cr % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_evenodd
FROM g GROUP BY 1"""


# ---- band correlation matrix (temporal.band_correlation) ------------------
from scidbgeo_spark.model import BANDS as _BC_BANDS  # noqa: E402

_bc_pairs = [
    (i, j) for i in range(_BC_BANDS) for j in range(i + 1, _BC_BANDS)
]
_bc_pivot = ",\n         ".join(
    f"max(CASE WHEN band = {b} THEN value END) AS b{b}"
    for b in range(_BC_BANDS)
)
_bc_sums = ",\n         ".join(
    f"CAST(sum(b{i} * b{j}) AS BIGINT) AS sxy_{i}_{j},"
    f" CAST(sum(b{i}) AS BIGINT) AS sx_{i}_{j},"
    f" CAST(sum(b{j}) AS BIGINT) AS sy_{i}_{j},"
    f" CAST(sum(b{i} * b{i}) AS BIGINT) AS sxx_{i}_{j},"
    f" CAST(sum(b{j} * b{j}) AS BIGINT) AS syy_{i}_{j}"
    for i, j in _bc_pairs
)


def _bc_row(i: int, j: int) -> str:
    n, sx, sy = "CAST(n AS HUGEINT)", f"sx_{i}_{j}", f"sy_{i}_{j}"
    num = f"CAST({n} * sxy_{i}_{j} - CAST({sx} AS HUGEINT) * {sy} AS DOUBLE)"
    vx = f"CAST({n} * sxx_{i}_{j} - CAST({sx} AS HUGEINT) * {sx} AS DOUBLE)"
    vy = f"CAST({n} * syy_{i}_{j} - CAST({sy} AS HUGEINT) * {sy} AS DOUBLE)"
    den = f"(sqrt({vx}) * sqrt({vy}))"
    return (
        f"SELECT CAST({i} AS BIGINT) AS band_a, CAST({j} AS BIGINT) AS band_b,"
        f" n, CASE WHEN {den} > 0 THEN {num} / {den} END AS r FROM a"
    )


SQL["band_correlation"] = f"""WITH {COO3},
p AS (
  SELECT y, x,
         {_bc_pivot}
  FROM coo3 GROUP BY 1, 2
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {_bc_sums}
  FROM p
)
{" UNION ALL ".join(_bc_row(i, j) for i, j in _bc_pairs)}"""


# ---- outlink extraction (text.outlink_extract) ----------------------------
from scidbgeo_spark.operators.text import OUTLINK_RE  # noqa: E402

SQL["outlink_extract"] = f"""WITH pg AS (
  SELECT doc_id,
         'h' || (doc_id % 20) || '.example' AS own_host,
         '<html><body>'
           || '<a href="http://h' || ((doc_id * 3 + 1) % 20)
           || '.example/p' || (doc_id % 7) || '">x</a>'
           || CASE WHEN doc_id % 2 = 1
                   THEN '<a href="http://h' || (doc_id % 20)
                        || '.example/q' || (doc_id % 5) || '">y</a>'
                   ELSE '' END
           || text || '</body></html>' AS html
  FROM documents
),
h AS (
  SELECT doc_id, own_host,
         regexp_extract_all(html, '{OUTLINK_RE}', 1) AS hrefs
  FROM pg
)
SELECT doc_id, CAST(len(hrefs) AS BIGINT) AS n_links,
       hrefs[1] AS first_href,
       CAST(len(list_filter(hrefs,
            x -> NOT starts_with(x, 'http://' || own_host))) AS BIGINT)
         AS n_offsite
FROM h"""


# ---- boundary distance join (pip.boundary_distance_join) ------------------
from scidbgeo_spark.fixtures import GEO_POLYGONS as _BD_POLYS  # noqa: E402


def _bd_edges_values() -> str:
    rows = []
    for zid, ring in _BD_POLYS:
        r = [(float(x), float(y)) for x, y in ring]
        for i, (x1, y1) in enumerate(r):
            x2, y2 = r[(i + 1) % len(r)]
            rows.append(f"({int(zid)}, {i}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n         ".join(rows)


SQL["boundary_distance"] = f"""WITH {PTS},
edges(zone_id, eidx, x1, y1, x2, y2) AS (
  VALUES {_bd_edges_values()}
),
c AS (
  SELECT p.doc_id, e.zone_id, e.eidx,
         (e.x2 - e.x1) AS dx, (e.y2 - e.y1) AS dy,
         (p.lon - e.x1) AS pax, (p.lat - e.y1) AS pay,
         (p.lon - e.x2) AS pbx, (p.lat - e.y2) AS pby
  FROM pts p CROSS JOIN edges e
),
d AS (
  SELECT doc_id, zone_id, eidx,
         CASE WHEN dx * dx + dy * dy = 0 THEN pax * pax + pay * pay
              WHEN pax * dx + pay * dy <= 0 THEN pax * pax + pay * pay
              WHEN pax * dx + pay * dy >= dx * dx + dy * dy
                THEN pbx * pbx + pby * pby
              ELSE (dx * pay - dy * pax) * (dx * pay - dy * pax)
                   / (dx * dx + dy * dy)
         END AS d2
  FROM c
)
SELECT doc_id, d2, CAST(zone_id AS BIGINT) AS zone_id,
       CAST(eidx AS BIGINT) AS eidx
FROM d
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY d2, zone_id, eidx) = 1"""


# ---- MAD outlier screen (temporal.mad_outliers) ----------------------------
from scidbgeo_spark.operators.temporal import MAD_K  # noqa: E402

SQL["mad_outliers"] = f"""WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dv
  FROM events e JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad FROM dev GROUP BY 1)
SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
       max(d.med) AS med, max(m.mad) AS mad,
       CAST(sum(CASE WHEN d.dv > {MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type) GROUP BY 1"""


# ---- HLL per-source + merge (dedup.hll_by_source) --------------------------
SQL["hll_by_source"] = f"""WITH shd AS (
  SELECT source,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K} + 1, 1) + 1),
           i -> array_to_string(toks[i:i+{SHINGLE_K - 1}], ' '))) AS sh
  FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
),
vals AS (SELECT source, unnest(sh) AS v FROM shd),
hr AS (
  SELECT source, h % {HLL_M} AS reg,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_RANK_BITS + 1}
              ELSE {_HLL_RANK_BITS + 1} - length(bin(h >> {HLL_P})) END AS rank
  FROM (SELECT source, {_MD5INT.format(x='v')} AS h FROM vals)
),
regs AS (SELECT source, reg, max(rank) AS r FROM hr GROUP BY 1, 2),
mrg AS (SELECT 'ALL' AS source, reg, max(r) AS r FROM regs GROUP BY 2),
allr AS (SELECT * FROM regs UNION ALL SELECT * FROM mrg),
packed AS (
  SELECT source, list(r ORDER BY reg) AS rr,
         CAST(count(*) AS BIGINT) AS n_hit
  FROM allr GROUP BY 1
),
zt AS (
  SELECT source, n_hit,
         (list_reduce(list_transform(rr, r -> (1::BIGINT << ({_HLL_RANK_BITS + 1} - r)::INT)),
                      (a, b) -> a + b)
          + ({HLL_M} - n_hit) * (1::BIGINT << {_HLL_RANK_BITS + 1}))
         / (1::BIGINT << {_HLL_RANK_BITS + 1}) AS z
  FROM packed
)
SELECT source, n_hit AS n_registers_hit,
       ({HLL_ALPHA_EXPR}) * {HLL_M} * {HLL_M} / z AS hll_estimate
FROM zt"""


# ---- bilinear raster sampling at points (pixel.raster_sample_points) ------
# Same expression SHAPES as the Spark op so every double is bitwise:
# weights ((1-fy)*(1-fx)) etc., terms weight*value, one left-associated
# sum ((t00+t01)+t10)+t11.
SQL["raster_sample_points"] = f"""WITH {PTS}, {COO},
dims AS (SELECT ((count(*) // {RASTER_W}) - 1) AS hm1 FROM events),
base AS (
  SELECT p.doc_id,
         CAST(floor((p.lat + 90.0) / 180.0 * CAST(d.hm1 AS DOUBLE)) AS BIGINT) AS y0,
         CAST(floor((p.lon + 180.0) / 360.0 * {float(RASTER_W - 1)!r}) AS BIGINT) AS x0,
         (p.lat + 90.0) / 180.0 * CAST(d.hm1 AS DOUBLE)
           - floor((p.lat + 90.0) / 180.0 * CAST(d.hm1 AS DOUBLE)) AS fy,
         (p.lon + 180.0) / 360.0 * {float(RASTER_W - 1)!r}
           - floor((p.lon + 180.0) / 360.0 * {float(RASTER_W - 1)!r}) AS fx,
         d.hm1 AS hm1
  FROM pts p CROSS JOIN dims d
)
SELECT b.doc_id,
       ((  ((1.0 - b.fy) * (1.0 - b.fx)) * c00.value
         + ((1.0 - b.fy) * b.fx) * c01.value )
         + (b.fy * (1.0 - b.fx)) * c10.value )
         + (b.fy * b.fx) * c11.value AS v
FROM base b
JOIN coo c00 ON c00.y = b.y0 AND c00.x = b.x0
JOIN coo c01 ON c01.y = b.y0 AND c01.x = least(b.x0 + 1, {RASTER_W - 1})
JOIN coo c10 ON c10.y = least(b.y0 + 1, b.hm1) AND c10.x = b.x0
JOIN coo c11 ON c11.y = least(b.y0 + 1, b.hm1)
            AND c11.x = least(b.x0 + 1, {RASTER_W - 1})"""


# ---- CUSUM drift (temporal.cusum_max) --------------------------------------
SQL["cusum_max"] = """WITH c AS (
  SELECT event_type, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
m AS (SELECT event_type, sum(c) // count(*) AS k FROM c GROUP BY 1),
p AS (
  SELECT c.event_type, c.ts, c.event_id, m.k,
         sum(c.c) OVER w
           - row_number() OVER w * m.k AS p
  FROM c JOIN m USING (event_type)
  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.ts, c.event_id
               ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT event_type, k,
         p - least(0, min(p) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS s
  FROM p
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(k) AS BIGINT) AS k, CAST(max(s) AS BIGINT) AS cusum_max
FROM s GROUP BY 1"""


# ---- host assortativity (graph.host_assortativity) -------------------------
SQL["host_assortativity"] = f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
),
eu AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS (SELECT a, b FROM eu UNION ALL SELECT b AS a, a AS b FROM eu),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
j AS (
  SELECT da.d AS dx, db.d AS dy
  FROM sym JOIN deg da ON da.node = sym.a JOIN deg db ON db.node = sym.b
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dy * dy) AS BIGINT) AS syy
  FROM j
)
SELECT CAST(n // 2 AS BIGINT) AS n_edges,
       CASE WHEN sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
              * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) > 0
            THEN CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
       END AS r
FROM agg"""


# ---- coupling / co-citation (graph.host_coupling) --------------------------
SQL["host_coupling"] = f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN nd
  JOIN documents d2
    ON d2.doc_id = (d1.doc_id * 7 + 3) % nd.n_docs
    OR d2.doc_id = (d1.doc_id * d1.doc_id // 5 + 2) % nd.n_docs
),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
coup AS (
  SELECT l.src AS host_a, r.src AS host_b, CAST(count(*) AS BIGINT) AS n_coupled
  FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src
  GROUP BY 1, 2
),
coci AS (
  SELECT l.dst AS host_a, r.dst AS host_b, CAST(count(*) AS BIGINT) AS n_cocited
  FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst
  GROUP BY 1, 2
)
SELECT coalesce(cp.host_a, cc.host_a) AS host_a,
       coalesce(cp.host_b, cc.host_b) AS host_b,
       coalesce(cp.n_coupled, 0) AS n_coupled,
       coalesce(cc.n_cocited, 0) AS n_cocited
FROM coup cp FULL OUTER JOIN coci cc
  ON cp.host_a = cc.host_a AND cp.host_b = cc.host_b"""


# ---- diurnal profile (temporal.diurnal_profile) -----------------------------
SQL["diurnal_profile"] = """WITH g AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT)
           AS mean_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n, mean_cents,
       row_number() OVER (PARTITION BY event_type
                          ORDER BY n DESC, hour ASC) = 1 AS is_peak
FROM g"""


# ---- centroid separation (similarity.centroid_separation) ------------------
SQL["centroid_separation"] = f"""WITH asg AS (
  SELECT vec_id, cluster FROM ({SQL["kmeans_assign"]})
),
ev AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {_KQ_SCALE})::BIGINT) AS sv
  FROM embeddings
),
m AS (SELECT a.cluster, ev.sv FROM asg a JOIN ev USING (vec_id)),
dims AS (
  SELECT cluster, i AS dim, CAST(sum(sv[i]) AS BIGINT) AS s
  FROM m, lateral (SELECT unnest(range(1, {_KQ_DIM} + 1)) AS i)
  GROUP BY 1, 2
),
ns AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
da AS (SELECT d.cluster AS ca, d.dim, d.s AS sa, ns.n AS na
       FROM dims d JOIN ns USING (cluster)),
db AS (SELECT d.cluster AS cb, d.dim, d.s AS sb, ns.n AS nb
       FROM dims d JOIN ns USING (cluster)),
per AS (
  SELECT ca, cb,
         sum(CAST(sa * nb - sb * na AS HUGEINT)
             * CAST(sa * nb - sb * na AS HUGEINT)) AS num,
         max(na) AS na, max(nb) AS nb
  FROM da JOIN db USING (dim)
  WHERE ca < cb GROUP BY 1, 2
)
SELECT ca AS cluster_a, cb AS cluster_b,
       CAST(num AS DOUBLE) / CAST((na * nb) * (na * nb) AS DOUBLE) AS d2
FROM per"""


# ---- peak concurrency sweep (temporal.peak_concurrency) --------------------
SQL["peak_concurrency"] = """WITH m AS (
  SELECT event_type, user_id, event_id, ts, epoch_us(ts) AS t,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)
),
sx AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM m
),
sessions AS (
  SELECT event_type, user_id, sess,
         CAST(min(t) AS BIGINT) AS t0, CAST(max(t) + 1 AS BIGINT) AS t1
  FROM sx GROUP BY 1, 2, 3
),
deltas AS (
  SELECT event_type, t0 AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT event_type, t1 AS t, -1 AS d FROM sessions
),
swept AS (
  SELECT event_type, t,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS cur
  FROM deltas
),
best AS (
  SELECT event_type, CAST(cur AS BIGINT) AS peak, t AS t_peak_us
  FROM swept
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY cur DESC, t ASC) = 1
),
ns AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sessions
       FROM sessions GROUP BY 1)
SELECT ns.event_type, ns.n_sessions, b.peak, b.t_peak_us
FROM ns JOIN best b USING (event_type)"""


# ---- hourly lag-1 autocorrelation (temporal.hourly_acf) --------------------
SQL["hourly_acf"] = """WITH g AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM g GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM span
),
dense AS (
  SELECT s.event_type, s.h, coalesce(g.c, 0) AS c
  FROM spine s LEFT JOIN g ON g.event_type = s.event_type AND g.h = s.h
),
pairs AS (
  SELECT event_type, c,
         lead(c, 1) OVER (PARTITION BY event_type ORDER BY h) AS cn
  FROM dense
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(c) AS BIGINT) AS sx, CAST(sum(cn) AS BIGINT) AS sy,
         CAST(sum(c * cn) AS BIGINT) AS sxy,
         CAST(sum(c * c) AS BIGINT) AS sxx,
         CAST(sum(cn * cn) AS BIGINT) AS syy
  FROM pairs WHERE cn IS NOT NULL GROUP BY 1
)
SELECT event_type, n_pairs,
       CASE WHEN sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
              * sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) > 0
            THEN CAST(CAST(n_pairs AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
       END AS r
FROM agg"""


# ---- zonal argmax (zonal.zonal_argmax) --------------------------------------
SQL["zonal_argmax"] = f"""WITH {COO},
z AS (SELECT CAST({RECT_ZONE} AS BIGINT) AS id, y, x, value FROM coo)
SELECT id, CAST(value AS BIGINT) AS max_value,
       CAST(y AS BIGINT) AS max_y, CAST(x AS BIGINT) AS max_x
FROM z
QUALIFY row_number() OVER (PARTITION BY id
                           ORDER BY value DESC, y ASC, x ASC) = 1"""


# ---- inter-event-time histogram (temporal.iet_histogram) -------------------
SQL["iet_histogram"] = """WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       CASE WHEN gap <= 0 THEN CAST(-1 AS BIGINT)
            ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM g WHERE gap IS NOT NULL
GROUP BY 1, 2"""


# ---- downstream flow length (focal.flow_distance_coo) ----------------------
# Same acyclic D8 edge rule as watershed_basins; the recursive walk's
# max step count IS the sink distance (walks stop where no out-edge).
SQL["flow_distance"] = f"""WITH RECURSIVE {COO},
cand AS (
  SELECT a.y AS uy, a.x AS ux, b.y AS ty, b.x AS tx,
         row_number() OVER (PARTITION BY a.y, a.x
                            ORDER BY b.value, b.y, b.x) AS rn
  FROM coo a JOIN coo b
    ON b.y BETWEEN a.y - 1 AND a.y + 1
   AND b.x BETWEEN a.x - 1 AND a.x + 1
   AND NOT (b.y = a.y AND b.x = a.x)
  WHERE b.value < a.value
),
edges AS (SELECT uy, ux, ty, tx FROM cand WHERE rn = 1),
walk AS (
  SELECT y, x, y AS cy, x AS cx, 0 AS d FROM coo
  UNION ALL
  SELECT w.y, w.x, e.ty, e.tx, w.d + 1
  FROM walk w JOIN edges e ON e.uy = w.cy AND e.ux = w.cx
)
SELECT y, x, CAST(max(d) AS BIGINT) AS dist
FROM walk GROUP BY 1, 2"""


# ---- max drawdown (temporal.max_drawdown) -----------------------------------
SQL["max_drawdown"] = """WITH c AS (
  SELECT event_type, ts, event_id, epoch_us(ts) AS t,
         sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
),
dd AS (
  SELECT event_type, t,
         max(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - cum AS dd
  FROM c
),
best AS (
  SELECT event_type, CAST(dd AS BIGINT) AS max_drawdown,
         CAST(t AS BIGINT) AS t_at_us
  FROM dd
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY dd DESC, t ASC) = 1
),
ns AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dd GROUP BY 1)
SELECT ns.event_type, ns.n, b.max_drawdown, b.t_at_us
FROM ns JOIN best b USING (event_type)"""


# ---- quantile normalization (curation.quantile_normalize) -------------------
SQL["quantile_normalize"] = """WITH ns AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
ranked AS (
  SELECT d.doc_id, d.source,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY d.n_chars, d.doc_id) AS BIGINT)
           AS src_rank,
         ns.n_s, t.n_tot
  FROM documents d JOIN ns USING (source) CROSS JOIN tot t
),
gq AS (
  SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS g_rank,
         CAST(n_chars AS BIGINT) AS qn_score
  FROM documents
)
SELECT r.doc_id, r.source, r.src_rank, g.qn_score
FROM ranked r JOIN gq g
  ON g.g_rank = (r.src_rank * r.n_tot + r.n_s - 1) // r.n_s"""
