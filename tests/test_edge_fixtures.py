"""Edge-of-domain fixture sweep (r5 verdict item 5): the friendly driver
fixtures never exercise single-event hours, <3-point tracks, constant
bands, empty/single-token docs or single-doc sources — exactly where the
round-5 ADVICE bugs hid.  These tests run ENGINE vs DUCKDB-ORACLE on a
degenerate synthetic sf dir (schema-matched parquet written by DuckDB,
like the driver's own fixtures) and assert exact equality, reusing the
driver-gate comparison from tools/check_oracle.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(modname, relpath):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(_REPO, relpath)
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


entrymod = _load("__spark_entry__", "__spark_entry__.py")
checker = _load("check_oracle_mod", "tools/check_oracle.py")


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    """Degenerate events + documents parquet, DuckDB-written so the
    physical parquet types match the driver fixtures."""
    d = str(tmp_path_factory.mktemp("edge_sf"))
    con = duckdb.connect()
    # events: type 'solo' = ONE event (single hour, 1-point track);
    # 'two' = two events, one user, two points (sub-3-point track),
    # 2 h apart; 'busy' = a real series over 6 hours / 3 users.
    rows = ["(0, TIMESTAMP '2024-01-01 00:00:00', 1, 'solo', 1.0, 'p=1')"]
    rows.append("(7, TIMESTAMP '2024-01-02 03:00:00', 2, 'two', 2.0, 'p=1')")
    rows.append("(14, TIMESTAMP '2024-01-02 05:00:00', 2, 'two', 2.0, 'p=2')")
    k = 20
    for i in range(30):
        hr, mn = i % 6, (i * 7) % 60
        rows.append(
            f"({k + i}, TIMESTAMP '2024-01-03 {hr:02d}:{mn:02d}:00', "
            f"{3 + i % 3}, 'busy', {float(i % 5)}, 'p={i}')"
        )
    con.execute(
        f"""COPY (
            SELECT CAST(c0 AS BIGINT) AS event_id, CAST(c1 AS TIMESTAMP) AS ts,
                   CAST(c2 AS BIGINT) AS user_id, CAST(c3 AS VARCHAR) AS event_type,
                   CAST(c4 AS DOUBLE) AS value, CAST(c5 AS VARCHAR) AS props
            FROM (VALUES {', '.join(rows)}) t(c0, c1, c2, c3, c4, c5)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)"""
    )
    # documents: empty text, single token, repeated phrase twins, a
    # single-doc source ('rare'), and a uniform-length source so
    # quantile ranks tie.
    docs = [
        (0, "", "en", "web"),
        (1, "hello", "en", "web"),
        (2, "the cat sat on the mat again and again", "en", "web"),
        (3, "the cat sat on the mat again and again", "de", "web"),
        (4, "one single doc in its own source", "fr", "rare"),
        (5, "same length aa", "en", "web"),
        (6, "same length bb", "en", "web"),
    ]
    vals = ", ".join(
        f"({i}, '{t}', '{lg}', '{src}', {len(t)})" for i, t, lg, src in docs
    )
    con.execute(
        f"""COPY (
            SELECT CAST(c0 AS BIGINT) AS doc_id, CAST(c1 AS VARCHAR) AS text,
                   CAST(c2 AS VARCHAR) AS lang, CAST(c3 AS VARCHAR) AS source,
                   CAST(c4 AS BIGINT) AS n_chars
            FROM (VALUES {vals}) t(c0, c1, c2, c3, c4)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    return d


EDGE_QUERIES = [
    "hourly_acf",        # single-hour type: zero lag pairs
    "diurnal_profile",   # one-event hour profile
    "theil_sen",         # single dense hour -> no pairwise slopes
    "iet_histogram",     # single event: no inter-event gap
    "peak_concurrency",  # 1-session types
    "trajectory_simplify",  # 1- and 2-point tracks (below DP minimum)
    "band_correlation",  # tiny raster; sparse bands
    "quantile_normalize",  # n_s = 1 source; tied n_chars
    "bigram_lm_score",   # empty + single-token docs
    "boilerplate_spans",  # docs shorter than the span window
]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_engine_equals_oracle_on_degenerate_inputs(spark, edge_sf, name):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_sf}/{t}.parquet')"
        )
    got = qs[name](spark, edge_sf).toPandas()
    want = con.execute(sqls[name]).df()
    problems = checker.compare(name, got, want)
    problems = [p for p in problems if not p.startswith("NOTE")]
    assert not problems, problems
