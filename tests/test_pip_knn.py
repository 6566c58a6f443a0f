"""PIP join + kNN correctness vs brute-force NumPy oracles."""

import numpy as np
from pyspark.sql import functions as F

from scidbgeo_spark import fixtures, model
from scidbgeo_spark.kernels import points_in_ring
from scidbgeo_spark.operators import knn as knn_mod
from scidbgeo_spark.operators import pip


def _points_numpy(n):
    ids = np.arange(n, dtype=np.int64)
    lon = -180.0 + ((ids * model.LON_MULT) % 360000) / 1000.0
    lat = -90.0 + ((ids * model.LAT_MULT) % 180000) / 1000.0
    hot = ids % model.HOT_MOD == 0
    lon[hot] = 10.0 + (ids[hot] % 100) / 1000.0
    lat[hot] = 10.0 + ((ids[hot] // model.HOT_MOD) % 100) / 1000.0
    return ids, lon, lat


def test_pip_join_vs_bruteforce(spark, sf_correct):
    pts = model.points(spark, sf_correct)
    n = pts.count()
    got = {
        (r.doc_id, r.zone_id)
        for r in pip.pip_join(spark, pts, fixtures.GEO_POLYGONS).collect()
    }
    ids, lon, lat = _points_numpy(n)
    want = set()
    for zid, ring in fixtures.GEO_POLYGONS:
        hit = points_in_ring(lon, lat, np.asarray(ring, dtype=np.float64))
        want |= {(int(i), zid) for i in ids[hit]}
    assert got == want
    assert len(got) > 0


def test_pip_grid_covers_all_points(spark, sf_correct):
    pts = model.points(spark, sf_correct)
    n = pts.count()
    counts = pip.pip_counts(spark, pts, fixtures.geo_grid_polygons()).collect()
    assert sum(r.n_points for r in counts) == n  # full partition of the world


def test_hot_cell_skew_exists(spark, sf_correct):
    """The fixture must actually be skewed (10% of points in one cell)."""
    pts = model.points(spark, sf_correct)
    n = pts.count()
    top = (
        pts.groupBy(pip.cell_col().alias("c"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] >= n // 10


def test_knn_vs_bruteforce(spark, sf_correct):
    pts = model.points(spark, sf_correct)
    queries = knn_mod.knn_queries_from_nation(spark, sf_correct)
    got = [(r.q_id, r.doc_id, r.rank) for r in knn_mod.knn(spark, pts, queries, k=10).collect()]
    n = pts.count()
    ids, lon, lat = _points_numpy(n)
    want = []
    for q in queries.collect():
        d2 = (lon - q.qlon) ** 2 + (lat - q.qlat) ** 2
        order = np.lexsort((ids, d2))[:10]
        want += [(q.q_id, int(ids[i]), rk + 1) for rk, i in enumerate(order)]
    assert sorted(got) == sorted(want)


def test_knn_bulk_equals_bruteforce(spark, sf_correct):
    pts = model.points(spark, sf_correct)
    queries = knn_mod.knn_queries_from_nation(spark, sf_correct, limit=25)
    got = sorted(
        (r.q_id, r.doc_id, r.rank)
        for r in knn_mod.knn_join_bulk(spark, pts, queries, k=10).collect()
    )
    n = pts.count()
    ids, lon, lat = _points_numpy(n)
    want = []
    for q in queries.collect():
        d2 = (lon - q.qlon) ** 2 + (lat - q.qlat) ** 2
        order = np.lexsort((ids, d2))[:10]
        want += [(q.q_id, int(ids[i]), rk + 1) for rk, i in enumerate(order)]
    assert got == sorted(want)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert df.columns == ["id", "min_value", "max_value", "avg_value", "count_value"]
    assert len(rows) >= 1
    assert set(e.oracle_sql()) <= set(e.queries())
