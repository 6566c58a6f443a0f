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


def test_knn_bulk_rejects_non_dividing_cell(spark, sf_correct):
    """A cell size that doesn't divide 360/180 truncates the grid and
    collides edge cell ids — refused loudly (same guard as
    distance_join)."""
    import pytest

    pts = model.points(spark, sf_correct)
    queries = knn_mod.knn_queries_from_nation(spark, sf_correct, limit=2)
    with pytest.raises(ValueError, match="divide"):
        knn_mod.knn_join_bulk(spark, pts, queries, cell=7.0)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert df.columns == ["id", "min_value", "max_value", "avg_value", "count_value"]
    assert len(rows) >= 1
    assert set(e.oracle_sql()) <= set(e.queries())


def _synth_points(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(-180.0) + ((F.col("id") * 9973) % 360000) / F.lit(1000.0)).alias("lon"),
        (F.lit(-90.0) + ((F.col("id") * 7919) % 180000) / F.lit(1000.0)).alias("lat"),
    )


def test_knn_routes_large_query_sets_to_bulk(spark, sf_correct, monkeypatch):
    """Above BULK_ROUTE_THRESHOLD queries, knn() must delegate to the
    distributed bulk path instead of collecting the query side."""
    sentinel = object()
    called = {}

    def fake_bulk(s, pts, queries, k=10, **kw):
        called["k"] = k
        return sentinel

    monkeypatch.setattr(knn_mod, "knn_join_bulk", fake_bulk)
    pts = model.points(spark, sf_correct)
    queries = _synth_points(spark, knn_mod.BULK_ROUTE_THRESHOLD + 10).select(
        F.col("doc_id").alias("q_id"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
    )
    assert knn_mod.knn(spark, pts, queries, k=7) is sentinel
    assert called["k"] == 7


def test_knn_bulk_hundred_thousand_queries(spark):
    """10^5-query bulk kNN: certification must stay distributed (semi/anti
    joins) — the driver sees only per-round emptiness booleans.  Validated
    by invariants on the full output plus a brute-force NumPy check on a
    sample of queries."""
    n_pts, n_q, k = 200_000, 100_000, 1
    pts = _synth_points(spark, n_pts)
    queries = spark.range(n_q).select(
        F.col("id").alias("q_id"),
        (F.lit(-180.0) + ((F.col("id") * 31337) % 360000) / F.lit(1000.0)).alias("qlon"),
        (F.lit(-90.0) + ((F.col("id") * 27644437) % 180000) / F.lit(1000.0)).alias("qlat"),
    )
    out = knn_mod.knn_join_bulk(spark, pts, queries, k=k, cell=1.0)
    rows = out.collect()
    assert len(rows) == n_q * k
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert len(per_q) == n_q
    assert all(sorted(v) == list(range(1, k + 1)) for v in per_q.values())

    # exact spot-check vs brute force on 20 deterministic queries
    import numpy as np

    ids = np.arange(n_pts, dtype=np.int64)
    lon = -180.0 + ((ids * 9973) % 360000) / 1000.0
    lat = -90.0 + ((ids * 7919) % 180000) / 1000.0
    got = {r.q_id: r.doc_id for r in rows if r.q_id % 5000 == 0}
    for q in queries.filter(F.col("q_id") % 5000 == 0).collect():
        d2 = (lon - q.qlon) ** 2 + (lat - q.qlat) ** 2
        best = ids[np.lexsort((ids, d2))[0]]
        assert got[q.q_id] == int(best), q.q_id


def test_pip_join_df_matches_broadcast_path(spark, sf_correct):
    """DataFrame-layer PIP == driver-list PIP on the same polygons, via
    both join strategies."""
    pts = model.points(spark, sf_correct)
    want = sorted(
        (r.doc_id, r.zone_id)
        for r in pip.pip_join(spark, pts, fixtures.GEO_POLYGONS).collect()
    )
    poly = pip.polygons_df(spark, fixtures.GEO_POLYGONS)
    for mode in ("broadcast", "shuffle", "auto"):
        got = sorted(
            (r.doc_id, r.zone_id)
            for r in pip.pip_join_df(spark, pts, poly, mode=mode).collect()
        )
        assert got == want, mode


def test_pip_join_df_plan_strategy(spark, sf_correct):
    """broadcast mode must plan a BroadcastHashJoin; shuffle mode must
    not broadcast the candidate table (mode-2 vs mode-3 analog)."""
    pts = model.points(spark, sf_correct)
    poly = pip.polygons_df(spark, fixtures.GEO_POLYGONS)
    bc_plan = pip.pip_join_df(spark, pts, poly, mode="broadcast")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bc_plan
    sh_plan = pip.pip_join_df(spark, pts, poly, mode="shuffle")._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in sh_plan or "SortMergeJoin" in sh_plan


def test_pip_join_df_auto_runs_no_job(spark, sf_correct):
    """Strategy selection must be plan metadata only: building the auto-
    mode DataFrame (no action) may not launch any Spark job."""
    pts = model.points(spark, sf_correct)
    poly = pip.polygons_df(spark, fixtures.GEO_POLYGONS)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = pip.pip_join_df(spark, pts, poly, mode="auto")
    df.schema  # force analysis, still no job
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert df is not None


def test_pip_join_df_auto_caches_fanout_estimate(spark, sf_correct, tmp_path):
    """For a file-backed layer (real plan stats -> broadcast gate), the
    covering-cell fan-out aggregate may run at most once per layer
    object: the estimate caches on the DataFrame, so every later
    auto-mode plan build against the same (static) layer runs ZERO jobs
    — the prepared-layer usage pattern."""
    pts = model.points(spark, sf_correct)
    path = str(tmp_path / "layer.parquet")
    pip.polygons_df(spark, fixtures.GEO_POLYGONS).write.parquet(path)
    poly = spark.read.parquet(path)
    sc = spark.sparkContext
    first = pip.pip_join_df(spark, pts, poly, mode="auto")
    assert "BroadcastHashJoin" in (
        first._jdf.queryExecution().executedPlan().toString()
    )  # the gate actually engaged (file stats are known and small)
    group = "pip-auto-rebuild-probe"
    sc.setJobGroup(group, "plan-only probe")
    try:
        df = pip.pip_join_df(spark, pts, poly, mode="auto")
        df.schema  # force analysis, still no job
        assert sc.statusTracker().getJobIdsForGroup(group) == []
    finally:
        sc.setJobGroup(None, None)
    assert df.count() == first.count()


def test_pip_join_df_shuffle_keeps_rings_out_of_candidate_exchange(spark, sf_correct):
    """In shuffle mode the candidate join must move bare (zone_id, ccell)
    rows: no Exchange may carry the ring arrays together with the cell id
    (rings attach in the later zone-keyed join)."""
    import io
    import contextlib

    pts = model.points(spark, sf_correct)
    poly = pip.polygons_df(spark, fixtures.GEO_POLYGONS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pip.pip_join_df(spark, pts, poly, mode="shuffle").explain("formatted")
    lines = buf.getvalue().splitlines()
    n_exchanges = 0
    for i, line in enumerate(lines):
        if ") Exchange" in line:
            n_exchanges += 1
            inputs = lines[i + 1]  # "Input [n]: [cols]"
            assert "Input" in inputs
            assert not ("xs" in inputs and "ccell" in inputs), inputs
    assert n_exchanges >= 2  # candidate shuffle + ring-attach shuffle exist


def test_wkt_layer_roundtrip_exact(spark, tmp_path):
    """WKT serialize -> distributed parse recovers the exact binary64
    ring coordinates and the open-ring layout of polygons_df."""
    from scidbgeo_spark.sources import vector

    p = str(tmp_path / "layer.parquet")
    vector.write_wkt_fixture(p, fixtures.GEO_POLYGONS)
    got = {
        r.zone_id: (r.xs, r.ys)
        for r in vector.polygons_from_wkt(spark.read.parquet(p)).collect()
    }
    want = {
        r.zone_id: (r.xs, r.ys)
        for r in pip.polygons_df(spark, fixtures.GEO_POLYGONS).collect()
    }
    assert got == want  # exact doubles, closing vertex dropped


def test_geojson_layer_roundtrip_exact(spark):
    from scidbgeo_spark.sources import vector

    rows = [
        (int(z), vector.ring_to_geojson(ring)) for z, ring in fixtures.GEO_POLYGONS
    ]
    df = spark.createDataFrame(rows, "zone_id int, geometry string")
    got = {
        r.zone_id: (r.xs, r.ys)
        for r in vector.polygons_from_geojson(df).collect()
    }
    want = {
        r.zone_id: (r.xs, r.ys)
        for r in pip.polygons_df(spark, fixtures.GEO_POLYGONS).collect()
    }
    assert got == want


def test_pip_poly_wkt_matches_driver_list_path(spark, sf_correct, tmp_path):
    """End-to-end: PIP over the file-read WKT layer == PIP over the
    driver-list layer (the vector reader must not change join rows)."""
    from scidbgeo_spark.sources import vector

    p = str(tmp_path / "layer.parquet")
    vector.write_wkt_fixture(p, fixtures.GEO_POLYGONS)
    poly = vector.polygons_from_wkt(spark.read.parquet(p))
    pts = model.points(spark, sf_correct)
    got = sorted(
        (r.doc_id, r.zone_id)
        for r in pip.pip_join_df(spark, pts, poly).select("doc_id", "zone_id").collect()
    )
    want = sorted(
        (r.doc_id, r.zone_id)
        for r in pip.pip_join(spark, pts, fixtures.GEO_POLYGONS).collect()
    )
    assert got == want


def test_cell_rollup_pyramid_consistent(spark, sf_correct):
    """Parent-cell counts equal the sum of their children: the rollup is
    a true zoom pyramid, and every level sums to the point total."""
    from scidbgeo_spark import model
    from scidbgeo_spark.operators import pip

    pts = model.points(spark, sf_correct)
    n = pts.count()
    rows = pip.cell_rollup(pts).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r.res, {})[r.cell] = r.n_points
    assert set(by_res) == {4, 8, 16}
    for res in (4, 8, 16):
        assert sum(by_res[res].values()) == n
    # each res-16 cell's ancestor at res 8 accumulates exactly its count
    for cell, cnt in by_res[16].items():
        assert by_res[8][cell >> 16] >= cnt
    agg8 = {}
    for cell, cnt in by_res[16].items():
        agg8[cell >> 16] = agg8.get(cell >> 16, 0) + cnt
    assert agg8 == by_res[8]
    agg4 = {}
    for cell, cnt in by_res[8].items():
        agg4[cell >> 8] = agg4.get(cell >> 8, 0) + cnt
    assert agg4 == by_res[4]


def test_asof_join_semantics(spark):
    """As-of contract on crafted rows: equal timestamps MATCH
    (right_ts <= left_ts), the latest prior state wins, keys without a
    prior state stay null, and state does not leak across keys."""
    from scidbgeo_spark.operators import temporal

    left = spark.createDataFrame(
        [
            (1, 100, 5),  # after s1, before s2 -> s1
            (2, 100, 10),  # exactly at s2 -> s2 (>= semantics)
            (3, 100, 11),  # after s2 -> s2
            (4, 100, 1),  # before any state -> null
            (5, 200, 50),  # other key, no states at all -> null
        ],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(100, 2, 901), (100, 10, 902)],
        "user_id long, ts long, state_id long",
    )
    out = temporal.asof_join(left, right, on="user_id")
    got = {r.event_id: r.state_id for r in out.collect()}
    assert got == {1: 901, 2: 902, 3: 902, 4: None, 5: None}


def test_distance_join_matches_bruteforce(spark):
    """Cell-neighborhood range join equals brute force, including a pair
    exactly AT the radius (<=) and POIs whose discs straddle cell
    boundaries."""
    import numpy as np
    import pytest

    from scidbgeo_spark.operators import knn as knn_mod

    rng = np.random.default_rng(11)
    pts_rows = [
        (int(i), float(lo), float(la))
        for i, (lo, la) in enumerate(
            zip(rng.uniform(-179, 179, 300), rng.uniform(-89, 89, 300))
        )
    ] + [(1000, 30.0, 10.0)]  # exactly radius-12 below poi (30, 22)
    pois_rows = [(0, 30.0, 22.0), (1, -14.9, 0.1), (2, 178.0, 88.0)]
    pts = spark.createDataFrame(pts_rows, "doc_id long, lon double, lat double")
    pois = spark.createDataFrame(pois_rows, "q_id long, qlon double, qlat double")
    R = 12.0
    got = {
        (r.doc_id, r.q_id)
        for r in knn_mod.distance_join(pts, pois, radius=R).collect()
    }
    want = {
        (d, q)
        for d, lo, la in pts_rows
        for q, qlo, qla in pois_rows
        if (lo - qlo) ** 2 + (la - qla) ** 2 <= R * R
    }
    assert got == want
    assert (1000, 0) in got  # the exactly-at-radius pair is included
    with pytest.raises(ValueError, match="radius <= cell"):
        knn_mod.distance_join(pts, pois, radius=20.0)
    # non-default (finer) cell: grid dims must derive from THIS cell, not
    # the module-level CELL=15 constants — with NY/NX stale, edge clamps
    # invert and cell ids collide, silently dropping/adding pairs
    R2 = 4.0
    got_fine = {
        (r.doc_id, r.q_id)
        for r in knn_mod.distance_join(pts, pois, radius=R2, cell=5.0).collect()
    }
    want_fine = {
        (d, q)
        for d, lo, la in pts_rows
        for q, qlo, qla in pois_rows
        if (lo - qlo) ** 2 + (la - qla) ** 2 <= R2 * R2
    }
    assert got_fine == want_fine
    with pytest.raises(ValueError, match="divide"):
        knn_mod.distance_join(pts, pois, radius=4.0, cell=7.0)


def test_spatial_ops_survive_degenerate_inputs(spark):
    """Sweep: empty point/query/layer frames and a 2-vertex degenerate
    ring all complete with empty results — no crashes, no hangs (the
    knn certification loop must terminate on an empty table via its
    full-scan fallback)."""
    import numpy as np

    from scidbgeo_spark.operators import pip

    pts = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, -20.0, 5.0)], "doc_id long, lon double, lat double"
    )
    empty_pts = pts.limit(0)
    q1 = spark.createDataFrame([(0, 1.0, 1.0)], "q_id long, qlon double, qlat double")
    q0 = q1.limit(0)
    ring = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 30.0], [0.0, 30.0]])
    degenerate = np.array([[5.0, 5.0], [6.0, 6.0]])
    assert pip.pip_join(spark, empty_pts, [(1, ring)]).count() == 0
    assert pip.pip_join(spark, pts, [(1, degenerate)]).count() == 0
    assert (
        pip.pip_join_df(spark, pts, pip.polygons_df(spark, [(1, ring)]).limit(0)).count()
        == 0
    )
    assert knn_mod.knn(spark, pts, q0, k=2).count() == 0
    assert knn_mod.knn(spark, empty_pts, q1, k=2).count() == 0
    assert knn_mod.knn_join_bulk(spark, empty_pts, q1, k=2).count() == 0
    assert knn_mod.distance_join(pts, q0, radius=5.0).count() == 0


def test_spatial_joins_see_points_at_the_world_edge(spark):
    """A point at exactly (lon=180, lat=90) floors to a grid cell one
    past the edge; unclamped it could never match the clamped ring /
    replication side and silently vanished from knn and distance_join
    results.  The clamp maps it into the edge band where the exact
    distance math decides."""
    import numpy as np

    rng = np.random.default_rng(5)
    pts_rows = [
        (int(i), float(lo), float(la))
        for i, (lo, la) in enumerate(
            zip(rng.uniform(-179, 179, 100), rng.uniform(-89, 89, 100))
        )
    ] + [(500, 180.0, 90.0)]  # the edge point
    pts = spark.createDataFrame(pts_rows, "doc_id long, lon double, lat double")
    pois = spark.createDataFrame(
        [(0, 179.0, 89.5), (1, 180.0, 90.0)], "q_id long, qlon double, qlat double"
    )
    R = 3.0
    got = {
        (r.doc_id, r.q_id)
        for r in knn_mod.distance_join(pts, pois, radius=R).collect()
    }
    want = {
        (d, q)
        for d, lo, la in pts_rows
        for q, qlo, qla in [(0, 179.0, 89.5), (1, 180.0, 90.0)]
        if (lo - qlo) ** 2 + (la - qla) ** 2 <= R * R
    }
    assert got == want
    assert (500, 0) in got and (500, 1) in got
    # knn: the edge point must be reachable as a neighbor (both paths)
    queries = pois
    for fn in (
        lambda: knn_mod.knn(spark, pts, queries, k=5),
        lambda: knn_mod.knn_join_bulk(spark, pts, queries, k=5),
    ):
        res = {(r.q_id, r.doc_id) for r in fn().collect()}
        assert (0, 500) in res and (1, 500) in res


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas.merge_asof (backward direction,
    exact matches allowed — the same >= contract): keyed state carry,
    equal-timestamp matches, keys with no state, interleaved times."""
    import numpy as np
    import pandas as pd

    from scidbgeo_spark.operators import temporal

    rng = np.random.default_rng(42)
    for trial in range(4):
        n_l, n_r, n_keys = 120, 40, 6
        left = pd.DataFrame(
            {
                "event_id": np.arange(n_l),
                "user_id": rng.integers(0, n_keys, n_l),
                "ts": rng.integers(0, 500, n_l),
            }
        )
        right = (
            pd.DataFrame(
                {
                    "user_id": rng.integers(0, n_keys - 1, n_r),  # one key stateless
                    "ts": rng.integers(0, 500, n_r),
                    "state_id": np.arange(n_r) + 900,
                }
            )
            .drop_duplicates(["user_id", "ts"])  # unique per (key, ts): the contract
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts",
            by="user_id",
            direction="backward",
        )
        want_map = {
            int(r.event_id): (None if pd.isna(r.state_id) else int(r.state_id))
            for r in want.itertuples()
        }
        out = temporal.asof_join(
            spark.createDataFrame(left, "event_id long, user_id long, ts long"),
            spark.createDataFrame(right, "user_id long, ts long, state_id long"),
            on="user_id",
        )
        got = {int(r.event_id): r.state_id for r in out.collect()}
        assert got == want_map, f"trial {trial}"


def test_asof_join_rejects_state_column_collision(spark):
    """A right state column sharing a name with a left column would be
    silently nulled and overwritten by the carried value — the join must
    refuse instead."""
    import pytest

    from scidbgeo_spark.operators import temporal

    left = spark.createDataFrame(
        [(1, 100, 5, 7)], "event_id long, user_id long, ts long, state_id long"
    )
    right = spark.createDataFrame(
        [(100, 2, 901)], "user_id long, ts long, state_id long"
    )
    with pytest.raises(ValueError, match="state_id"):
        temporal.asof_join(left, right, on="user_id")


def test_zone_geometry_matches_numpy_shoelace(spark):
    """Per-ring area/centroid/bbox equal the NumPy shoelace reference on
    triangles, rects, an L-shape, and a degenerate (collinear) ring —
    which must yield area 0 and NULL centroid, not a division error."""
    from scidbgeo_spark.operators import regions

    ring_rows = [
        (1, 0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 2.0, 2.0]),  # rect 4x2
        (2, 0, [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]),  # triangle
        (3, 0, [0.0, 2.0, 4.0], [0.0, 0.0, 0.0]),  # collinear: degenerate
        (11, 0, [-120.0, -30.0, -30.0, -60.0, -60.0, -120.0],
                [-60.0, -60.0, -30.0, -30.0, 0.0, 0.0]),  # L-shape fixture
    ]
    df = spark.createDataFrame(
        ring_rows, "zone_id int, ring_no int, xs array<double>, ys array<double>"
    )
    got = {r["zone_id"]: r for r in regions.zone_geometry(df).collect()}

    def ref(xs, ys):
        xs, ys = np.asarray(xs), np.asarray(ys)
        j = np.roll(np.arange(len(xs)), -1)
        cr = xs * ys[j] - xs[j] * ys
        s2 = cr.sum()
        area = abs(s2) / 2
        if s2 == 0:
            return area, None, None
        cx = ((xs + xs[j]) * cr).sum() / (3 * s2)
        cy = ((ys + ys[j]) * cr).sum() / (3 * s2)
        return area, cx, cy

    for z, _rn, xs, ys in ring_rows:
        area, cx, cy = ref(xs, ys)
        r = got[z]
        assert r["area"] == area, z
        assert r["cx"] == cx and r["cy"] == cy, z
        assert r["n_vertices"] == len(xs)
        assert (r["min_x"], r["max_x"]) == (min(xs), max(xs))
        assert (r["min_y"], r["max_y"]) == (min(ys), max(ys))
    assert got[1]["area"] == 8.0 and got[1]["cx"] == 2.0 and got[1]["cy"] == 1.0
    assert got[3]["area"] == 0.0 and got[3]["cx"] is None


def test_knn_classify_matches_bruteforce_vote(spark, sf_correct):
    """Majority-vote labels equal a NumPy brute-force 10-NN + Counter
    majority with the same smallest-label tie-break."""
    from collections import Counter

    from scidbgeo_spark.operators import knn as knn_ops

    pts = model.points(spark, sf_correct)
    queries = knn_ops.knn_queries_from_nation(spark, sf_correct, limit=25)
    docs = model.load_table(spark, sf_correct, "documents")
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    got = {
        r["q_id"]: (r["label"], r["votes"])
        for r in knn_ops.knn_classify(spark, pts, queries, labels).collect()
    }

    p = pts.collect()
    lab = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    for q in queries.collect():
        d2 = sorted(
            ((r["lon"] - q["qlon"]) ** 2 + (r["lat"] - q["qlat"]) ** 2, r["doc_id"])
            for r in p
        )
        top = [lab[doc] for _, doc in d2[:10]]
        cnt = Counter(top)
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[q["q_id"]] == best, q["q_id"]


def test_quality_deciles_value_based_and_partition_invariant(spark):
    """Tied scores share a decile; decile counts follow the value-based
    cum-below formula; repartitioning the input changes nothing."""
    from scidbgeo_spark.operators import curation

    # 10 docs: 5 share one score key, 5 distinct
    rows = [(i, "common word " + ("x " * i).strip()) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["score_key"], r["decile"])
           for r in curation.quality_deciles(df).collect()}
    out2 = {r["doc_id"]: (r["score_key"], r["decile"])
            for r in curation.quality_deciles(df.repartition(7)).collect()}
    assert out == out2
    # same score key -> same decile, monotone in score
    by_key = {}
    for sk, d in out.values():
        by_key.setdefault(sk, set()).add(d)
    assert all(len(v) == 1 for v in by_key.values())
    keys = sorted(by_key)
    decs = [next(iter(by_key[k])) for k in keys]
    assert decs == sorted(decs)
    # exact formula on the collected keys
    import collections
    cnt = collections.Counter(sk for sk, _ in out.values())
    n = len(rows)
    for sk, d in out.values():
        cum_below = sum(v for k, v in cnt.items() if k < sk)
        assert d == (10 * cum_below) // n


def test_moran_i_vs_bruteforce(spark, sf_correct):
    """Exact-fraction Python twin: I = (n/W) * sum_adj z_i z_j / sum z_i^2
    over occupied 1-degree cells, queen adjacency — computed with
    Fraction so the comparison has no float slop beyond the engine's
    own final division."""
    from fractions import Fraction
    from math import floor

    pts = model.points(spark, sf_correct).collect()
    counts = {}
    for p in pts:
        c = (floor((p.lat + 90.0) / 10.0), floor((p.lon + 180.0) / 10.0))
        counts[c] = counts.get(c, 0) + 1
    n, s = len(counts), sum(counts.values())
    z = {c: n * x - s for c, x in counts.items()}
    num = w = 0
    for (cy, cx), za in z.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                zb = z.get((cy + dy, cx + dx))
                if zb is not None:
                    num += za * zb
                    w += 1
    den = sum(v * v for v in z.values())
    want = Fraction(n * num, w * den)

    row = knn_mod.moran_i(model.points(spark, sf_correct)).collect()[0]
    assert (row.n_cells, row.w_pairs) == (n, w)
    assert abs(row.moran_i - float(want)) < 1e-12
    # non-degenerate adjacency graph at the 10-degree default
    assert w > 100


def test_moran_i_one_degree_degenerates(spark, sf_correct):
    """At 1 degree the sf0.01 fixture has exactly two ordered adjacent
    pairs, both hot-cell/singleton, and I collapses to -1 exactly —
    the degeneracy that motivated the 10-degree default."""
    row = knn_mod.moran_i(model.points(spark, sf_correct), cell=1.0).collect()[0]
    assert row.w_pairs == 2 and row.moran_i == -1.0


def test_trajectory_stats_vs_python(spark, sf_smoke):
    """Pure-Python twin of the per-user trajectory rollup on the smoke
    events table: sort, difference, aggregate — exact integers."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want = {}
    byuser = {}
    for r in rows:
        byuser.setdefault(r.user_id, []).append(
            ((r.event_id * 7919) % 180000, (r.event_id * 9973) % 360000)
        )
    for u, ps in byuser.items():
        plen = sum(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for a, b in zip(ps[1:], ps[:-1])
        )
        want[u] = (
            len(ps),
            plen,
            (ps[-1][0] - ps[0][0]) ** 2 + (ps[-1][1] - ps[0][1]) ** 2,
            max(p[0] for p in ps) - min(p[0] for p in ps),
            max(p[1] for p in ps) - min(p[1] for p in ps),
        )
    got = {
        r.user_id: (r.n_pts, r.path_len2, r.net_disp2, r.bbox_h, r.bbox_w)
        for r in temporal.trajectory_stats(ev).collect()
    }
    assert got == want


def test_trajectory_rose_vs_python(spark, sf_smoke):
    """Pure-Python twin of the per-user 8-octant direction rose, plus
    the conservation identity: each user's rose sums to their step
    count (n_pts - 1 minus zero-length steps)."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    byuser = {}
    for r in rows:
        byuser.setdefault(r.user_id, []).append(
            ((r.event_id * 7919) % 180000, (r.event_id * 9973) % 360000)
        )
    want = {}
    steps_per_user = {}
    for u, ps in byuser.items():
        n_steps = 0
        for (y1, x1), (y0, x0) in zip(ps[1:], ps[:-1]):
            dy, dx = y1 - y0, x1 - x0
            if dy == 0 and dx == 0:
                continue
            n_steps += 1
            ady, adx = abs(dy), abs(dx)
            if dy < 0 and ady > adx:
                o = 0
            elif dy < 0 and dx > 0 and ady == adx:
                o = 1
            elif dx > 0 and adx > ady:
                o = 2
            elif dy > 0 and dx > 0 and ady == adx:
                o = 3
            elif dy > 0 and ady > adx:
                o = 4
            elif dy > 0 and dx < 0 and ady == adx:
                o = 5
            elif dx < 0 and adx > ady:
                o = 6
            else:
                o = 7
            want[(u, o)] = want.get((u, o), 0) + 1
        steps_per_user[u] = n_steps
    got = {
        (r.user_id, r.octant): r.n_steps
        for r in temporal.trajectory_rose(ev).collect()
    }
    assert got == want
    per_user = {}
    for (u, _o), n in got.items():
        per_user[u] = per_user.get(u, 0) + n
    assert per_user == {u: n for u, n in steps_per_user.items() if n > 0}


def test_local_moran_aggregates_to_global(spark, sf_correct):
    """Consistency identity: sum(local_num) over LISA cells ==
    moran_i's pair-sum numerator (each adjacent ordered pair appears
    exactly once in exactly one cell's lag), and n_nbrs sums to
    w_pairs."""
    lisa = knn_mod.local_moran(model.points(spark, sf_correct)).collect()
    glob = knn_mod.moran_i(model.points(spark, sf_correct)).collect()[0]
    assert sum(r.n_nbrs for r in lisa) == glob.w_pairs
    num = sum(r.nz * r.lag_nz for r in lisa)
    # reconstruct the global I from the exact local parts
    n = glob.n_cells
    den = None
    pts = model.points(spark, sf_correct).collect()
    from math import floor

    counts = {}
    for p in pts:
        c = (floor((p.lat + 90.0) / 10.0), floor((p.lon + 180.0) / 10.0))
        counts[c] = counts.get(c, 0) + 1
    s = sum(counts.values())
    den = sum((n * x - s) ** 2 for x in counts.values())
    assert abs(glob.moran_i - (n * num) / (glob.w_pairs * den)) < 1e-12


def test_gi_star_vs_bruteforce(spark, sf_correct):
    """Exact Python twin of the Gi* z-map: integer interior recomputed
    with arbitrary-precision ints, the z-score with math.sqrt in the
    engine's own operation order — bit-identical expected values."""
    from math import floor, sqrt

    pts = model.points(spark, sf_correct).collect()
    counts = {}
    for p in pts:
        c = (floor((p.lat + 90.0) / 10.0), floor((p.lon + 180.0) / 10.0))
        counts[c] = counts.get(c, 0) + 1
    n = len(counts)
    s = sum(counts.values())
    s2 = sum(x * x for x in counts.values())
    a = n * s2 - s * s
    want = {}
    for (cy, cx), x in counts.items():
        w = sum_nbr = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xb = counts.get((cy + dy, cx + dx))
                if xb is not None:
                    w += 1
                    sum_nbr += xb
        num = n * sum_nbr - s * w
        z = (
            num / (sqrt(a) * sqrt((w * (n - w)) / (n - 1)))
            if n > 1 and w < n and a > 0
            else None
        )
        want[(cy, cx)] = (x, w, sum_nbr, float(num), z)
    got = {
        (r.cy, r.cx): (r.x, r.w_nbrs, r.sum_nbr, r.gi_num, r.gi_z)
        for r in knn_mod.gi_star(model.points(spark, sf_correct)).collect()
    }
    assert got == want
    # hot cells exist: at least one strongly positive z in the fixture
    assert max(v[4] for v in want.values()) > 2.0


def test_gi_star_constant_field_is_null(spark):
    """A uniform one-point-per-cell field has zero variance (A == 0):
    every z must be NULL, never inf/NaN, in line with the oracle."""
    pts = spark.range(9).selectExpr(
        "CAST(10.0 * (id DIV 3) - 80.0 AS DOUBLE) AS lat",
        "CAST(10.0 * (id % 3) - 170.0 AS DOUBLE) AS lon",
    )
    rows = knn_mod.gi_star(pts).collect()
    assert len(rows) == 9
    assert all(r.gi_z is None for r in rows)


def test_idw_interp_vs_bruteforce(spark, sf_correct):
    """Exact Python twin on the milli-degree lattice: integer weight
    sums, one float division — bit-identical expected values — plus the
    rim contract (a point at exactly d == R carries zero weight)."""
    pts = model.points(spark, sf_correct).collect()
    qs = knn_mod.knn_queries_from_nation(spark, sf_correct, limit=10).collect()
    R2 = 12000 * 12000
    want = {}
    for q in qs:
        qmx = round((q.qlon + 180.0) * 1000.0)
        qmy = round((q.qlat + 90.0) * 1000.0)
        n = sw = swv = 0
        for p in pts:
            mx = round((p.lon + 180.0) * 1000.0)
            my = round((p.lat + 90.0) * 1000.0)
            dm2 = (mx - qmx) ** 2 + (my - qmy) ** 2
            if dm2 <= R2:
                n += 1
                sw += R2 - dm2
                swv += (p.doc_id % 997) * (R2 - dm2)
        if n:
            want[q.q_id] = (
                n,
                float(sw),
                (swv / sw) if sw else None,
            )
    pdf = model.points(spark, sf_correct).withColumn(
        "v", F.col("doc_id") % 997
    )
    pois = knn_mod.knn_queries_from_nation(spark, sf_correct, limit=10)
    got = {
        r.q_id: (r.n_pts, r.sum_w, r.idw_value)
        for r in knn_mod.idw_interp(pdf, pois, radius=12.0).collect()
    }
    assert got == want and len(got) > 0


def test_idw_interp_radius_guard(spark, sf_correct):
    pdf = model.points(spark, sf_correct).withColumn("v", F.col("doc_id") % 997)
    pois = knn_mod.knn_queries_from_nation(spark, sf_correct, limit=2)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        knn_mod.idw_interp(pdf, pois, radius=20.0, cell=15.0)


def test_grid_dbscan_vs_python(spark, sf_correct):
    """Pure-Python DBSCAN twin on the occupied 10-degree grid: BFS over
    queen-adjacent core cells, min-id labels, border attachment, -1
    noise — exact match, plus structural sanity (labels are component
    minima; the fixture's hot cell is core)."""
    from math import floor

    pts = model.points(spark, sf_correct).collect()
    counts = {}
    for p in pts:
        c = (floor((p.lat + 90.0) / 10.0), floor((p.lon + 180.0) / 10.0))
        counts[c] = counts.get(c, 0) + 1
    core = {c for c, n in counts.items() if n >= 2}
    lbl = {}
    for c in sorted(core):
        if c in lbl:
            continue
        comp, stack = [], [c]
        seen = {c}
        while stack:
            u = stack.pop()
            comp.append(u)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    v = (u[0] + dy, u[1] + dx)
                    if v in core and v not in seen:
                        seen.add(v)
                        stack.append(v)
        m = min(cc[0] * 36 + cc[1] for cc in comp)
        for cc in comp:
            lbl[cc] = m
    want = {}
    for c, n in counts.items():
        if c in lbl:
            cluster = lbl[c]
        else:
            adj = [
                lbl[(c[0] + dy, c[1] + dx)]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if (c[0] + dy, c[1] + dx) in lbl
            ]
            cluster = min(adj) if adj else -1
        want[c] = (n, c in core, cluster)
    got = {
        (r.cy, r.cx): (r.npts, r.is_core, r.cluster)
        for r in knn_mod.grid_dbscan(model.points(spark, sf_correct)).collect()
    }
    assert got == want
    # non-degenerate: at least one multi-cell cluster and some noise
    from collections import Counter

    sizes = Counter(v[2] for v in want.values() if v[2] != -1)
    assert sizes and max(sizes.values()) > 1


def test_event_transitions_vs_python(spark, sf_smoke):
    """Python twin of the Markov transition profile + row-stochastic
    identity: each prev_type's probabilities sum to 1."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id", "event_type").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    byuser = {}
    for r in rows:
        byuser.setdefault(r.user_id, []).append(r.event_type)
    n = {}
    for seq in byuser.values():
        for a, b in zip(seq, seq[1:]):
            n[(a, b)] = n.get((a, b), 0) + 1
    tot = {}
    for (a, _b), c in n.items():
        tot[a] = tot.get(a, 0) + c
    want = {k: (c, c / tot[k[0]]) for k, c in n.items()}
    got = {
        (r.prev_type, r.event_type): (r.n_trans, r.p_trans)
        for r in temporal.event_transitions(ev).collect()
    }
    assert got == want
    per_prev = {}
    for (a, _b), (_c, p) in got.items():
        per_prev[a] = per_prev.get(a, 0.0) + p
    assert all(abs(s - 1.0) < 1e-12 for s in per_prev.values())


def test_ripley_k_vs_python(spark, sf_smoke):
    """Brute-force O(n^2) twin of Ripley's K on the smoke points +
    monotonicity in r; the hot cell guarantees pairs at every radius."""
    from scidbgeo_spark.operators import knn as knn_ops

    pts = [
        (round((r.lon + 180.0) * 1000.0), round((r.lat + 90.0) * 1000.0))
        for r in model.points(spark, sf_smoke).collect()
    ]
    n = len(pts)
    want = {}
    for r_milli in knn_ops.RIPLEY_RADII:
        c = sum(
            1
            for i in range(n)
            for j in range(n)
            if i != j
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= r_milli * r_milli
        )
        want[r_milli] = (c, c * 64800000000.0 / (n * (n - 1)))
    got = {
        r.r_milli: (r.n_pairs, r.k_hat)
        for r in knn_ops.ripley_k(model.points(spark, sf_smoke)).collect()
    }
    assert got == want
    counts = [want[r][0] for r in sorted(want)]
    assert counts == sorted(counts) and counts[0] > 0


def test_geary_c_vs_python(spark, sf_smoke):
    """Fraction-exact Python twin of Geary's C on the 10-degree cell
    grid (queen adjacency), plus the no-autocorrelation sanity range."""
    from fractions import Fraction
    from math import floor

    from scidbgeo_spark.operators import knn as knn_ops

    cells = {}
    for r in model.points(spark, sf_smoke).collect():
        k = (floor((r.lat + 90.0) / 10.0), floor((r.lon + 180.0) / 10.0))
        cells[k] = cells.get(k, 0) + 1
    n = len(cells)
    s = sum(cells.values())
    sx2 = sum(v * v for v in cells.values())
    w = num = 0
    for (cy, cx), xa in cells.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                xb = cells.get((cy + dy, cx + dx))
                if xb is not None:
                    w += 1
                    num += (xa - xb) ** 2
    want = float(
        Fraction(n * (n - 1) * num, 2 * w * (n * sx2 - s * s))
    )
    [row] = knn_ops.geary_c(model.points(spark, sf_smoke)).collect()
    assert (row.n_cells, row.w_pairs) == (n, w)
    assert abs(row.geary_c - want) < 1e-12
    assert row.geary_c >= 0.0


def test_semivariogram_vs_python(spark, sf_smoke):
    """O(n^2) Python twin of the 3-lag empirical semivariogram."""
    from scidbgeo_spark.operators import knn as knn_ops

    pts = [
        (
            r.doc_id % 997,
            round((r.lon + 180.0) * 1000.0),
            round((r.lat + 90.0) * 1000.0),
        )
        for r in model.points(spark, sf_smoke).collect()
    ]
    bounds = [0, *knn_ops.SEMIVAR_LAGS]
    want = {}
    for lo, hi in zip(bounds, bounds[1:]):
        c = ssd = 0
        for i, (vi, xi, yi) in enumerate(pts):
            for j, (vj, xj, yj) in enumerate(pts):
                if i == j:
                    continue
                d2 = (xi - xj) ** 2 + (yi - yj) ** 2
                if lo * lo < d2 <= hi * hi:
                    c += 1
                    ssd += (vi - vj) ** 2
        want[hi] = (c, ssd / (2.0 * c) if c else 0.0)
    got = {
        r.lag_milli: (r.n_pairs, r.gamma)
        for r in knn_ops.semivariogram(model.points(spark, sf_smoke)).collect()
    }
    assert got == want
    assert any(c > 0 for c, _ in want.values())


def test_user_burst_vs_python(spark, sf_smoke):
    """Python twin of the per-user burstiness profile + the identity
    sum(n_events) == table row count."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    pm = {}
    total = 0
    for r in ev.select("user_id", "ts").collect():
        total += 1
        mk = (r.user_id, r.ts.replace(second=0, microsecond=0))
        pm[mk] = pm.get(mk, 0) + 1
    want = {}
    for (u, _m), c in pm.items():
        peak, mins, tot = want.get(u, (0, 0, 0))
        want[u] = (max(peak, c), mins + 1, tot + c)
    got = {
        r.user_id: (r.peak_min_events, r.n_active_minutes, r.n_events)
        for r in temporal.user_burst(ev).collect()
    }
    assert got == want
    assert sum(v[2] for v in got.values()) == total


def test_session_stats_vs_python(spark, sf_smoke):
    """Python twin of the corpus-wide session-length rollup (1-hour
    gap sessionization, exact-interpolation percentiles)."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    sessions = []
    cur_user = cur_start = cur_last = None
    n_ev = 0
    for r in rows:
        new = (
            r.user_id != cur_user
            or (r.ts - cur_last).total_seconds() > 3600
        )
        if new:
            if cur_user is not None:
                sessions.append(((cur_last - cur_start).total_seconds() * 1e6, n_ev))
            cur_user, cur_start, n_ev = r.user_id, r.ts, 0
        cur_last = r.ts
        n_ev += 1
    sessions.append(((cur_last - cur_start).total_seconds() * 1e6, n_ev))

    def pct(vals, p):
        s = sorted(vals)
        idx = p * (len(s) - 1)
        f = int(idx)
        if f == idx:
            return float(s[f])
        return s[f] + (s[f + 1] - s[f]) * (idx - f)

    durs = [d for d, _ in sessions]
    total = sum(n for _, n in sessions)
    [row] = temporal.session_stats(ev).collect()
    assert row.n_sessions == len(sessions)
    assert abs(row.median_dur_us - pct(durs, 0.5)) < 1e-6
    assert abs(row.p90_dur_us - pct(durs, 0.9)) < 1e-6
    assert row.n_events == total
    assert abs(row.events_per_session - total / len(sessions)) < 1e-12


def test_event_cooccurrence_vs_python(spark, sf_smoke):
    """O(n^2)-per-user Python twin of the 5-minute co-occurrence matrix
    + the window-coverage property (the x2 bucket replication must not
    miss a pair at the bucket boundary)."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = ev.select("user_id", "event_type", "ts").collect()
    byuser = {}
    for r in rows:
        us = int(r.ts.timestamp() * 1_000_000)
        byuser.setdefault(r.user_id, []).append((us, r.event_type))
    want = {}
    W = temporal.COOCCUR_WINDOW_US
    for evs in byuser.values():
        for ta, a in evs:
            for tb, b in evs:
                if 0 < tb - ta <= W:
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.type_a, r.type_b): r.n_pairs
        for r in temporal.event_cooccurrence(ev).collect()
    }
    assert got == want
    # boundary coverage: some counted pair must span a bucket boundary
    crossing = any(
        0 < tb - ta <= W and (ta // W) != (tb // W)
        for evs in byuser.values()
        for ta, _ in evs
        for tb, _ in evs
    )
    assert crossing


def test_path_rasterize_vs_python(spark, sf_smoke):
    """Pure-Python twin of the integer-DDA supercover walk, plus the
    per-step conservation identity: total incidences == sum over steps
    of (chebyshev_cell_distance + 1)."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = sorted(
        ev.select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    cell = temporal.PATH_CELL
    want: dict[tuple[int, int], int] = {}
    total = 0
    prev_user = None
    prev = None
    for r in rows:
        cy = ((r.event_id * 7919) % 180000) // cell
        cx = ((r.event_id * 9973) % 360000) // cell
        if r.user_id == prev_user:
            cy0, cx0 = prev
            dy, dx = cy - cy0, cx - cx0
            s = max(abs(dy), abs(dx))
            total += s + 1
            for t in range(s + 1):
                oy = (0 if dy == 0 else (1 if dy > 0 else -1)) * (
                    (2 * t * abs(dy) + s) // (2 * max(s, 1))
                )
                ox = (0 if dx == 0 else (1 if dx > 0 else -1)) * (
                    (2 * t * abs(dx) + s) // (2 * max(s, 1))
                )
                key = (cy0 + oy, cx0 + ox)
                want[key] = want.get(key, 0) + 1
        prev_user, prev = r.user_id, (cy, cx)
    got = {
        (r.cy, r.cx): r.n_visits for r in temporal.path_rasterize(ev).collect()
    }
    assert got == want
    assert sum(got.values()) == total


def test_path_rasterize_walks_are_connected(spark):
    """Every consecutive pair of DDA cells differs by a king move: a
    single diagonal step between far-apart cells lands every
    intermediate cell (supercover property on a hand-built path)."""
    from scidbgeo_spark.operators import temporal

    # one user, two events chosen so the cells are (0,0) -> (7,15):
    # every walked cell must be adjacent to the previous one.
    ev = spark.createDataFrame(
        [(0, 10, 0), (0, 20, 1)],
        "user_id long, ts long, event_id long",
    ).select(
        "user_id", F.timestamp_micros(F.col("ts")).alias("ts"), "event_id"
    )
    pts = [
        (((e * 7919) % 180000) // temporal.PATH_CELL,
         ((e * 9973) % 360000) // temporal.PATH_CELL)
        for e in (0, 1)
    ]
    rows = temporal.path_rasterize(ev).collect()
    got = {(r.cy, r.cx): r.n_visits for r in rows}
    s = max(abs(pts[1][0] - pts[0][0]), abs(pts[1][1] - pts[0][1]))
    assert sum(got.values()) == s + 1
    assert got.get(pts[0]) == 1 and got.get(pts[1]) == 1
    cells = sorted(got)
    # reconstruct the walk order from the python twin and check king moves
    walk = []
    dy, dx = pts[1][0] - pts[0][0], pts[1][1] - pts[0][1]
    for t in range(s + 1):
        oy = (0 if dy == 0 else (1 if dy > 0 else -1)) * ((2 * t * abs(dy) + s) // (2 * max(s, 1)))
        ox = (0 if dx == 0 else (1 if dx > 0 else -1)) * ((2 * t * abs(dx) + s) // (2 * max(s, 1)))
        walk.append((pts[0][0] + oy, pts[0][1] + ox))
    assert set(walk) == set(cells)
    for (y0, x0), (y1, x1) in zip(walk, walk[1:]):
        assert max(abs(y1 - y0), abs(x1 - x0)) == 1


def test_coverage_gaps_partition_identity(spark, sf_smoke):
    """gaps + visited partition the fixed grid exactly."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    cell = temporal.COVER_CELL
    ny, nx = 180000 // cell, 360000 // cell
    visited = {
        (((r.event_id * 7919) % 180000) // cell,
         ((r.event_id * 9973) % 360000) // cell)
        for r in ev.select("event_id").collect()
    }
    gaps = {(r.cy, r.cx) for r in temporal.coverage_gaps(spark, ev).collect()}
    assert gaps.isdisjoint(visited)
    assert len(gaps) + len(visited) == ny * nx
    assert all(0 <= y < ny and 0 <= x < nx for y, x in gaps)


def test_colocation_pairs_vs_python_and_cap_binds(spark):
    """Python twin on a hand-built corpus where the hub-cell cap BINDS:
    users 0..5 all share hub cell (0,0) (dropped, > cap visitors) plus
    per-pair private cells; only the pair with >= min_shared surviving
    shared cells appears."""
    from scidbgeo_spark.operators import knn as knn_op

    # six HEAVY users (60 events, cover ~22 of the 32 grid cells) + two
    # LIGHT users (6 events).  Cells where all six heavy users collide
    # exceed cap=5 and are dropped (the cap BINDS); heavy-pair affinity
    # survives on the remaining cells.
    ev_rows = [(u, 1000 + i, u * 1000 + i) for u in range(6) for i in range(60)]
    ev_rows += [(u, 1000 + i, u * 1000 + i) for u in (6, 7) for i in range(6)]
    df = spark.createDataFrame(
        ev_rows, "user_id long, ts long, event_id long"
    ).select("user_id", F.timestamp_micros(F.col("ts")).alias("ts"), "event_id")
    cell, cap, min_shared = 45000, 5, 13
    member = {
        (u, ((e * 7919) % 180000) // cell, ((e * 9973) % 360000) // cell)
        for u, _, e in ev_rows
    }
    from collections import Counter

    per_cell = Counter((cy, cx) for _, cy, cx in member)
    assert any(n > cap for n in per_cell.values())  # the cap binds
    kept = [(u, cy, cx) for u, cy, cx in member if per_cell[(cy, cx)] <= cap]
    pair_count: dict[tuple[int, int], int] = {}
    for ua, cya, cxa in kept:
        for ub, cyb, cxb in kept:
            if ua < ub and (cya, cxa) == (cyb, cxb):
                pair_count[(ua, ub)] = pair_count.get((ua, ub), 0) + 1
    want = {p: n for p, n in pair_count.items() if n >= min_shared}
    got = {
        (r.user_a, r.user_b): r.n_shared
        for r in knn_op.colocation_pairs(
            df, cell=cell, min_shared=min_shared, cell_cap=cap
        ).collect()
    }
    assert got == want and want  # non-vacuous


def _xy2d(bits, x, y):
    """Reference Hilbert loop (public-domain algorithm: rotate/reflect
    per level) — the ground truth the LUT fold must reproduce."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_fold_matches_reference_loop(spark):
    """The 4-state LUT fold equals the classic rotate loop at full
    16-bit depth on random cells (incl. the corner extremes)."""
    import random as _r

    from scidbgeo_spark.operators import pip

    rng = _r.Random(4111)
    cells = [(0, 0), (65535, 65535), (65535, 0), (0, 65535)] + [
        (rng.randrange(36000), rng.randrange(18000)) for _ in range(400)
    ]
    rows = [
        (i, -180.0 + cx * 0.01 + 0.005, -90.0 + cy * 0.01 + 0.005)
        for i, (cx, cy) in enumerate(cells)
        if cx < 36000 and cy < 18000
    ]
    df = spark.createDataFrame(rows, "i long, lon double, lat double")
    got = {
        r.i: r.h
        for r in df.select("i", pip.hilbert_cell_col().alias("h")).collect()
    }
    for i, (cx, cy) in enumerate(cells):
        if cx < 36000 and cy < 18000:
            assert got[i] == _xy2d(16, cx, cy), (cx, cy)


def test_hilbert_bijective_and_locality(spark):
    """On an exhaustive 32x32 grid (bits=5) the fold is a bijection
    onto 0..1023 and CONSECUTIVE ids are always grid 4-neighbors — the
    locality guarantee Z-order lacks (its seams jump); this is the
    property that makes Hilbert-sorted parquet clustering compact."""
    from scidbgeo_spark.operators import pip

    n = 32
    rows = [
        (cx * n + cy, -180.0 + cx * 0.01 + 0.005, -90.0 + cy * 0.01 + 0.005)
        for cx in range(n)
        for cy in range(n)
    ]
    df = spark.createDataFrame(rows, "i long, lon double, lat double")
    got = {
        r.i: r.h
        for r in df.select("i", pip.hilbert_cell_col(bits=5).alias("h")).collect()
    }
    assert sorted(got.values()) == list(range(n * n))
    pos = {h: divmod(i, n) for i, h in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_distance_join_geo_vs_bruteforce(spark):
    """The latitude-adaptive candidate fan must recover EXACTLY the
    brute-force pair set under the banded equirectangular metric —
    including high-latitude points where one lon cell is km-narrow and
    the planar 3x3 fan would MISS matches."""
    import random as _r

    from scidbgeo_spark.operators import knn as K

    rng = _r.Random(4112)
    cell = 15.0
    lonkm = [K.GEO_KM_PER_DEG * s for s in K.geo_row_scales(cell)]
    pts = [
        (i, rng.uniform(-180.0, 180.0), rng.uniform(-89.9, 89.9))
        for i in range(300)
    ] + [
        # polar cluster: wide lon spread, small km distance
        (300 + i, -170.0 + 20.0 * i, 83.0 + 0.1 * i)
        for i in range(5)
    ]
    pois = [(j, rng.uniform(-180.0, 180.0), rng.uniform(-89.9, 89.9)) for j in range(8)]
    pois.append((8, -160.0, 83.2))  # polar POI near the cluster
    R = 1500.0
    p_df = spark.createDataFrame(pts, "doc_id long, lon double, lat double")
    q_df = spark.createDataFrame(pois, "q_id long, qlon double, qlat double")
    got = {
        (r.doc_id, r.q_id): r.dist_km2
        for r in K.distance_join_geo(p_df, q_df, radius_km=R, cell=cell).collect()
    }
    expect = {}
    for d, lon, lat in pts:
        row = min(int((lat + 90.0) / cell), 11)
        for qid, qlon, qlat in pois:
            dlat = (lat - qlat) * K.GEO_KM_PER_DEG
            dlon = (lon - qlon) * lonkm[row]
            d2 = dlat * dlat + dlon * dlon
            if d2 <= R * R:
                expect[(d, qid)] = d2
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == expect[k], k
    # the polar cluster must contribute pairs the planar 3x3 fan misses:
    # 20 deg of lon at 83N is ~390 km, i.e. > 1 cell away in lon terms
    assert any(d >= 300 and q == 8 for d, q in got)


def test_distance_join_geo_polar_fan_is_wider(spark):
    """The per-row candidate fan must widen toward the poles (the
    whole point of the latitude correction): the polar row's fan_x
    exceeds the equatorial row's."""
    from scidbgeo_spark.operators import knn as K

    cell = 15.0
    lonkm = [K.GEO_KM_PER_DEG * s for s in K.geo_row_scales(cell)]
    fan = [min(int(1500.0 / (cell * v)) + 1, 24) for v in lonkm]
    assert fan[0] > fan[6] and fan[-1] > fan[5]


def test_quadtree_split_invariants_and_python_twin(spark):
    """The one-pass leaf computation equals the iterative
    split-until-under-cap quadtree on a skewed point set, leaves tile
    without overlap (every point in exactly one leaf), every leaf
    holds <= cap points unless it bottomed out at rmax, and a leaf's
    parent is always over cap (no premature split)."""
    import random as _r

    from scidbgeo_spark.operators import pip

    rng = _r.Random(4116)
    pts = []
    for i in range(400):
        if i % 2 == 0:  # dense hot blob
            pts.append((i, 10.0 + rng.random() * 0.02, 10.0 + rng.random() * 0.02))
        else:
            pts.append((i, rng.uniform(-179, 179), rng.uniform(-89, 89)))
    df = spark.createDataFrame(pts, "doc_id long, lon double, lat double")
    cap, r0, rmax = 15, 4, 16
    got = {
        (r.res, r.cell): r.n_points
        for r in pip.quadtree_split(df, cap=cap, r0=r0, rmax=rmax).collect()
    }

    def z16(lon, lat):
        cx = int((lon + 180.0) / 0.01)
        cy = int((lat + 90.0) / 0.01)
        z = 0
        for i in range(16):
            z |= ((cx >> i) & 1) << (2 * i)
            z |= ((cy >> i) & 1) << (2 * i + 1)
        return z

    zs = [z16(lon, lat) for _d, lon, lat in pts]
    # iterative reference: split cells over cap level by level
    from collections import Counter

    leaves = {}
    frontier = Counter(z >> (2 * (16 - r0)) for z in zs)
    for r in range(r0, rmax + 1):
        nxt = Counter()
        for z in zs:
            cell = z >> (2 * (16 - r))
            if (r, cell) in leaves or any(
                (rr, z >> (2 * (16 - rr))) in leaves for rr in range(r0, r)
            ):
                continue
            nxt[cell] += 1
        for cell, n in nxt.items():
            if n <= cap or r == rmax:
                leaves[(r, cell)] = n
    assert got == dict(leaves)
    assert sum(got.values()) == len(pts)  # exact tiling, no overlap
    for (r, cell), n in got.items():
        if r < rmax:
            assert n <= cap
        if r > r0:  # parent must have been over cap
            parent = (r - 1, cell >> 2)
            pn = sum(1 for z in zs if z >> (2 * (16 - (r - 1))) == cell >> 2)
            assert pn > cap, parent
    assert any(r > r0 for r, _c in got)  # the hot blob forced real splits


def test_rect_join_exactly_once_vs_bruteforce(spark):
    """Responsible-cell dedup: pairs sharing MANY grid cells (large
    overlapping rects) still report exactly once, and the pair set
    equals the brute-force overlap join — including edge-touching
    rects (closed-interval overlap)."""
    import random as _r

    from scidbgeo_spark.operators import knn as K

    rng = _r.Random(4117)
    cell = K.RECT_CELL
    rects_a, rects_b = [], []
    for i in range(120):
        x0, y0 = rng.randrange(0, 300000), rng.randrange(0, 140000)
        rects_a.append((i, x0, y0, x0 + rng.randrange(0, K.RECT_MAX_EXTENT), y0 + rng.randrange(0, K.RECT_MAX_EXTENT)))
    for j in range(40):
        x0, y0 = rng.randrange(0, 300000), rng.randrange(0, 140000)
        rects_b.append((j, x0, y0, x0 + rng.randrange(0, K.RECT_MAX_EXTENT), y0 + rng.randrange(0, K.RECT_MAX_EXTENT)))
    # force an edge-touching pair and a many-shared-cells pair
    rects_a.append((120, 50000, 50000, 70000, 70000))
    rects_b.append((40, 70000, 70000, 90000, 90000))      # touches at a corner
    rects_b.append((41, 45000, 45000, 65000, 65000))      # big overlap, 4+ cells
    a_df = spark.createDataFrame(rects_a, "a_id long, ax0 long, ay0 long, ax1 long, ay1 long")
    b_df = spark.createDataFrame(rects_b, "b_id long, bx0 long, by0 long, bx1 long, by1 long")
    rows = K.rect_join(a_df, b_df, cell=cell).collect()
    got = [(r.a_id, r.b_id) for r in rows]
    assert len(got) == len(set(got))  # exactly once, no dedup shuffle needed
    expect = {
        (i, j)
        for i, ax0, ay0, ax1, ay1 in rects_a
        for j, bx0, by0, bx1, by1 in rects_b
        if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1
    }
    assert set(got) == expect
    assert (120, 40) in expect and (120, 41) in expect


def test_hilbert_block_range_equals_box_exhaustive(spark):
    """On every aligned block of a 64x64 grid (k in 1..3), membership
    in the Hilbert id range equals membership in the coordinate box —
    the contiguity property that turns boxes into range predicates."""
    from scidbgeo_spark.operators import pip

    def h(cx, cy, bits=16):
        d, t = 0, 0
        for i in range(bits - 1, -1, -1):
            quad = (((cx >> i) & 1) << 1) | ((cy >> i) & 1)
            d = d * 4 + pip.HILBERT_DLUT[t * 4 + quad]
            t = pip.HILBERT_TLUT[t * 4 + quad]
        return d

    for k in (1, 2, 3):
        step = 1 << k
        for bx in range(0, 64, step * 8):  # sample origins
            for by in range(0, 64, step * 8):
                d0, d1 = pip.hilbert_block_range(bx, by, k)
                inside = {
                    h(cx, cy)
                    for cx in range(bx, bx + step)
                    for cy in range(by, by + step)
                }
                assert inside == set(range(d0, d1)), (bx, by, k)


def test_geohash_matches_textbook_bisection(spark, sf_correct):
    """The integer-quantized geohash equals the classic bisection
    algorithm (Niemeyer encoding, lon first) char for char."""
    B32 = pip.GEOHASH_B32

    def classic(lon, lat, nchars=6):
        lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
        bits, out, even = 0, [], True
        ch = 0
        for _ in range(nchars * 5):
            if even:
                mid = (lo_lon + hi_lon) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lo_lon = mid
                else:
                    ch = ch * 2
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    lo_lat = mid
                else:
                    ch = ch * 2
                    hi_lat = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(B32[ch])
                bits, ch = 0, 0
        return "".join(out)

    pts = model.points(spark, sf_correct)
    code = pip.geohash_cell_col()
    rows = pts.select(
        "doc_id", "lon", "lat", code.alias("g"),
        pip.geohash_str_col(code).alias("gh"),
    ).collect()
    assert len(rows) > 100
    for r in rows[:300]:
        want = classic(r.lon, r.lat)
        assert r.gh == want, (r.doc_id, r.lon, r.lat, r.gh, want)
        # integer code round-trips through the base32 text
        dec = 0
        for c in r.gh:
            dec = dec * 32 + B32.index(c)
        assert dec == r.g


def test_trajectory_simplify_equals_unbounded_dp(spark, sf_smoke):
    """The bounded data-parallel rounds converge to TRUE unbounded
    Douglas-Peucker at fixture scale (endpoints + all split points,
    exact integer tolerance tests)."""
    from scidbgeo_spark.operators import temporal

    ev = model.load_table(spark, sf_smoke, "events")
    rows = ev.select("user_id", "ts", "event_id").collect()
    traj = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        traj.setdefault(r.user_id, []).append(
            ((r.event_id * 7919) % 180000, (r.event_id * 9973) % 360000)
        )
    eps2 = temporal.DP_EPS * temporal.DP_EPS
    want = set()
    for u, pts_u in traj.items():
        n = len(pts_u)
        want.add((u, 0))
        want.add((u, n - 1))
        stack = [(0, n - 1)] if n >= 3 else []
        while stack:
            s, e = stack.pop()
            if e - s < 2:
                continue
            sy, sx = pts_u[s]
            ey, ex = pts_u[e]
            best = None
            for i in range(s + 1, e):
                py, px = pts_u[i]
                cr = (ex - sx) * (py - sy) - (ey - sy) * (px - sx)
                c2 = cr * cr
                if best is None or c2 > best[0]:
                    best = (c2, i)
            len2 = (ex - sx) ** 2 + (ey - sy) ** 2
            if best and best[0] > eps2 * len2:
                m = best[1]
                want.add((u, m))
                stack.append((s, m))
                stack.append((m, e))
    got = {
        (r.user_id, r.idx): (r.py, r.px)
        for r in temporal.trajectory_simplify(ev).collect()
    }
    assert set(got) == want
    for (u, i), (py, px) in got.items():
        assert (py, px) == traj[u][i]


def test_winding_join_vs_python_and_star_divergence(spark, sf_correct):
    """Python twin of both crossing rules over the pentagram + square
    layer; the star core (winding 2) must diverge: counted by nonzero,
    invisible to even-odd."""
    pts = model.points(spark, sf_correct).collect()
    edges = pip.winding_zone_edges()
    want = {}
    for zid in {e[0] for e in edges}:
        es = [e for e in edges if e[0] == zid]
        nw = ne = 0
        for r in pts:
            wn = cr = 0
            for _, x1, y1, x2, y2 in es:
                cross = (x2 - x1) * (r.lat - y1) - (r.lon - x1) * (y2 - y1)
                if y1 <= r.lat < y2 and cross > 0:
                    wn += 1
                    cr += 1
                elif y2 <= r.lat < y1 and cross < 0:
                    wn -= 1
                    cr += 1
            nw += wn != 0
            ne += cr % 2 == 1
        want[zid] = (nw, ne)
    got = {
        r.zone_id: (r.n_winding, r.n_evenodd)
        for r in pip.winding_join(
            model.points(spark, sf_correct), pip.winding_edges(spark)
        ).collect()
    }
    assert got == want
    assert got[1][0] > got[1][1]  # star: winding sees the core, even-odd not
    assert got[2][0] == got[2][1]  # simple square: rules agree


def test_raster_sample_points_vs_numpy(spark, sf_correct):
    """Bilinear sampling twin against numpy's direct formula (same
    fixed-order sum) + clamp behavior on synthetic edge points."""
    from scidbgeo_spark import model as mdl
    from scidbgeo_spark.operators import pixel as px

    h, w = mdl.raster_dims(spark, sf_correct)
    coo = mdl.raster_coo(spark, sf_correct)
    grid = {}
    for r in coo.collect():
        grid[(r.y, r.x)] = r.value
    got = {
        r.doc_id: r.v
        for r in px.raster_sample_points(
            mdl.points(spark, sf_correct), coo, h, w
        ).collect()
    }
    import math

    for r in model.points(spark, sf_correct).collect():
        gy = (r.lat + 90.0) / 180.0 * float(h - 1)
        gx = (r.lon + 180.0) / 360.0 * float(w - 1)
        y0, x0 = int(math.floor(gy)), int(math.floor(gx))
        fy, fx = gy - math.floor(gy), gx - math.floor(gx)
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        t0 = ((1.0 - fy) * (1.0 - fx)) * grid[(y0, x0)]
        t1 = ((1.0 - fy) * fx) * grid[(y0, x1)]
        t2 = (fy * (1.0 - fx)) * grid[(y1, x0)]
        t3 = (fy * fx) * grid[(y1, x1)]
        assert got[r.doc_id] == ((t0 + t1) + t2) + t3, r.doc_id
