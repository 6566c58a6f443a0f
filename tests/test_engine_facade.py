"""SciDBGeoEngine facade: the reference-style verbs end-to-end."""

import numpy as np

from scidbgeo_spark import fixtures, model
from scidbgeo_spark.engine import SciDBGeoEngine
from scidbgeo_spark.model import RASTER_W, VALUE_MOD, VALUE_MULT


def test_engine_facade_workflow(spark, sf_smoke):
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("r", coo, height=h, width=w, chunk=50)
    assert "r" in eng.versions()
    assert "px" in eng.show("r")

    dense = ((np.arange(n, dtype=np.int64) * VALUE_MULT) % VALUE_MOD).reshape(h, w)

    got = eng.count_pixels("r", 42).collect()[0].pixel_sum or 0
    assert got == int(dense[dense == 42].sum())

    zs = {r.id: r for r in eng.zonal_statistics("r", fixtures.MIXED_POLYGONS).collect()}
    assert -999 in zs and zs[-999].count_value > 0

    fs = eng.focal_mean_sum("r").collect()[0].focal_sum36
    assert fs > 0

    add = eng.raster_add("r", "r")
    row = add.filter("tile_y = 0 AND tile_x = 0").select("px").first()
    assert row.px[0] == 2 * dense[0, 0]

    bw = eng.between("r", 1, 2, 3, 4)
    assert bw.count() == 3 * 3
    sub = eng.subarray("r", 1, 2, 3, 4).collect()
    assert {(r.y, r.x) for r in sub} == {(y, x) for y in range(3) for x in range(3)}

    eng.remove("r")
    assert "r" not in eng.versions()


def test_facade_multiband_and_vector_layer(spark, tmp_path):
    """load_geotiff_3d + load_vector_layer + pip_join_layer: the facade
    covers the round-3 sources end-to-end."""
    import numpy as np

    from scidbgeo_spark import fixtures, model
    from scidbgeo_spark.engine import SciDBGeoEngine
    from scidbgeo_spark.operators import pip
    from scidbgeo_spark.sources import geotiff, vector

    eng = SciDBGeoEngine(spark)

    eid = np.arange(3 * 10 * 8, dtype=np.int64)
    arr = (((eid * 2654435761) % 251).astype(np.int32)).reshape(3, 10, 8)
    td = tmp_path / "t3"
    td.mkdir()
    (td / "m.tif").write_bytes(geotiff.write_tiff(arr))
    tiles3 = eng.load_geotiff_3d(str(td))
    assert tiles3.count() == 3  # one 50px-span tile row per band

    p = str(tmp_path / "layer.parquet")
    vector.write_wkt_fixture(p, fixtures.GEO_POLYGONS)
    layer = eng.load_vector_layer(p, fmt="wkt")
    pts = model.points(spark, "/root/testdata/sf0.001")
    got = sorted(
        (r.doc_id, r.zone_id)
        for r in eng.pip_join_layer(pts, layer).select("doc_id", "zone_id").collect()
    )
    want = sorted(
        (r.doc_id, r.zone_id)
        for r in pip.pip_join(spark, pts, fixtures.GEO_POLYGONS).collect()
    )
    assert got == want


def test_spark_submit_pyfiles_launch(tmp_path):
    """North-rule launch shape: spark-submit --py-files runs a registered
    query end-to-end in a SEPARATE driver, with workers importing the
    package from the built zip (pip_poly exercises the pandas-UDF path,
    so a missing worker-side package would fail loudly)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zf = str(tmp_path / "scidbgeo_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_pyfiles.py"), zf],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    submit = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--py-files",
            zf,
            os.path.join(repo, "tools", "submit_job.py"),
            "--query",
            "pip_poly",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0 and res["query"] == "pip_poly"


def test_facade_sampling_upsample_vectorize(spark, sf_smoke):
    """The late-r3 verbs work through the stored-array facade: seeded
    sampling, xgrid upsample, region extraction + WKT vectorize."""
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("rv", coo, height=h, width=w, chunk=50)

    up = eng.upsample("rv")
    assert up.count() == 4 * n
    samp = eng.sample("rv")
    assert 0.15 * n < samp.count() < 0.35 * n
    assert samp.collect() == eng.sample("rv").collect()  # deterministic

    regions_df = eng.extract_regions("rv")
    assert regions_df.count() == n
    feats = eng.vectorize("rv")
    rows = feats.collect()
    assert len(rows) == regions_df.select("region").distinct().count()
    assert all(r.wkt.startswith("POLYGON((") for r in rows)


def test_facade_window_and_zonal_stat_verbs(spark, sf_smoke):
    """focal_mean/focal_minmax/zonal_mode/zonal_variance through the
    stored-array facade agree with NumPy ground truth."""
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("rw", coo, height=h, width=w, chunk=50)
    dense = ((np.arange(n, dtype=np.int64) * VALUE_MULT) % VALUE_MOD).reshape(h, w)

    mm = {(r.y, r.x): (r.min_value, r.max_value) for r in eng.focal_minmax("rw").collect()}
    assert len(mm) == n
    y, x = 3, 7
    win = dense[y - 1 : y + 2, x - 1 : x + 2]
    assert mm[(y, x)] == (win.min(), win.max())

    mode = {r.id: (r.mode_value, r.n_pixels) for r in eng.zonal_mode("rw", fixtures.MIXED_POLYGONS).collect()}
    var = {r.id: r.var_value for r in eng.zonal_variance("rw", fixtures.MIXED_POLYGONS).collect()}
    zones = fixtures.mixed_zone_numpy(h, w)
    for zid in np.unique(zones):
        sel = dense[zones == zid]
        vals, counts = np.unique(sel, return_counts=True)
        best = counts.max()
        assert mode[int(zid)] == (int(vals[counts == best].min()), int(best))
        assert abs(var[int(zid)] - sel.var()) < 1e-9

    cells = eng.focal_mean("rw", radius=2)
    assert cells.count() == (h // 50 + (1 if h % 50 else 0)) * (w // 50 + (1 if w % 50 else 0))


def test_facade_pyramid_and_layer_geometry(spark, sf_smoke):
    """Round-5 verbs through the facade: the pyramid's level-1 equals a
    direct block mean, every level partitions the base cells; the
    geometry audit reports the exact rect area."""
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("pyr", coo, height=h, width=w, chunk=50)

    pyr = eng.pyramid("pyr", levels=2).collect()
    lv1 = [r for r in pyr if r.level == 1]
    lv2 = [r for r in pyr if r.level == 2]
    assert len(lv1) == (h // 2 + (h % 2 > 0)) * (w // 2 + (w % 2 > 0))
    assert len(lv2) == (h // 4 + (h % 4 > 0)) * (w // 4 + (w % 4 > 0))

    rings = spark.createDataFrame(
        [(9, 0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 4.0, 4.0])],
        "zone_id int, ring_no int, xs array<double>, ys array<double>",
    )
    g = eng.layer_geometry(rings).collect()
    assert len(g) == 1 and g[0].area == 40.0 and g[0].n_vertices == 4


def test_facade_terrain_verb(spark, sf_smoke):
    """terrain through the stored-array facade: interior-cell count and
    a spot-checked Horn gradient against the dense NumPy twin."""
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("rt", coo, height=h, width=w, chunk=50)
    dense = ((np.arange(n, dtype=np.int64) * VALUE_MULT) % VALUE_MOD).reshape(h, w)

    rows = {(r.y, r.x): r for r in eng.terrain("rt").collect()}
    assert len(rows) == (h - 2) * (w - 2)
    y, x = 4, 9
    win = dense[y - 1 : y + 2, x - 1 : x + 2].astype(int)
    gx = (win[0, 2] + 2 * win[1, 2] + win[2, 2]) - (
        win[0, 0] + 2 * win[1, 0] + win[2, 0]
    )
    gy = (win[2, 0] + 2 * win[2, 1] + win[2, 2]) - (
        win[0, 0] + 2 * win[0, 1] + win[0, 2]
    )
    r = rows[(y, x)]
    assert (r.gx, r.gy) == (gx, gy)
    assert 0 <= r.hillshade <= 255 and 0 <= r.d8 <= 8


def test_facade_flow_accum_verb(spark, sf_smoke):
    """flow_accum through the stored-array facade: totals match the
    direct operator run and every count is positive."""
    from scidbgeo_spark import tiling
    from scidbgeo_spark.operators import focal

    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    eng.create_array("fa", coo, height=n // RASTER_W, width=RASTER_W, chunk=50)
    rows = eng.flow_accum("fa").collect()
    assert rows and all(r.acc > 0 for r in rows)
    direct = focal.flow_accum_coo(
        tiling.pack_tiles(coo, 50, n // RASTER_W, RASTER_W),
        n // RASTER_W,
        RASTER_W,
        50,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, direct))


def test_facade_variance_and_edge_density_verbs(spark, sf_smoke):
    """focal_variance/edge_density through the stored-array facade
    agree with NumPy ground truth on a spot window / global identity."""
    eng = SciDBGeoEngine(spark)
    coo = model.raster_coo(spark, sf_smoke)
    n = coo.count()
    h, w = n // RASTER_W, RASTER_W
    eng.create_array("rv", coo, height=h, width=w, chunk=50)
    dense = ((np.arange(n, dtype=np.int64) * VALUE_MULT) % VALUE_MOD).reshape(h, w)

    fv = {(r.y, r.x): (r.n_cells, r.nvar) for r in eng.focal_variance("rv").collect()}
    assert len(fv) == n
    y, x = 3, 7
    win = dense[y - 1 : y + 2, x - 1 : x + 2].astype(np.int64)
    nvar = 9 * int((win * win).sum()) - int(win.sum()) ** 2
    assert fv[(y, x)] == (9, nvar)

    ed = {(r.cls_a, r.cls_b): r.n_edges for r in eng.edge_density("rv").collect()}
    assert sum(ed.values()) == h * (w - 1) + (h - 1) * w
