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
