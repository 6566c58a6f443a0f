"""Pure-NumPy ESRI shapefile reader/writer + multi-ring (even-odd) PIP.

Covers the reference's actual vector-layer format
(SciDB_ZonalStats_CL.py:443-445 ``driver.Open(shapePath, 0)``) without
OGR, and the MULTIPOLYGON/holes semantics the refinement kernel
recombines by XOR across rings.
"""

import struct

import numpy as np
import pytest

from scidbgeo_spark import fixtures
from scidbgeo_spark.kernels import points_in_ring
from scidbgeo_spark.operators import pip
from scidbgeo_spark.sources import shapefile, vector


def _rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def test_shp_write_parse_roundtrip(tmp_path):
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    p = shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    recs = shapefile.parse_shp(open(p, "rb").read())
    assert len(recs) == len(polys)
    for (zid, rings), got in zip(polys, recs):
        assert len(got) == len(rings)
        for want, r in zip(rings, got):
            assert np.array_equal(want, r)
    zids = shapefile.parse_dbf(open(p[:-4] + ".dbf", "rb").read(), "zone_id")
    assert zids == [zid for zid, _ in polys]


def test_shp_multipart_records_roundtrip(tmp_path):
    polys = [(zid, rings) for zid, rings, _ in fixtures.GEO_POLYGONS_HOLED]
    p = shapefile.write_shp_fixture(str(tmp_path / "holed.shp"), polys)
    recs = shapefile.parse_shp(open(p, "rb").read())
    assert [len(r) for r in recs] == [2, 2]
    for (zid, rings), got in zip(polys, recs):
        for want, r in zip(rings, got):
            assert np.array_equal(want, r)


def test_parse_shp_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        shapefile.parse_shp(b"\x00" * 200)


def test_parse_dbf_rejects_character_zone_field(tmp_path):
    """A string-typed zone column fails loudly (zone ids must be
    numeric), instead of a bare int() crash."""
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    p = shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    data = bytearray(open(p[:-4] + ".dbf", "rb").read())
    data[32 + 11] = ord("C")  # flip the field descriptor type to character
    with pytest.raises(ValueError, match="numeric"):
        shapefile.parse_dbf(bytes(data), "zone_id")


def test_polygons_from_shp_distributed(spark, tmp_path):
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    df = shapefile.polygons_from_shp(spark, str(tmp_path / "layer.shp"))
    rows = {r.zone_id: (r.xs, r.ys) for r in df.collect()}
    assert set(rows) == {10, 11, 12}
    xs, ys = rows[11]
    assert np.array_equal(
        np.column_stack((xs, ys)), fixtures.GEO_POLYGONS[1][1]
    )


def test_polygons_from_shp_directory_path(spark, tmp_path):
    """A DIRECTORY path works: binaryFile loads every sibling (.shx,
    .dbf included) and the extension filters keep them out of the wrong
    parser."""
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    df = shapefile.polygons_from_shp(spark, str(tmp_path))
    assert {r.zone_id for r in df.collect()} == {10, 11, 12}


def test_polygons_from_shp_missing_dbf_fails(spark, tmp_path):
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    p = shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    import os

    os.remove(p[:-4] + ".dbf")
    with pytest.raises(Exception, match="dbf"):
        shapefile.polygons_from_shp(spark, p).collect()


def test_indexed_scan_equals_whole_file_reader(spark, tmp_path):
    """.shx-indexed windowed scan (range reads, multiple batches) returns
    exactly the rows of the whole-file reader — including multi-part
    records — so one huge .shp can parse at cluster width."""
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS] + [
        (zid, rings) for zid, rings, _ in fixtures.GEO_POLYGONS_HOLED
    ]
    p = shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    whole = shapefile.polygons_from_shp(spark, p)
    indexed = shapefile.polygons_from_shp_indexed(spark, p, records_per_task=2)
    key = lambda r: (r.zone_id, r.ring_no, tuple(r.xs), tuple(r.ys))  # noqa: E731
    assert sorted(map(key, indexed.collect())) == sorted(map(key, whole.collect()))
    # 5 records at 2/task -> at least 3 range batches actually split
    assert indexed.rdd.getNumPartitions() >= 1


def test_deleted_dbf_records_skipped_by_both_scan_paths(spark, tmp_path):
    """A .dbf record flagged deleted ('*') is skipped — with rec_no
    alignment preserved — by BOTH the whole-file reader and the
    .shx-indexed scan, so the two paths agree on files containing
    deletions (previously the indexed path emitted the stale zone while
    the whole-file path raised a count mismatch)."""
    polys = [(zid, [ring]) for zid, ring in fixtures.GEO_POLYGONS]
    p = shapefile.write_shp_fixture(str(tmp_path / "layer.shp"), polys)
    dbf = bytearray(open(p[:-4] + ".dbf", "rb").read())
    header_size, record_size = struct.unpack("<HH", dbf[8:12])
    dbf[header_size + 1 * record_size] = ord("*")  # delete the MIDDLE record
    open(p[:-4] + ".dbf", "wb").write(bytes(dbf))

    whole = shapefile.polygons_from_shp(spark, p)
    indexed = shapefile.polygons_from_shp_indexed(spark, p, records_per_task=2)
    want = {10, 12}  # zone 11 deleted; later records keep THEIR ids (alignment)
    assert {r.zone_id for r in whole.collect()} == want
    assert {r.zone_id for r in indexed.collect()} == want


def test_even_odd_hole_and_multipart_membership():
    """Kernel-level even-odd: XOR of ring crossing tests subtracts the
    hole and unions disjoint parts, with half-open [a,b)x[c,d) edges."""
    outer, hole = _rect(0, -90, 60, -30), _rect(15, -75, 30, -60)
    px = np.array([5.0, 20.0, 20.0, 15.0, 30.0, 60.0, 0.0])
    py = np.array([-80.0, -70.0, -40.0, -75.0, -70.0, -60.0, -90.0])
    got = points_in_ring(px, py, outer) ^ points_in_ring(px, py, hole)
    #         in    hole  in    hole-edge(in hole) hole-right-edge(out of hole->in)
    want = [True, False, True, False, True, False, True]
    assert got.tolist() == want


def test_rings_from_wkt_parses_holes_and_multi(spark):
    rows = [
        (zid, vector.geometry_to_wkt(rs, multi=m))
        for zid, rs, m in fixtures.GEO_POLYGONS_HOLED
    ]
    df = spark.createDataFrame(rows, "zone_id int, wkt string")
    got = vector.rings_from_wkt(df).collect()
    assert {(r.zone_id, r.ring_no) for r in got} == {
        (20, 0),
        (20, 1),
        (21, 0),
        (21, 1),
    }
    by_key = {(r.zone_id, r.ring_no): r for r in got}
    hole = by_key[(20, 1)]
    assert np.array_equal(
        np.column_stack((hole.xs, hole.ys)), fixtures.GEO_POLYGONS_HOLED[0][1][1]
    )


def test_rings_from_geojson_matches_wkt(spark):
    """Polygon-with-holes and MultiPolygon GeoJSON parse to exactly the
    ring rows the WKT path produces."""
    wkt_rows = [
        (zid, vector.geometry_to_wkt(rs, multi=m))
        for zid, rs, m in fixtures.GEO_POLYGONS_HOLED
    ]
    gj_rows = [
        (zid, vector.geometry_to_geojson(rs, multi=m))
        for zid, rs, m in fixtures.GEO_POLYGONS_HOLED
    ]
    key = lambda r: (r.zone_id, r.ring_no, tuple(r.xs), tuple(r.ys))  # noqa: E731
    a = vector.rings_from_wkt(
        spark.createDataFrame(wkt_rows, "zone_id int, wkt string")
    ).collect()
    b = vector.rings_from_geojson(
        spark.createDataFrame(gj_rows, "zone_id int, geometry string")
    ).collect()
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert len(a) == 4


def test_pip_join_df_rings_even_odd(spark):
    """End-to-end multi-ring PIP: points in the hole get NO row for zone
    20; points in either disjoint part get zone 21."""
    pts = spark.createDataFrame(
        [
            (0, 5.0, -80.0),  # zone 20 (outer, not hole)
            (1, 20.0, -70.0),  # in the hole -> no row
            (2, -30.0, 45.0),  # zone 21 part A
            (3, 75.0, -15.0),  # zone 21 part B
            (4, 100.0, 50.0),  # outside everything
        ],
        "doc_id long, lon double, lat double",
    )
    layer_rows = [
        (zid, rno, ring[:, 0].tolist(), ring[:, 1].tolist())
        for zid, rings, _ in fixtures.GEO_POLYGONS_HOLED
        for rno, ring in enumerate(rings)
    ]
    poly = spark.createDataFrame(layer_rows, shapefile.LAYER_SCHEMA)
    got = {
        (r.doc_id, r.zone_id)
        for r in pip.pip_join_df(spark, pts, poly, mode="broadcast").collect()
    }
    assert got == {(0, 20), (2, 21), (3, 21)}


def test_pip_join_prepared_multi_ring(spark):
    """The prepared-layer (broadcast rings) path accepts multi-ring
    entries and matches the DataFrame-layer even-odd result."""
    pts = spark.createDataFrame(
        [
            (0, 5.0, -80.0),
            (1, 20.0, -70.0),  # in the hole -> no row
            (2, -30.0, 45.0),
            (3, 75.0, -15.0),
            (4, 100.0, 50.0),
        ],
        "doc_id long, lon double, lat double",
    )
    layer = pip.prepare_layer(
        spark, [(zid, rings) for zid, rings, _ in fixtures.GEO_POLYGONS_HOLED]
    )
    got = {
        (r.doc_id, r.zone_id)
        for r in pip.pip_join_prepared(pts, layer).collect()
    }
    assert got == {(0, 20), (2, 21), (3, 21)}


def test_covering_cell_estimate_gates_broadcast(spark):
    """Fan-out gate (r3 advice): a layer tiny in ring BYTES but huge in
    bbox AREA must not broadcast — candidate rows scale with area."""
    # one world-spanning polygon: 24 cells x 12 cells = 288 candidates
    world = [(0, _rect(-179.0, -89.0, 179.0, 89.0))]
    df = pip.polygons_df(spark, world)
    assert pip.covering_cell_estimate(df) == 288
    small = pip.polygons_df(spark, [(1, _rect(0, 0, 10, 10))])
    assert pip.covering_cell_estimate(small) == 1
    # multi-ring layers aggregate the bbox across rings per zone
    ringed = spark.createDataFrame(
        [
            (2, 0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
            (2, 1, [100.0, 110.0, 110.0, 100.0], [0.0, 0.0, 10.0, 10.0]),
        ],
        shapefile.LAYER_SCHEMA,
    )
    assert pip.covering_cell_estimate(ringed) == 8  # spans 100 deg of lon


# ---- GeoPackage source (sources/geopackage.py) ----------------------------


def test_gpkg_write_parse_roundtrip(tmp_path):
    """GPB(WKB Polygon) blobs round-trip to the exact OPEN ring arrays."""
    import sqlite3

    from scidbgeo_spark.sources import geopackage as g

    p = str(tmp_path / "layer.gpkg")
    g.write_gpkg_fixture(p, [(zid, [r]) for zid, r in fixtures.GEO_POLYGONS])
    assert g.gpkg_layer_meta(p) == ("layer", "geom", "fid", 3)
    con = sqlite3.connect(p)
    got = {z: g.parse_gpb(b) for z, b in con.execute("SELECT zone_id, geom FROM layer")}
    con.close()
    for zid, ring in fixtures.GEO_POLYGONS:
        assert np.array_equal(got[zid][0], np.asarray(ring, dtype=np.float64))


def test_gpkg_rejects_bad_blobs():
    from scidbgeo_spark.sources import geopackage as g

    with pytest.raises(ValueError):
        g.parse_gpb(b"XX" + b"\x00" * 20)
    # extended GPB flag
    with pytest.raises(ValueError):
        g.parse_gpb(b"GP" + bytes([0, 0b00100001]) + b"\x00" * 20)
    # WKB point inside a valid header
    with pytest.raises(ValueError):
        g.parse_gpb(
            b"GP" + bytes([0, 1]) + b"\x00" * 4 + struct.pack("<BIdd", 1, 1, 0.0, 0.0)
        )


def test_polygons_from_gpkg_distributed_and_split_invariant(spark, tmp_path):
    """The distributed rowid-range scan returns the exact layer at any
    split count, and multi-ring (hole + multipolygon) features emit one
    row per ring."""
    from scidbgeo_spark.sources import geopackage as g

    p = str(tmp_path / "layer.gpkg")
    polys = [(zid, [r]) for zid, r in fixtures.GEO_POLYGONS] + [
        (zid, rings) for zid, rings, _m in fixtures.GEO_POLYGONS_HOLED
    ]
    g.write_gpkg_fixture(p, polys)
    base = None
    for n_splits in (1, 3):
        rows = g.polygons_from_gpkg(spark, p, n_splits=n_splits).collect()
        got = sorted(
            (r.zone_id, r.ring_no, tuple(r.xs), tuple(r.ys)) for r in rows
        )
        base = got if base is None else base
        assert got == base
    want = sorted(
        (zid, i, tuple(np.asarray(r)[:, 0]), tuple(np.asarray(r)[:, 1]))
        for zid, rings in polys
        for i, r in enumerate(rings)
    )
    assert got == want


def test_gpkg_pip_equals_wkt_layer(spark, tmp_path, sf_smoke):
    """PIP through the gpkg layer == PIP through the in-memory layer —
    the SQLite round-trip is invisible, including even-odd holes."""
    from scidbgeo_spark import model
    from scidbgeo_spark.sources import geopackage as g

    p = str(tmp_path / "layer.gpkg")
    g.write_gpkg_fixture(
        p, [(zid, rings) for zid, rings, _m in fixtures.GEO_POLYGONS_HOLED]
    )
    pts = model.points(spark, sf_smoke)
    via_gpkg = sorted(
        map(
            tuple,
            pip.pip_join_df(spark, pts, g.polygons_from_gpkg(spark, p))
            .select("doc_id", "zone_id")
            .collect(),
        )
    )
    rows = [
        (int(z), i, [float(v) for v in np.asarray(r)[:, 0]], [float(v) for v in np.asarray(r)[:, 1]])
        for z, rings, _m in fixtures.GEO_POLYGONS_HOLED
        for i, r in enumerate(rings)
    ]
    layer = spark.createDataFrame(
        rows, "zone_id int, ring_no int, xs array<double>, ys array<double>"
    )
    via_mem = sorted(
        map(
            tuple,
            pip.pip_join_df(spark, pts, layer)
            .select("doc_id", "zone_id")
            .collect(),
        )
    )
    assert via_gpkg == via_mem and via_gpkg
