"""Pure-NumPy GeoTIFF writer/parser + distributed binaryFile ingest.

Covers the reference's windowed raster load
(GDALtoSciDB_multiprocessing.py:89-120, 300-320) without GDAL.
"""

import numpy as np
import pytest

from scidbgeo_spark import model, tiling
from scidbgeo_spark.model import CHUNK
from scidbgeo_spark.sources import geotiff


def _arr(h=13, w=37):
    eid = np.arange(h * w, dtype=np.int64)
    return ((eid * 2654435761) % 251).astype(np.int32).reshape(h, w) - 7


def test_write_parse_roundtrip():
    a = _arr()
    data = geotiff.write_tiff(a, origin=(-120.5, 48.25), pixel_size=(0.5, 0.5))
    hdr = geotiff.parse_tiff(data)
    assert (hdr["height"], hdr["width"]) == a.shape
    assert hdr["origin"] == (-120.5, 48.25)
    assert hdr["pixel_size"] == (0.5, 0.5)
    back = geotiff.tiff_to_array(data)
    assert back.dtype.kind == "i"
    assert np.array_equal(back, a)


def test_tiff_dims_bounded_header_read(tmp_path):
    """tiff_dims reads ONLY header + IFD (seek-based): correct dims even
    when the file body after the IFD region is unreadable garbage of
    arbitrary size — the property that makes it driver-safe at 100 TB."""
    a = _arr(13, 37)
    data = geotiff.write_tiff(a)
    p = tmp_path / "d.tif"
    p.write_bytes(data)
    assert geotiff.tiff_dims(str(p)) == a.shape
    assert geotiff.tiff_dims("file://" + str(p)) == a.shape
    # glob resolving to exactly one file is accepted; two files fail fast
    assert geotiff.tiff_dims(str(tmp_path / "*.tif")) == a.shape
    (tmp_path / "e.tif").write_bytes(data)
    with pytest.raises(ValueError, match="exactly one"):
        geotiff.tiff_dims(str(tmp_path / "*.tif"))
    # truncate everything after header+IFD, then pad with garbage: dims
    # still parse because the body is never read
    ifd_end = 8 + 2 + 1024  # generous IFD bound for this writer
    (tmp_path / "g.tif").write_bytes(data[:ifd_end] + b"\xff" * (1 << 20))
    assert geotiff.tiff_dims(str(tmp_path / "g.tif")) == a.shape


def test_parse_rejects_non_tiff_and_compressed():
    with pytest.raises(ValueError, match="not a TIFF"):
        geotiff.parse_tiff(b"PK\x03\x04 not a tiff")
    data = bytearray(geotiff.write_tiff(_arr(4, 4)))
    # flip the Compression tag value (1 -> 7/JPEG, unsupported) in place
    idx = data.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    data[idx + 8] = 7
    with pytest.raises(ValueError, match="compressed"):
        geotiff.parse_tiff(bytes(data))


def test_geotiff_coo_matches_model_raster(spark, sf_correct, tmp_path):
    """Ingesting a real TIFF of the deterministic raster reproduces
    model.raster_coo exactly, and survives pack_tiles round-trip."""
    h, w = model.raster_dims(spark, sf_correct)
    eid = np.arange(h * w, dtype=np.int64)
    arr = ((eid * model.VALUE_MULT) % model.VALUE_MOD).astype(np.int32).reshape(h, w)
    p = tmp_path / "r.tif"
    p.write_bytes(geotiff.write_tiff(arr))
    coo = geotiff.geotiff_coo(spark, str(tmp_path))
    got = sorted((r.y, r.x, r.value) for r in coo.collect())
    want = sorted((r.y, r.x, r.value) for r in model.raster_coo(spark, sf_correct).collect())
    assert got == want
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    back = sorted(
        (r.y, r.x, r.value)
        for r in tiling.tiles_to_coo(tiles, "value").collect()
    )
    assert back == want


def test_geotiff_coo_batches_bound_memory(spark, tmp_path):
    """A small batch_rows still yields complete, correct output (the
    strip-window streaming path, not a whole-file materialization)."""
    a = _arr(50, 20)
    (tmp_path / "s.tif").write_bytes(geotiff.write_tiff(a))
    coo = geotiff.geotiff_coo(spark, str(tmp_path), batch_rows=7)
    rows = coo.collect()
    assert len(rows) == a.size
    got = np.zeros_like(a)
    for r in rows:
        got[r.y, r.x] = r.value
    assert np.array_equal(got, a)


def test_write_geotiff_roundtrips_through_ingest(spark, sf_correct, tmp_path):
    """export.write_geotiff output re-ingests to the identical raster —
    the full array -> GeoTIFF -> array cycle (scidb.py:192-250 +
    GDALtoSciDB ingest, engine-side)."""
    from scidbgeo_spark import export

    coo = model.raster_coo(spark, sf_correct)
    h, w = model.raster_dims(spark, sf_correct)
    tiles = tiling.pack_tiles(coo, CHUNK, h, w)
    out = tmp_path / "export"
    out.mkdir()
    gt = export.GeoTransform(-180.0, 90.0, 0.1, -0.1)
    export.write_geotiff(tiles, str(out / "r.tif"), h, w, transform=gt)
    hdr = geotiff.parse_tiff((out / "r.tif").read_bytes())
    assert hdr["origin"] == (-180.0, 90.0)
    assert hdr["pixel_size"] == (0.1, 0.1)
    back = geotiff.geotiff_coo(spark, str(out))
    got = sorted((r.y, r.x, r.value) for r in back.collect())
    want = sorted((r.y, r.x, r.value) for r in coo.collect())
    assert got == want


def _arr3(bands=3, h=11, w=17):
    eid = np.arange(bands * h * w, dtype=np.int64)
    return (((eid * 2654435761) % 251).astype(np.int32) - 7).reshape(bands, h, w)


def test_multiband_write_parse_roundtrip():
    a = _arr3()
    data = geotiff.write_tiff(a, origin=(10.0, 20.0))
    hdr = geotiff.parse_tiff(data)
    assert hdr["bands"] == 3
    assert (hdr["height"], hdr["width"]) == a.shape[1:]
    back = geotiff.tiff_to_array(data)
    assert back.shape == a.shape
    assert np.array_equal(back, a)


def test_geotiff_coo_3d_matches_array(spark, tmp_path):
    a = _arr3(4, 25, 10)
    (tmp_path / "m.tif").write_bytes(geotiff.write_tiff(a))
    rows = geotiff.geotiff_coo_3d(spark, str(tmp_path), batch_rows=6).collect()
    assert len(rows) == a.size
    got = np.zeros_like(a)
    for r in rows:
        got[r.band, r.y, r.x] = r.value
    assert np.array_equal(got, a)
    # feeds the 3-D chunk path
    tiles3 = tiling.pack_tiles_3d(
        geotiff.geotiff_coo_3d(spark, str(tmp_path)), 5, 25, 10
    )
    assert tiles3.count() == 4 * 5 * 2


def test_single_band_reader_rejects_multiband(spark, tmp_path):
    (tmp_path / "m.tif").write_bytes(geotiff.write_tiff(_arr3()))
    with pytest.raises(Exception, match="geotiff_coo_3d"):
        geotiff.geotiff_coo(spark, str(tmp_path)).collect()


def test_multifile_glob_fails_fast_without_offsets(spark, tmp_path):
    """Two files with no window-offset rule would silently overlay both
    rasters at y=0 — must refuse instead."""
    (tmp_path / "a.tif").write_bytes(geotiff.write_tiff(_arr(4, 5)))
    (tmp_path / "b.tif").write_bytes(geotiff.write_tiff(_arr(4, 5)))
    with pytest.raises(ValueError, match="row_offset_pattern"):
        geotiff.geotiff_coo(spark, str(tmp_path))


def test_multifile_windowed_ingest_with_offsets(spark, tmp_path):
    """Reference-style windowed load: one file per row window, start row
    encoded in the name; the merged COO equals the unsplit raster."""
    a = _arr(12, 9)
    (tmp_path / "win_y0000.tif").write_bytes(geotiff.write_tiff(a[:5]))
    (tmp_path / "win_y0005.tif").write_bytes(geotiff.write_tiff(a[5:]))
    coo = geotiff.geotiff_coo(
        spark, str(tmp_path), row_offset_pattern=r"_y(\d+)\.tif$"
    )
    rows = coo.collect()
    assert len(rows) == a.size
    got = np.zeros_like(a)
    for r in rows:
        got[r.y, r.x] = r.value
    assert np.array_equal(got, a)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"compression": "deflate"},
        {"tile": (16, 16)},
        {"tile": (32, 16), "compression": "deflate"},
        {"compression": "deflate", "predictor": 2},
        {"tile": (16, 32), "compression": "deflate", "predictor": 2},
        {"compression": "lzw"},
        {"tile": (16, 16), "compression": "lzw", "predictor": 2},
        {"compression": "packbits"},
        {"tile": (16, 16), "compression": "packbits", "predictor": 2},
    ],
    ids=["deflate", "tiled", "tiled-deflate", "deflate-pred2",
         "tiled-deflate-pred2", "lzw", "tiled-lzw-pred2",
         "packbits", "tiled-packbits-pred2"],
)
def test_write_parse_roundtrip_layouts(kwargs):
    """Tiled / Deflate / Predictor=2 layouts (GDAL TILED=YES,
    COMPRESS=DEFLATE, PREDICTOR=2) round-trip bit-exactly, including
    edge tiles on non-multiple-of-16 dims and negative values."""
    a = _arr(29, 41)
    data = geotiff.write_tiff(a, origin=(-5.0, 7.5), **kwargs)
    hdr = geotiff.parse_tiff(data)
    assert (hdr["height"], hdr["width"]) == a.shape
    assert hdr["origin"] == (-5.0, 7.5)
    assert np.array_equal(geotiff.tiff_to_array(data), a)
    if kwargs.get("compression") in ("deflate", "lzw"):
        assert len(data) < a.nbytes  # actually compressed


def test_multiband_tiled_deflate_roundtrip():
    a = _arr3(3, 23, 37)
    data = geotiff.write_tiff(a, tile=(16, 16), compression="deflate", predictor=2)
    assert np.array_equal(geotiff.tiff_to_array(data), a)


def test_geotiff_coo_tiled_deflate_matches(spark, tmp_path):
    """Distributed ingest of a tiled Deflate file equals the plain
    striped ingest — the window iterator covers tile windows too."""
    a = _arr(50, 33)
    (tmp_path / "t.tif").write_bytes(
        geotiff.write_tiff(a, tile=(16, 16), compression="deflate", predictor=2)
    )
    rows = geotiff.geotiff_coo(spark, str(tmp_path)).collect()
    assert len(rows) == a.size
    got = np.zeros_like(a)
    for r in rows:
        got[r.y, r.x] = r.value
    assert np.array_equal(got, a)


def test_geotiff_coo_3d_tiled_matches(spark, tmp_path):
    a = _arr3(2, 20, 18)
    (tmp_path / "t3.tif").write_bytes(geotiff.write_tiff(a, tile=(16, 16)))
    rows = geotiff.geotiff_coo_3d(spark, str(tmp_path)).collect()
    assert len(rows) == a.size
    got = np.zeros_like(a)
    for r in rows:
        got[r.band, r.y, r.x] = r.value
    assert np.array_equal(got, a)


def test_predictor_wraparound_exact():
    """Predictor=2 differencing wraps mod 2^32; extreme int32 values
    (INT_MIN/INT_MAX adjacencies) must survive the round-trip."""
    a = np.array(
        [[-(2**31), 2**31 - 1, -1, 0, 1], [7, -(2**31), 2**31 - 1, 5, -5]],
        dtype=np.int32,
    )
    data = geotiff.write_tiff(a, compression="deflate", predictor=2)
    assert np.array_equal(geotiff.tiff_to_array(data), a)


def test_bigtiff_parity_matrix():
    """BigTIFF (magic 43) round-trips bit-identically to classic TIFF
    across layouts/codecs/predictor and band counts."""
    rng = np.random.default_rng(3)
    for arr in (
        rng.integers(-5000, 5000, (37, 53), dtype=np.int32),
        rng.integers(0, 255, (3, 32, 48), dtype=np.int32),
    ):
        for kw in (
            dict(),
            dict(compression="deflate", tile=(16, 16), predictor=2),
            dict(compression="lzw"),
            dict(compression="packbits"),
        ):
            classic = geotiff.write_tiff(arr, **kw)
            big = geotiff.write_tiff(arr, bigtiff=True, **kw)
            assert np.array_equal(
                geotiff.tiff_to_array(classic), geotiff.tiff_to_array(big)
            ), kw
            hc, hb = geotiff.parse_tiff(classic), geotiff.parse_tiff(big)
            assert (hc["width"], hc["height"], hc["bands"]) == (
                hb["width"],
                hb["height"],
                hb["bands"],
            )


def test_bigtiff_dims_and_malformed_header(tmp_path):
    rng = np.random.default_rng(5)
    p = tmp_path / "big.tif"
    p.write_bytes(
        geotiff.write_tiff(rng.integers(0, 99, (21, 33), dtype=np.int32), bigtiff=True)
    )
    assert geotiff.tiff_dims(str(p)) == (21, 33)
    import struct

    with pytest.raises(ValueError):
        # BigTIFF with a 4-byte offset size is malformed
        geotiff.parse_tiff(struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16) + b"\x00" * 32)


def test_bigtiff_distributed_ingest_parity(spark, tmp_path):
    """geotiff_coo over a BigTIFF equals the same image's classic-TIFF
    ingest — header layout invisible to the windowed parse path."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 251, (96, 128), dtype=np.int32)
    d1, d2 = tmp_path / "classic", tmp_path / "big"
    d1.mkdir(), d2.mkdir()
    (d1 / "r.tif").write_bytes(
        geotiff.write_tiff(arr, tile=(64, 64), compression="deflate", predictor=2)
    )
    (d2 / "r.tif").write_bytes(
        geotiff.write_tiff(
            arr, tile=(64, 64), compression="deflate", predictor=2, bigtiff=True
        )
    )
    a = sorted(map(tuple, geotiff.geotiff_coo(spark, str(d1)).collect()))
    b = sorted(map(tuple, geotiff.geotiff_coo(spark, str(d2)).collect()))
    assert a == b and len(a) == 96 * 128
