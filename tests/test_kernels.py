"""Unit tests for the pure-NumPy kernels (no Spark) against brute-force
oracles — the reference has no tests (SURVEY §5), so these pin the
*intended* AFL semantics directly."""

import numpy as np
import pytest

from scidbgeo_spark.fixtures import MIXED_POLYGONS, mixed_zone_numpy
from scidbgeo_spark.kernels import (
    box3_sum_count,
    focal_mean,
    focal_sum36,
    points_in_ring,
    rasterize_tile,
    rolling_fingerprint,
)

RNG = np.random.default_rng(42)


def brute_box3(a, mask):
    h, w = a.shape
    s = np.zeros_like(a)
    c = np.zeros_like(a)
    for i in range(h):
        for j in range(w):
            ys, ye = max(0, i - 1), min(h, i + 2)
            xs, xe = max(0, j - 1), min(w, j + 2)
            sub = a[ys:ye, xs:xe]
            msub = mask[ys:ye, xs:xe]
            s[i, j] = sub[msub].sum()
            c[i, j] = msub.sum()
    return s, c


def test_box3_matches_bruteforce():
    a = RNG.integers(0, 251, size=(13, 9)).astype(np.int64)
    mask = RNG.random((13, 9)) > 0.2
    s, c = box3_sum_count(a, mask)
    bs, bc = brute_box3(np.where(mask, a, 0), mask)
    np.testing.assert_array_equal(s, bs)
    np.testing.assert_array_equal(c, bc)


def test_focal_sum36_whole_array_is_window_avg_sum():
    """sum36/36 == sum of 3x3 shrinking-window means (SciDB window
    truncates at borders — SciDB_analysis.py:81 semantics)."""
    a = RNG.integers(0, 251, size=(20, 17)).astype(np.int64)
    mask = np.ones_like(a, dtype=bool)
    pad_v = np.pad(a, 1)
    pad_m = np.pad(mask, 1)
    s36 = focal_sum36(pad_v, pad_m, (slice(1, 21), slice(1, 18)))
    # brute force float oracle
    bs, bc = brute_box3(a, mask)
    expected = float((bs / bc).sum())
    assert abs(s36 / 36.0 - expected) < 1e-6


def test_focal_mean_shrinks_at_borders():
    a = np.ones((5, 5), dtype=np.int64)
    m = np.pad(np.ones((3, 3), dtype=bool), 1)
    v = np.pad(a[1:4, 1:4], 1)
    out = focal_mean(v, m, (slice(1, 4), slice(1, 4)))
    np.testing.assert_allclose(out, np.ones((3, 3)))


def test_points_in_ring_rect_half_open():
    # [2,5) x [1,4) at integer bounds
    ring = np.array([(2.0, 1.0), (5.0, 1.0), (5.0, 4.0), (2.0, 4.0)])
    xs = np.array([2.0, 4.999, 5.0, 1.999, 3.0, 3.0])
    ys = np.array([1.0, 3.999, 2.0, 2.0, 4.0, 0.999])
    got = points_in_ring(xs, ys, ring)
    np.testing.assert_array_equal(got, [True, True, False, False, False, False])


def test_points_in_ring_nonconvex_L():
    ring = MIXED_POLYGONS[1][1]  # the L-shape
    # in the notch (x in [60,90), y in [30,50)) -> outside
    assert not points_in_ring(np.array([70.5]), np.array([40.5]), ring)[0]
    assert points_in_ring(np.array([45.5]), np.array([40.5]), ring)[0]
    assert points_in_ring(np.array([70.5]), np.array([20.5]), ring)[0]


def test_rasterize_matches_integer_arithmetic_oracle():
    """Ray-cast pixel-center fill == the CASE-WHEN arithmetic the DuckDB
    oracle uses (FIXTURES.md F5: 'that equivalence is itself a test')."""
    want = mixed_zone_numpy(100, 100)
    for (y0, x0, h, w) in [(0, 0, 50, 50), (0, 50, 50, 50), (50, 0, 50, 50), (50, 50, 50, 50)]:
        got = rasterize_tile(y0, x0, h, w, MIXED_POLYGONS).reshape(h, w)
        np.testing.assert_array_equal(got, want[y0 : y0 + h, x0 : x0 + w])


def test_rasterize_burn_order_overwrites():
    z = rasterize_tile(80, 80, 20, 20, MIXED_POLYGONS).reshape(20, 20)
    assert (z == 4).all()  # rect B burned after rect A


@pytest.mark.parametrize("texts", [["abc", "", "a", "abcabcabc"]])
def test_rolling_fingerprint_matches_scalar(texts):
    def scalar(t):
        acc = 0
        for b in t.encode("utf-8"):
            acc = (acc * 257 + b) % 2147483647
        return acc

    got = rolling_fingerprint(texts)
    np.testing.assert_array_equal(got, [scalar(t) for t in texts])


def test_flow_distance_consistent_with_watershed(spark, sf_smoke):
    """Cross-op identities on the same D8 edge set: dist == 0 exactly at
    sinks (cells that are their own basin), and walking any cell's
    basin path length via a Python walk matches dist."""
    from scidbgeo_spark import model, tiling
    from scidbgeo_spark.operators import focal

    coo = model.raster_coo(spark, sf_smoke)
    h, w = model.raster_dims(spark, sf_smoke)
    tiles = tiling.pack_tiles(coo, 50, h, w)
    dist = {
        (r.y, r.x): r.dist
        for r in focal.flow_distance_coo(coo, tiles, h, w, 50).collect()
    }
    basins = {
        (r.y, r.x): (r.basin_y, r.basin_x)
        for r in focal.watershed_basins_coo(coo, tiles, h, w, 50).collect()
    }
    vals = {(r.y, r.x): r.value for r in coo.collect()}

    def next_cell(y, x):
        best = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                t = (y + dy, x + dx)
                if t in vals and vals[t] < vals[(y, x)]:
                    k = (vals[t], t[0], t[1])
                    if best is None or k < best:
                        best = k
        return (best[1], best[2]) if best else None

    import itertools

    for (y, x) in itertools.islice(sorted(dist), 0, 400, 7):
        assert (dist[(y, x)] == 0) == (basins[(y, x)] == (y, x))
        steps, cur = 0, (y, x)
        while True:
            nxt = next_cell(*cur)
            if nxt is None:
                break
            cur = nxt
            steps += 1
        assert steps == dist[(y, x)], (y, x)
        assert cur == basins[(y, x)]
