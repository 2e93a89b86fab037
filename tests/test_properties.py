"""Property-based tests (hypothesis) over the frozen kernels — invariants
that hold for ALL inputs, not just fixtures. The reference has no
property-based layer (SURVEY §5.6); this is the from-scratch upgrade of its
runtime assertion lattice (readosm.c:65-68 wrong_assumption).

No Spark session needed — these pin the numpy kernels every UDF derives from.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from temp_c__bpf_osm_reader_spark.functions import codec, geo
from temp_c__bpf_osm_reader_spark.functions.hashing import (
    fnv1a64_bytes,
    fnv1a64_str_array,
    phash64,
    splitmix64,
)

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=180.0, exclude_max=True, allow_nan=False)


@given(st.lists(st.text(max_size=24), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_fnv_vectorized_equals_scalar(strs):
    got = fnv1a64_str_array(strs)
    want = [fnv1a64_bytes(s.encode("utf-8")) for s in strs]
    assert [int(g) for g in got] == want


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_splitmix_is_a_bijection_sample(xs):
    # splitmix64 is invertible → no collisions among distinct inputs
    a = np.array(xs, dtype=np.int64)
    out = splitmix64(a)
    assert len(set(out[np.unique(a, return_index=True)[1]].tolist())) == len(set(xs))


@given(lat_s, lon_s, st.integers(min_value=0, max_value=12))
@settings(max_examples=120, deadline=None)
def test_grid_cell_contains_its_point(lat, lon, res):
    cell = int(geo.grid_cell(np.array([lat]), np.array([lon]), res)[0])
    lat0, lat1, lon0, lon1 = geo.cell_bounds(cell)
    # 1-ulp tolerance: grid_cell floors (x+90)/180*n while cell_bounds
    # reconstructs i/n*180-90 through a different expression tree, so points
    # within float error of a cell edge may reconstruct to the adjacent bound
    tol = 1e-9
    assert lat0 - tol <= lat <= lat1 + tol  # upper edge closed at the pole clip
    assert lon0 - tol <= lon < lon1 + tol or (lon1 - tol <= lon)  # half-open, wrap


@given(lat_s, lon_s, st.integers(min_value=1, max_value=9), st.integers(min_value=0, max_value=8))
@settings(max_examples=120, deadline=None)
def test_cell_parent_is_monotone_in_hierarchy(lat, lon, res, dparent):
    parent_res = max(0, res - dparent)
    fine = geo.grid_cell(np.array([lat]), np.array([lon]), res)
    coarse_direct = geo.grid_cell(np.array([lat]), np.array([lon]), parent_res)
    coarse_via_parent = geo.cell_parent(fine, parent_res)
    assert int(coarse_direct[0]) == int(coarse_via_parent[0])


@given(
    st.integers(min_value=1, max_value=8).flatmap(
        lambda k: st.tuples(
            st.just(8 * k),
            st.just(8 * k),
            st.binary(min_size=64 * k * k, max_size=64 * k * k),
        )
    )
)
@settings(max_examples=40, deadline=None)
def test_codec_raw_roundtrip_any_payload(whb):
    w, h, raw = whb
    px = np.frombuffer(raw, dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(px, "raw"), w, h, "raw"), px)


@given(st.binary(min_size=64, max_size=64))
@settings(max_examples=40, deadline=None)
def test_codec_rle_roundtrip_after_quantize(raw):
    px = codec.quantize_rle(np.frombuffer(raw, dtype=np.uint8))
    assert np.array_equal(codec.decode(codec.encode(px, "rle"), 8, 8, "rle"), px)


@given(st.binary(min_size=64, max_size=64))
@settings(max_examples=40, deadline=None)
def test_phash_invariant_to_constant_shift(raw):
    # adding a constant to every pixel preserves the mean-vs-median bit pattern
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    shifted = (px + 10).astype(np.uint8) if px.max() <= 245 else px.astype(np.uint8)
    if px.max() <= 245:
        assert phash64(px.astype(np.uint8), 8, 8) == phash64(shifted, 8, 8)


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_zigzag_roundtrip_property(vals):
    from temp_c__bpf_osm_reader_spark.sources.blocks import zigzag_encode

    v = np.array(vals, dtype=np.int64)
    z = zigzag_encode(v)
    dec = (z >> 1) ^ -(z & 1)
    assert np.array_equal(dec, v)


ring_s = st.lists(
    st.tuples(
        st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),
        st.floats(min_value=-120.0, max_value=120.0, allow_nan=False),
    ),
    min_size=3,
    max_size=8,
)
pts_s = st.lists(
    st.tuples(
        st.floats(min_value=-65.0, max_value=65.0, allow_nan=False),
        st.floats(min_value=-125.0, max_value=125.0, allow_nan=False),
    ),
    min_size=1,
    max_size=20,
)


@given(ring_s, pts_s, st.integers(min_value=1, max_value=7))
@settings(max_examples=80, deadline=None)
def test_pip_invariant_under_ring_rotation(ring, pts, rot):
    # rotating the ring's starting vertex preserves the directed edge set, so
    # even-odd ray casting must give BIT-identical answers for every point
    ry = np.array([p[0] for p in ring])
    rx = np.array([p[1] for p in ring])
    y = np.array([p[0] for p in pts])
    x = np.array([p[1] for p in pts])
    a = geo.point_in_polygon(y, x, ry, rx)
    k = rot % len(ring)
    b = geo.point_in_polygon(y, x, np.roll(ry, k), np.roll(rx, k))
    assert np.array_equal(a, b)


@given(ring_s, st.integers(min_value=2, max_value=8))
@settings(max_examples=60, deadline=None)
def test_polyfill_bbox_covers_every_vertex_cell(ring, res):
    ry = np.array([p[0] for p in ring])
    rx = np.array([p[1] for p in ring])
    cover = set(geo.polyfill_bbox(ry, rx, res).tolist())
    vertex_cells = set(geo.grid_cell(ry, rx, res).tolist())
    assert vertex_cells <= cover
