"""BVH traversal vs brute-force oracle on random and structured scenes."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.scene import bvh, procedural, triangle
from path_tracer_tpu.trace import traversal


def _make_geom(positions):
    pre = triangle.precompute(positions)
    bb_min, bb_max = triangle.aabbs(positions)
    flat, perm, _ = bvh.build_bvh(bb_min, bb_max)
    tri = {k: jnp.asarray(v[perm]) for k, v in pre.items()}
    tri["packed"] = jnp.asarray(traversal.pack_tris({k: v[perm] for k, v in pre.items()}))
    flat = {k: jnp.asarray(v) for k, v in flat.items()}
    flat["packed"] = jnp.asarray(traversal.pack_bvh(flat))
    return flat, tri, positions[perm]


def _random_rays(n, rs, origin_box=20.0, aim=None, jitter=0.3):
    o = rs.uniform(-origin_box, origin_box, (n, 3)).astype(np.float32)
    if aim is None:
        d = rs.normal(size=(n, 3)).astype(np.float32)
    else:
        d = np.asarray(aim, np.float32) - o + rs.normal(scale=jitter * origin_box, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_closest_hit_matches_brute_force_sphere():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=2)
    flat, tri, _ = _make_geom(pos)
    rs = np.random.default_rng(0)
    o, d = _random_rays(256, rs, aim=(0.0, 0.0, 0.0))
    t_lim = jnp.full(256, np.inf, jnp.float32)

    bi, bt, bu, bv = traversal.brute_force_closest(tri, o, d, t_lim)
    ti, tt, tu, tv = traversal.closest_hit(flat, tri, o, d)

    bi, bt = np.asarray(bi), np.asarray(bt)
    ti, tt = np.asarray(ti), np.asarray(tt)
    hit = bi >= 0
    assert hit.sum() > 20  # sanity: some rays hit
    np.testing.assert_array_equal(ti >= 0, hit)
    np.testing.assert_allclose(tt[hit], bt[hit], rtol=1e-4, atol=1e-4)
    # identical triangle chosen except possible t-ties
    same = ti == bi
    assert same[hit].mean() > 0.99


def test_closest_hit_random_soup():
    rs = np.random.default_rng(3)
    t = 500
    base = rs.uniform(-10, 10, (t, 1, 3))
    pos = (base + rs.uniform(-1, 1, (t, 3, 3))).astype(np.float32)
    flat, tri, _ = _make_geom(pos)
    o, d = _random_rays(512, rs)
    t_lim = jnp.full(512, np.inf, jnp.float32)

    bi, bt, _, _ = traversal.brute_force_closest(tri, o, d, t_lim)
    ti, tt, _, _ = traversal.closest_hit(flat, tri, o, d)
    bi, bt, ti, tt = map(np.asarray, (bi, bt, ti, tt))
    hit = bi >= 0
    np.testing.assert_array_equal(ti >= 0, hit)
    np.testing.assert_allclose(tt[hit], bt[hit], rtol=2e-4, atol=2e-4)


def test_any_hit_consistent_with_closest():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=2)
    flat, tri, _ = _make_geom(pos)
    rs = np.random.default_rng(7)
    o, d = _random_rays(256, rs, aim=(0.0, 0.0, 0.0))

    ti, tt, _, _ = traversal.closest_hit(flat, tri, o, d)
    found = traversal.any_hit(flat, tri, o, d, jnp.full(256, 1e9, jnp.float32))
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ti) >= 0)

    # with t_limit just below the closest hit, any_hit must be False
    tt = np.asarray(tt)
    hit = np.asarray(ti) >= 0
    limit = jnp.asarray(np.where(hit, tt * 0.99, 1e-3).astype(np.float32))
    found2 = np.asarray(traversal.any_hit(flat, tri, o, d, limit))
    assert not found2[hit & (tt < 1e8)].any()


def test_single_triangle_scene():
    pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    flat, tri, _ = _make_geom(pos)
    o = jnp.asarray([[0.2, 0.2, 1.0], [2.0, 2.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    ti, tt, tu, tv = traversal.closest_hit(flat, tri, o, d)
    ti, tt = np.asarray(ti), np.asarray(tt)
    assert ti[0] == 0 and abs(tt[0] - 1.0) < 1e-5
    assert ti[1] == -1
    np.testing.assert_allclose(np.asarray(tu)[0], 0.2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tv)[0], 0.2, atol=1e-5)


def test_dense_engine_matches_stack():
    from path_tracer_tpu.trace import dense as dense_mod

    pos, _ = procedural.icosphere(radius=5.0, subdivisions=2)
    flat, tri, _ = _make_geom(pos)
    d_tbl = {k: jnp.asarray(v) for k, v in dense_mod.pack_dense(
        {kk: np.asarray(vv) for kk, vv in tri.items() if kk != "packed"}).items()}
    rs = np.random.default_rng(11)
    o, d = _random_rays(384, rs, aim=(0.0, 0.0, 0.0))
    lim = jnp.full(384, np.inf, jnp.float32)

    si, st, su, sv = traversal._closest_hit_impl(flat["packed"], tri["packed"], o, d, lim)
    di, dt, du, dv = dense_mod.dense_closest_hit(d_tbl, o, d, lim)
    si, st, di, dt = map(np.asarray, (si, st, di, dt))
    hit = si >= 0
    np.testing.assert_array_equal(di >= 0, hit)
    np.testing.assert_allclose(dt[hit], st[hit], rtol=1e-4, atol=1e-4)
    assert (di[hit] == si[hit]).mean() > 0.99

    fa = np.asarray(dense_mod.dense_any_hit(d_tbl, o, d, jnp.full(384, 1e9, jnp.float32)))
    np.testing.assert_array_equal(fa, hit)
    # zero-extent rays find nothing
    f0 = np.asarray(dense_mod.dense_any_hit(d_tbl, o, d, jnp.zeros(384, jnp.float32)))
    assert not f0.any()
