"""DFS stream-sweep traversal vs stack traversal and brute force."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.scene import bvh, procedural, triangle
from path_tracer_tpu.trace import sweep, traversal


def _geom(positions):
    pre = triangle.precompute(positions)
    bb_min, bb_max = triangle.aabbs(positions)
    flat, perm, _ = bvh.build_bvh(bb_min, bb_max)
    pre = {k: v[perm] for k, v in pre.items()}
    tri_packed = traversal.pack_tris(pre)
    stream = sweep.build_stream(flat, tri_packed)
    tri = {k: jnp.asarray(v) for k, v in pre.items()}
    tri["packed"] = jnp.asarray(tri_packed)
    flat_j = {k: jnp.asarray(v) for k, v in flat.items()}
    flat_j["packed"] = jnp.asarray(traversal.pack_bvh(flat))
    return flat_j, tri, jnp.asarray(stream)


def _rays(n, rs, aim=(0.0, 0.0, 0.0)):
    o = rs.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = np.asarray(aim) - o + rs.normal(scale=6.0, size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_stream_structure():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=1)
    pre = triangle.precompute(pos)
    bb_min, bb_max = triangle.aabbs(pos)
    flat, perm, _ = bvh.build_bvh(bb_min, bb_max)
    stream = sweep.build_stream(flat, traversal.pack_tris({k: v[perm] for k, v in pre.items()}))
    types = stream[:, 0]
    # every triangle appears exactly once
    assert int(types.sum()) == pos.shape[0]
    # skip links are monotone and in range
    skips = stream[:, 7].astype(np.int64)
    assert (skips > np.arange(len(stream))).all()
    assert (skips <= len(stream)).all()


def test_sweep_matches_stack_closest():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=2)
    flat, tri, stream = _geom(pos)
    rs = np.random.default_rng(0)
    o, d = _rays(512, rs)
    lim = jnp.full(512, np.inf, jnp.float32)

    si, st, su, sv = sweep.sweep_closest_hit(stream, o, d, lim)
    ti, tt, tu, tv = traversal._closest_hit_impl(flat["packed"], tri["packed"], o, d, lim)
    si, st, ti, tt = map(np.asarray, (si, st, ti, tt))
    np.testing.assert_array_equal(si >= 0, ti >= 0)
    hit = ti >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(st[hit], tt[hit], rtol=1e-5, atol=1e-5)
    assert (si[hit] == ti[hit]).mean() > 0.99  # t-ties may differ
    np.testing.assert_allclose(np.asarray(su)[hit], np.asarray(tu)[hit], rtol=1e-3, atol=1e-4)


def test_sweep_matches_stack_any():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=2)
    flat, tri, stream = _geom(pos)
    rs = np.random.default_rng(1)
    o, d = _rays(256, rs)

    ti, tt, _, _ = traversal._closest_hit_impl(
        flat["packed"], tri["packed"], o, d, jnp.full(256, np.inf, jnp.float32)
    )
    lim = jnp.full(256, 1e9, jnp.float32)
    f_sweep = np.asarray(sweep.sweep_any_hit(stream, o, d, lim))
    np.testing.assert_array_equal(f_sweep, np.asarray(ti) >= 0)

    # below-closest limit finds nothing
    tt = np.asarray(tt)
    hit = np.asarray(ti) >= 0
    lim2 = jnp.asarray(np.where(hit, tt * 0.99, 1e-3), jnp.float32)
    f2 = np.asarray(sweep.sweep_any_hit(stream, o, d, lim2))
    assert not f2[hit].any()


def test_sweep_zero_limit_is_noop():
    pos, _ = procedural.icosphere(radius=5.0, subdivisions=1)
    _, _, stream = _geom(pos)
    o = jnp.zeros((8, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 20.0])
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (8, 1)), jnp.float32)
    lim = jnp.zeros(8, jnp.float32)
    i, t, _, _ = sweep.sweep_closest_hit(stream, o, d, lim)
    assert (np.asarray(i) == -1).all()
    assert not np.asarray(sweep.sweep_any_hit(stream, o, d, lim)).any()


def test_scene_device_includes_stream_for_small_scene():
    from path_tracer_tpu import scenes

    scene_host, _ = scenes.cornell_diffuse()
    data = scene_host.device()
    assert "stream" in data["bvh"]
    assert "stream" in data["lights_bvh"]
    assert data["bvh"]["stream"].shape[1] == sweep.ROW_W
