"""Statically-unrolled sweep vs the loop sweep (small N so CPU compiles)."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.scene import bvh, procedural, triangle
from path_tracer_tpu.trace import sweep, traversal


def test_static_sweep_matches_loop():
    # tiny geometry: CPU XLA compiles long straight-line programs very
    # slowly, so keep the unrolled stream short (the TPU path unrolls
    # hundreds of rows happily)
    pos, _ = procedural.box((0.0, 0.0, 0.0), (5.0, 3.0, 4.0))
    pre = triangle.precompute(pos)
    bb_min, bb_max = triangle.aabbs(pos)
    flat, perm, _ = bvh.build_bvh(bb_min, bb_max)
    rows = sweep.build_stream(flat, traversal.pack_tris({k: v[perm] for k, v in pre.items()}))
    static = sweep.StaticStream(rows)
    stream = jnp.asarray(rows)

    rs = np.random.default_rng(0)
    n = 32
    o = rs.uniform(-20, 20, (n, 3)).astype(np.float32)
    d = -o + rs.normal(scale=4.0, size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d, jnp.float32)
    lim = jnp.full(n, np.inf, jnp.float32)

    li, lt, lu, lv = sweep.sweep_closest_hit(stream, o, d, lim)
    si, st, su, sv = sweep.sweep_closest_hit_static(static, o, d, lim)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(li))
    hit = np.asarray(li) >= 0
    assert hit.sum() > 10
    np.testing.assert_allclose(np.asarray(st)[hit], np.asarray(lt)[hit], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(su)[hit], np.asarray(lu)[hit], rtol=1e-5, atol=1e-6)

    fa = sweep.sweep_any_hit(stream, o, d, jnp.full(n, 1e9, jnp.float32))
    fs = sweep.sweep_any_hit_static(static, o, d, jnp.full(n, 1e9, jnp.float32))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fa))


def test_static_stream_hashable_cache_key():
    rows = np.zeros((4, sweep.ROW_W), np.float32)
    a, b = sweep.StaticStream(rows), sweep.StaticStream(rows.copy())
    assert a == b and hash(a) == hash(b)
    rows2 = rows.copy()
    rows2[0, 1] = 1.0
    assert sweep.StaticStream(rows2) != a
