"""Pallas dense engine vs the brute-force oracle (interpreter mode on CPU).

The engine itself only activates on TPU backends (scene assembly gates on
``jax.default_backend()``); here the kernel runs under the Pallas interpreter
so its math is validated in the CPU test suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.scene import triangle as tri_mod
from path_tracer_tpu.trace.traversal import brute_force_closest, pack_tris
from path_tracer_tpu.trace.dense_pallas import (
    dense_pl_any_hit,
    dense_pl_closest_hit,
    pack_dense_pl,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    t = 300  # forces multi-chunk path (chunk width 512 -> padded 512... use >512)
    t = 700
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    pos = np.stack([v0, v1, v2], axis=1)
    tri = dict(tri_mod.precompute(pos))
    tri["packed"] = jnp.asarray(pack_tris(tri))
    dense_pl = {"tab": jnp.asarray(pack_dense_pl(tri)), "tri_rows": tri["packed"]}

    n = 200  # non-multiple of BLOCK exercises the ray padding path
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return tri, dense_pl, jnp.asarray(o), jnp.asarray(d)


def test_closest_hit_matches_brute_force(setup):
    tri, dense_pl, o, d = setup
    tlim = jnp.full(o.shape[0], 1e30, jnp.float32)
    bb, bt, bu, bv = brute_force_closest(tri, o, d, tlim)
    pb, pt, pu, pv = dense_pl_closest_hit(dense_pl, o, d, tlim)
    np.testing.assert_array_equal(np.asarray(bb), np.asarray(pb))
    hit = np.asarray(bb) >= 0
    assert hit.any()
    np.testing.assert_allclose(np.asarray(bt)[hit], np.asarray(pt)[hit], rtol=2e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(bu)[hit], np.asarray(pu)[hit], rtol=2e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(bv)[hit], np.asarray(pv)[hit], rtol=2e-4, atol=5e-6)


def test_any_hit_window(setup):
    tri, dense_pl, o, d = setup
    tlim = jnp.full(o.shape[0], 1e30, jnp.float32)
    bb, bt, _, _ = brute_force_closest(tri, o, d, tlim)
    hit = np.asarray(bb) >= 0
    oh, dh = o[hit], d[hit]
    th = np.asarray(bt)[hit]
    # limit just past the closest hit -> found; just before -> not found
    found = dense_pl_any_hit(dense_pl, oh, dh, jnp.asarray(th * 1.001))
    missed = dense_pl_any_hit(dense_pl, oh, dh, jnp.asarray(th * 0.999))
    assert bool(np.asarray(found).all())
    assert not bool(np.asarray(missed).any())


def test_t_limit_respected(setup):
    """Closest hit beyond t_limit is a miss (contract of traversal.closest_hit)."""
    tri, dense_pl, o, d = setup
    tlim = jnp.full(o.shape[0], 1e30, jnp.float32)
    bb, bt, _, _ = brute_force_closest(tri, o, d, tlim)
    hit = np.asarray(bb) >= 0
    oh, dh = o[hit], d[hit]
    th = np.asarray(bt)[hit]
    short = jnp.asarray(th * 0.5)
    pb, pt, _, _ = dense_pl_closest_hit(dense_pl, oh, dh, short)
    miss = np.asarray(pb) == -1
    # every first hit is at th > limit, so any reported hit must beat the limit
    reported = np.asarray(pt)[~miss]
    assert (reported <= np.asarray(short)[~miss] + 1e-6).all()
    assert (np.asarray(pt)[miss] == np.asarray(short)[miss]).all()
