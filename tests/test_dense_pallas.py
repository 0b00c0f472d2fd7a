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
    dense_pl_closest_hit_shade,
    pack_dense_pl,
    pack_dense_pl_aux,
    pack_dense_pl_cab,
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
    tri["normals_flat"] = rng.normal(size=(t, 9)).astype(np.float32)
    tri["model"] = rng.integers(0, 5, t).astype(np.int32)
    tri["positions"] = pos
    dense_pl = {
        "w": jnp.asarray(pack_dense_pl(tri)),
        "aux": jnp.asarray(pack_dense_pl_aux(tri, tri["normals_flat"], tri["model"])),
        "cab": jnp.asarray(pack_dense_pl_cab(pos)),
    }

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


def test_infinite_t_limit(setup):
    """The integrator passes t_limit = inf for live lanes; the kernel must
    not NaN-poison its matmul through the tlim ray slot (regression:
    inf * 0-weight = NaN blacked out whole renders)."""
    tri, dense_pl, o, d = setup
    inf = jnp.full(o.shape[0], np.inf, jnp.float32)
    big = jnp.full(o.shape[0], 1e30, jnp.float32)
    bi, ti_, ui, vi = dense_pl_closest_hit(dense_pl, o, d, inf)
    bb, tb, ub, vb = dense_pl_closest_hit(dense_pl, o, d, big)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bb))
    hit = np.asarray(bb) >= 0
    assert hit.any()
    np.testing.assert_array_equal(np.asarray(ti_)[hit], np.asarray(tb)[hit])
    # any-hit under inf limit equals any-hit under the huge finite limit
    np.testing.assert_array_equal(
        np.asarray(dense_pl_any_hit(dense_pl, o, d, inf)),
        np.asarray(dense_pl_any_hit(dense_pl, o, d, big)),
    )


def test_shade_epilogue_matches_host(setup):
    """The in-kernel one-hot fetch returns the winner's interpolated normal
    and model id exactly (one nonzero product per output)."""
    tri, dense_pl, o, d = setup
    tlim = jnp.full(o.shape[0], 1e30, jnp.float32)
    pb, pt, pu, pv, n_raw, model = dense_pl_closest_hit_shade(dense_pl, o, d, tlim)
    pb, pu, pv = np.asarray(pb), np.asarray(pu), np.asarray(pv)
    hit = pb >= 0
    assert hit.any()
    np.testing.assert_array_equal(np.asarray(model)[hit], tri["model"][pb[hit]])
    nf = tri["normals_flat"][pb[hit]]
    w = 1.0 - pu[hit] - pv[hit]
    expect = (
        nf[:, 0:3] * w[:, None] + nf[:, 3:6] * pu[hit][:, None] + nf[:, 6:9] * pv[hit][:, None]
    )
    np.testing.assert_allclose(np.asarray(n_raw)[hit], expect, rtol=1e-6, atol=1e-6)
    # misses return zeros / -1
    assert (np.asarray(model)[~hit] == 0).all()
    assert (np.asarray(n_raw)[~hit] == 0).all()


def test_chunk_culling_preserves_hits():
    """Spatially clustered chunks (the real layout: SAH leaf order) with rays
    aimed so most blocks cull most chunks — results must equal the oracle,
    including rays whose blocks cull EVERY chunk (guaranteed misses)."""
    rng = np.random.default_rng(11)
    t = 1200  # 3 chunks of 512 after padding
    # three well-separated clusters along x, in triangle-index order
    centers = np.repeat(np.array([[-20.0, 0, 0], [0, 0, 0], [20.0, 0, 0]]), 400, axis=0)
    v0 = (centers + rng.uniform(-1, 1, (t, 3))).astype(np.float32)
    v1 = v0 + rng.uniform(-0.2, 0.2, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.2, 0.2, (t, 3)).astype(np.float32)
    pos = np.stack([v0, v1, v2], axis=1)
    tri = dict(tri_mod.precompute(pos))
    tri["packed"] = jnp.asarray(pack_tris(tri))
    dense_pl = {
        "w": jnp.asarray(pack_dense_pl(tri)),
        "aux": jnp.asarray(pack_dense_pl_aux(tri)),
        "cab": jnp.asarray(pack_dense_pl_cab(pos)),
    }
    n = 512  # two full blocks
    # block 0: rays near the middle cluster pointing +y-ish (hits only mid);
    # block 1: rays far away pointing AWAY from everything (all-cull path)
    o = np.concatenate([
        rng.uniform(-1.5, 1.5, (256, 3)),
        rng.uniform(99.0, 100.0, (256, 3)),
    ]).astype(np.float32)
    d = np.concatenate([
        rng.normal(0, 1, (256, 3)),
        np.abs(rng.normal(0, 1, (256, 3))),  # +octant, away from clusters
    ]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tlim = jnp.full(n, 1e30, jnp.float32)

    bb, bt, bu, bv = brute_force_closest(tri, o, d, tlim)
    pb, pt, pu, pv = dense_pl_closest_hit(dense_pl, o, d, tlim)
    np.testing.assert_array_equal(np.asarray(bb), np.asarray(pb))
    hit = np.asarray(bb) >= 0
    assert hit.any() and not hit[256:].any()
    np.testing.assert_allclose(np.asarray(bt)[hit], np.asarray(pt)[hit], rtol=2e-4, atol=5e-6)
    # any-hit agrees with closest-hit hit/miss under the same limits
    np.testing.assert_array_equal(
        np.asarray(dense_pl_any_hit(dense_pl, o, d, tlim)), hit
    )


def test_parts_engine_matches_single_table(setup):
    """The chained <=16K-part engine (>16K-tri scenes) returns the same
    winners/t/shading as one table over the same soup — global index offsets,
    the shrinking t window, and cross-part tie order (earlier part wins)."""
    from path_tracer_tpu.trace.dense_pallas import (
        dense_pl_parts_any_hit,
        dense_pl_parts_closest_hit_shade,
        pack_dense_pl_parts,
    )

    tri, dense_pl, o, d = setup
    parts = pack_dense_pl_parts(
        tri, tri["normals_flat"], tri["model"],
        tri["positions"], part_tris=256,  # forces 3 parts of the 700 tris
    )
    assert len(parts) == 3
    parts = [{k: (jnp.asarray(v) if k != "base" else v) for k, v in p.items()} for p in parts]
    tlim = jnp.full(o.shape[0], 1e30, jnp.float32)
    sb, st, su, sv, sn, sm = dense_pl_closest_hit_shade(dense_pl, o, d, tlim)
    pb, pt, pu, pv, pn, pm = dense_pl_parts_closest_hit_shade(parts, o, d, tlim)
    np.testing.assert_array_equal(np.asarray(sb), np.asarray(pb))
    hit = np.asarray(sb) >= 0
    np.testing.assert_allclose(np.asarray(st)[hit], np.asarray(pt)[hit], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sm)[hit], np.asarray(pm)[hit])
    np.testing.assert_allclose(np.asarray(sn)[hit], np.asarray(pn)[hit], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(dense_pl_any_hit(dense_pl, o, d, tlim)),
        np.asarray(dense_pl_parts_any_hit(parts, o, d, tlim)),
    )


def test_culling_survives_nan_dead_lanes(setup):
    """Integrator dead/regen lanes carry t_limit = 0 and sometimes NaN
    origin/direction. They must not poison the block's culling bounds
    (regression: one NaN lane collapsed the interval test and culled every
    chunk for the 255 live lanes sharing its block, brightening renders)."""
    tri, dense_pl, o, d = setup
    n = o.shape[0]
    lim = jnp.full(n, 1e30, jnp.float32)
    ref = dense_pl_closest_hit(dense_pl, o, d, lim)

    bad = np.zeros(n, bool)
    bad[::7] = True  # scattered through every block
    o2 = np.asarray(o).copy()
    d2 = np.asarray(d).copy()
    o2[bad] = np.nan
    d2[bad] = np.nan
    lim2 = np.where(bad, 0.0, 1e30).astype(np.float32)
    got = dense_pl_closest_hit(dense_pl, jnp.asarray(o2), jnp.asarray(d2), jnp.asarray(lim2))

    good = ~bad
    np.testing.assert_array_equal(np.asarray(ref[0])[good], np.asarray(got[0])[good])
    hit = np.asarray(ref[0])[good] >= 0
    np.testing.assert_array_equal(np.asarray(ref[1])[good][hit], np.asarray(got[1])[good][hit])
    # NaN lanes themselves report a miss
    assert (np.asarray(got[0])[bad] == -1).all()


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
