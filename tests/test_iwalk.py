"""Instanced walk engine (trace/iwalk.py) vs the baked brute-force oracle,
under the Pallas interpreter (CPU). The oracle bakes every instance to world
space and brute-forces the soup — instance gating, in-kernel object-space
transforms, winner mapping, deferred normal rotation and any-hit early exit
must all agree with it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.scene import procedural, triangle
from path_tracer_tpu.scene.model import Model, rigid_transform, rotation_y
from path_tracer_tpu.trace import iwalk
from path_tracer_tpu.trace.traversal import brute_force_closest, pack_tris


def _models():
    sp, sn = procedural.bumpy_sphere(nu=40, nv=40)       # ~3.2K tris
    bp, bn = procedural.box((0.0, 0.0, 0.0), (0.6, 0.6, 0.6))
    mats_a = [
        rigid_transform(rotation_y(0.5), (-2.0, 0.0, 0.0)),
        rigid_transform(rotation_y(1.7), (2.0, 0.3, 0.5)),
        rigid_transform(rotation_y(2.9), (0.0, -0.4, -2.0)),
    ]
    mats_b = [
        rigid_transform(rotation_y(0.9), (0.0, 1.8, 0.0)),
        rigid_transform(rotation_y(2.1), (0.0, 0.0, 2.2)),
    ]
    return [
        Model(None, matrices=mats_a, positions=sp, normals=sn),
        Model(None, matrices=mats_b, positions=bp, normals=bn),
    ]


@pytest.fixture(scope="module")
def setup():
    models = _models()
    eng_np = iwalk.pack_iwalk(models)
    assert eng_np["inst_f"].shape[0] == 5

    def up(x):
        return {k: jnp.asarray(v) for k, v in x.items()}

    eng = up(eng_np)

    # baked world-space oracle soup
    pos_w, nrm_w, model_id = [], [], []
    for mid, m in enumerate(models):
        for mat in m.matrices:
            p, n = triangle.transform(m.positions, m.normals, np.asarray(mat, np.float32))
            pos_w.append(p)
            nrm_w.append(n)
            model_id.append(np.full(p.shape[0], mid, np.int64))
    pos_w = np.concatenate(pos_w)
    nrm_w = np.concatenate(nrm_w)
    model_id = np.concatenate(model_id)
    tri_w = triangle.precompute(pos_w)
    return eng, tri_w, pos_w, nrm_w, model_id, models


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 6.0
    d = -o + rng.standard_normal((n, 3)) * 0.6
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32))


def test_iwalk_closest_matches_baked_brute_force(setup):
    eng, tri_w, pos_w, nrm_w, model_id, models = setup
    n = 512
    o, d = _rays(n)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv, nn, mm, inst = iwalk.iwalk_closest_hit_shade(eng, o, d, tl)
    ri, rt, ru, rv = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri_w))}, o, d, tl
    )
    bi, ri = np.asarray(bi), np.asarray(ri)
    assert ((bi >= 0) == (ri >= 0)).all()
    both = (bi >= 0) & (ri >= 0)
    assert both.sum() > n // 3
    # t agrees to f32 rigid-transform noise; hit model ids agree exactly
    np.testing.assert_allclose(
        np.asarray(bt)[both], np.asarray(rt)[both], rtol=2e-4, atol=1e-5
    )
    assert (np.asarray(mm)[both] == model_id[ri[both]]).all()
    assert (np.asarray(inst)[both] >= 0).all()
    assert (np.asarray(inst)[~both] == -1).all()
    # world normals: compare against the baked soup's interpolated normal
    # at the ORACLE's (u, v); direction-insensitive up to normalization
    u_r, v_r = np.asarray(ru)[both], np.asarray(rv)[both]
    w_r = 1.0 - u_r - v_r
    nref = (
        w_r[:, None] * nrm_w[ri[both], 0]
        + u_r[:, None] * nrm_w[ri[both], 1]
        + v_r[:, None] * nrm_w[ri[both], 2]
    )
    nref /= np.maximum(np.linalg.norm(nref, axis=1, keepdims=True), 1e-20)
    ngot = np.asarray(nn)[both]
    ngot /= np.maximum(np.linalg.norm(ngot, axis=1, keepdims=True), 1e-20)
    cos = (nref * ngot).sum(axis=1)
    assert (cos > 0.999).all()


def test_iwalk_any_hit_window_semantics(setup):
    eng, tri_w, *_ = setup
    n = 384
    o, d = _rays(n, seed=2)
    tl = jnp.full((n,), 1e30, jnp.float32)
    ri, rt, _, _ = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri_w))}, o, d, tl
    )
    ri, rt = np.asarray(ri), np.asarray(rt)
    hit = ri >= 0
    near = jnp.asarray(np.where(hit, rt * 0.99, 1e-3).astype(np.float32))
    far = jnp.asarray(np.where(hit, rt * 1.01, 1e-3).astype(np.float32))
    a_near = np.asarray(iwalk.iwalk_any_hit(eng, o, d, near))
    a_far = np.asarray(iwalk.iwalk_any_hit(eng, o, d, far))
    assert not a_near[hit].any()
    assert a_far[hit].all()
    assert not a_far[~hit].any()


def test_iwalk_multipart_matches_single(setup):
    """Force the multi-part split (tiny per-part chunk budget) — winners,
    t and instances must be IDENTICAL to the single-part engine: parts are
    pure work division with a carried t-window."""
    eng, tri_w, *_ = setup
    models = _models()
    eng_mp_np = iwalk.pack_iwalk(models, part_chunks=4, split_chunks=4)
    assert len(eng_mp_np["parts"]) >= 3
    shapes = {p["w"].shape for p in eng_mp_np["parts"]}
    assert len(shapes) == 1  # one compiled kernel across parts

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    eng_mp = up(eng_mp_np)
    n = 384
    o, d = _rays(n, seed=9)
    tl = jnp.full((n,), 1e30, jnp.float32)
    si, st, su, sv, sn, sm, sinst = iwalk.iwalk_closest_hit_shade(eng, o, d, tl)
    mi, mt, mu, mv, mn, mm, minst = iwalk.iwalk_closest_hit_shade(eng_mp, o, d, tl)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(mi))
    np.testing.assert_array_equal(np.asarray(sinst), np.asarray(minst))
    np.testing.assert_allclose(np.asarray(st), np.asarray(mt), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sm), np.asarray(mm))
    a_s = np.asarray(iwalk.iwalk_any_hit(eng, o, d, jnp.asarray(np.asarray(st) * 1.01)))
    a_m = np.asarray(iwalk.iwalk_any_hit(eng_mp, o, d, jnp.asarray(np.asarray(st) * 1.01)))
    np.testing.assert_array_equal(a_s, a_m)


def test_iwalk_dead_and_nan_lanes(setup):
    eng, *_ = setup
    n = 256
    o, d = _rays(n, seed=3)
    tl_full = jnp.full((n,), 1e30, jnp.float32)
    ref_i, ref_t, _, _, _, _, _ = iwalk.iwalk_closest_hit_shade(eng, o, d, tl_full)
    o_np, tl_np = np.asarray(o).copy(), np.full(n, 1e30, np.float32)
    tl_np[np.arange(n) % 3 == 0] = 0.0
    o_np[np.arange(n) % 7 == 0] = np.nan
    tl_np[np.arange(n) % 7 == 0] = 0.0
    live = tl_np > 0.0
    bi, _, _, _, _, _, _ = iwalk.iwalk_closest_hit_shade(
        eng, jnp.asarray(o_np), d, jnp.asarray(tl_np)
    )
    assert (np.asarray(bi)[live] == np.asarray(ref_i)[live]).all()
    a = iwalk.iwalk_any_hit(eng, jnp.asarray(o_np), d, jnp.asarray(tl_np))
    assert not np.asarray(a)[~live].any()


@pytest.fixture(scope="module")
def vsetup():
    """Virtual-chunk two-level engine (vwalk) over the same model set."""
    eng_np = iwalk.pack_vwalk(_models())
    assert "vinst" in eng_np and "parts" not in eng_np

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    return up(eng_np)


def test_vwalk_closest_matches_baked_brute_force(setup, vsetup):
    _, tri_w, pos_w, nrm_w, model_id, _ = setup
    n = 512
    o, d = _rays(n)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv, nn, mm, inst = iwalk.iwalk_closest_hit_shade(
        vsetup, o, d, tl)
    ri, rt, _, _ = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri_w))}, o, d, tl
    )
    bi, ri = np.asarray(bi), np.asarray(ri)
    assert ((bi >= 0) == (ri >= 0)).all()
    both = (bi >= 0) & (ri >= 0)
    assert both.sum() > n // 3
    np.testing.assert_allclose(
        np.asarray(bt)[both], np.asarray(rt)[both], rtol=2e-4, atol=1e-5
    )
    assert (np.asarray(mm)[both] == model_id[ri[both]]).all()
    assert (np.asarray(inst)[both] >= 0).all()
    assert (np.asarray(inst)[~both] == -1).all()


def test_vwalk_matches_iwalk_and_multipart(setup, vsetup):
    """vwalk is a pure engine change: winners, instances, t, and any-hit
    must be IDENTICAL to iwalk's (same exact-f32 chunk test through the
    same object-space transform), and the forced multi-part split must be
    identical to single-part (pure work division, carried t-window)."""
    eng_i, *_ = setup
    eng_vm_np = iwalk.pack_vwalk(_models(), split_vch=16)
    assert len(eng_vm_np["parts"]) >= 3
    assert len({p["w"].shape for p in eng_vm_np["parts"]}) == 1
    assert len({p["ord_oct"].shape for p in eng_vm_np["parts"]}) == 1

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    eng_vm = up(eng_vm_np)
    n = 384
    o, d = _rays(n, seed=9)
    tl = jnp.full((n,), 1e30, jnp.float32)
    ii, it, _, _, _, im, iinst = iwalk.iwalk_closest_hit_shade(eng_i, o, d, tl)
    vi, vt, _, _, _, vm, vinst = iwalk.iwalk_closest_hit_shade(vsetup, o, d, tl)
    mi, mt, _, _, _, mm_, minst = iwalk.iwalk_closest_hit_shade(eng_vm, o, d, tl)
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(vi))
    np.testing.assert_array_equal(np.asarray(iinst), np.asarray(vinst))
    np.testing.assert_array_equal(np.asarray(it), np.asarray(vt))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(mi))
    np.testing.assert_array_equal(np.asarray(vinst), np.asarray(minst))
    np.testing.assert_array_equal(np.asarray(vt), np.asarray(mt))
    far = jnp.asarray(np.asarray(it) * 1.01)
    a_i = np.asarray(iwalk.iwalk_any_hit(eng_i, o, d, far))
    a_v = np.asarray(iwalk.iwalk_any_hit(vsetup, o, d, far))
    a_m = np.asarray(iwalk.iwalk_any_hit(eng_vm, o, d, far))
    np.testing.assert_array_equal(a_i, a_v)
    np.testing.assert_array_equal(a_v, a_m)


def test_vwalk_dead_and_nan_lanes(vsetup):
    n = 256
    o, d = _rays(n, seed=3)
    tl_full = jnp.full((n,), 1e30, jnp.float32)
    ref_i, *_ = iwalk.iwalk_closest_hit_shade(vsetup, o, d, tl_full)
    o_np, tl_np = np.asarray(o).copy(), np.full(n, 1e30, np.float32)
    tl_np[np.arange(n) % 3 == 0] = 0.0
    o_np[np.arange(n) % 7 == 0] = np.nan
    tl_np[np.arange(n) % 7 == 0] = 0.0
    live = tl_np > 0.0
    bi, *_ = iwalk.iwalk_closest_hit_shade(
        vsetup, jnp.asarray(o_np), d, jnp.asarray(tl_np)
    )
    assert (np.asarray(bi)[live] == np.asarray(ref_i)[live]).all()
    a = iwalk.iwalk_any_hit(vsetup, jnp.asarray(o_np), d, jnp.asarray(tl_np))
    assert not np.asarray(a)[~live].any()


def test_vwalk_engine_validator(vsetup):
    """Structural invariants incl. the vwalk tables (vinst/vchunk/vglob
    ranges, layout-vs-octant box-table consistency), single and multi-part."""
    from path_tracer_tpu.utils.debug import validate_walk_engine

    models = _models()
    nt = sum(np.asarray(m.positions).shape[0] for m in models)
    validate_walk_engine(vsetup, nt)
    validate_walk_engine(iwalk.pack_vwalk(models, split_vch=16), nt)


def test_vwalk_lskip_invariance(vsetup, monkeypatch):
    """Hierarchical window skips through the vwalk kernels: identical
    closest/any results with the levels on and off (see walk.test)."""
    n = 256
    o, d = _rays(n, seed=5)
    tl = jnp.full((n,), 1e30, jnp.float32)
    got = {}
    for flag in (True, False):
        monkeypatch.setattr(iwalk, "WALK_LSKIP", flag)
        bi, bt, _, _, _, _, inst = iwalk.iwalk_closest_hit_shade(
            vsetup, o, d, tl)
        ah = iwalk.iwalk_any_hit(vsetup, o, d,
                                 jnp.asarray(np.asarray(bt) * 1.01))
        got[flag] = tuple(np.asarray(x) for x in (bi, bt, inst, ah))
    for a, b in zip(got[True], got[False]):
        np.testing.assert_array_equal(a, b)
