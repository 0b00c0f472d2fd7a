"""Budgeted multi-pass traversal + spp-batched dispatch: CI coverage for the
two production paths that carry BVH-scale scenes on hardware (VERDICT r3
weak #5).

Multi-pass (walk.py `_closest_multi`/`_any_multi`, iwalk.py `_iclosest_multi`/
`_iany_multi`) engages only when a scene has >= PT_WALK_MP_MIN gate entries —
far above any test scene — so these tests monkeypatch the knobs down
(`WALK_MP_MIN` -> 1, `WALK_BUDGET` -> tiny) to force several budgeted passes
on the interpreter and assert BIT-identical outputs vs the single-pass scan
(`WALK_BUDGET` -> 0). That is the correctness contract of the reference's
ordered traversal (blas.rs:214-294): the same closest hit regardless of
traversal schedule.

The spp-batch test crosses the `render_film` dispatch split
(wavefront.py `PT_SPP_BATCH`) and asserts the batched sum is bit-equal to
the unbatched one (the checkpoint/resume design claim of commit 47f122f).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.scene import procedural, triangle
from path_tracer_tpu.scene.model import Model, rigid_transform, rotation_y
from path_tracer_tpu.trace import iwalk, walk


@pytest.fixture(scope="module")
def soup():
    # ~18.5K tris -> ~150 chunks: enough for budget windows of 4/16 to bind
    pos, nrm = procedural.bumpy_sphere(nu=96, nv=96)
    tri = triangle.precompute(pos)
    model = (np.arange(pos.shape[0]) % 7).astype(np.int64)
    eng_np = walk.pack_walk(tri, nrm.reshape(-1, 9), model, pos)
    assert eng_np["w"].shape[1] // (2 * walk.CH_W) >= 100
    return {k: jnp.asarray(v) for k, v in eng_np.items()}


@pytest.fixture(scope="module")
def parts_soup():
    pos, nrm = procedural.bumpy_sphere(nu=68, nv=68)  # ~9K tris
    tri = triangle.precompute(pos)
    model = (np.arange(pos.shape[0]) % 5).astype(np.int64)
    eng_np = walk.pack_walk_parts(tri, nrm.reshape(-1, 9), model, pos,
                                  part_cap=1024)
    assert len(eng_np["parts"]) >= 4

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    return up(eng_np)


def _models():
    sp, sn = procedural.bumpy_sphere(nu=40, nv=40)  # ~3.2K tris
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
def ieng():
    return {k: jnp.asarray(v) for k, v in iwalk.pack_iwalk(_models()).items()}


@pytest.fixture(scope="module")
def veng():
    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    return up(iwalk.pack_vwalk(_models()))


def _rays(n, seed=1, spread=3.0):
    rng = np.random.default_rng(seed)
    o1 = rng.standard_normal((n // 2, 3))
    o1 = o1 / np.linalg.norm(o1, axis=1, keepdims=True) * spread
    d1 = -o1 + rng.standard_normal((n // 2, 3)) * 0.15
    # interior random origins/directions: the incoherent bounce regime that
    # multi-pass exists for
    o2 = (rng.random((n - n // 2, 3)) - 0.5) * 2.0
    d2 = rng.standard_normal((n - n // 2, 3))
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def _force_mp(monkeypatch, budget=4, passes=3):
    """Make multi-pass engage on any engine, with tiny budget windows so
    several passes do real (partial) work."""
    monkeypatch.setattr(walk, "WALK_MP_MIN", 1)
    monkeypatch.setattr(walk, "WALK_BUDGET", budget)
    monkeypatch.setattr(walk, "WALK_PASSES", passes)


def _single_pass(monkeypatch):
    monkeypatch.setattr(walk, "WALK_BUDGET", 0)


def test_multipass_gate(soup, monkeypatch):
    """Sanity: the gate actually flips with the monkeypatched knobs."""
    assert not walk._multi_pass(soup)  # default MP_MIN=512 >> test chunks
    _force_mp(monkeypatch)
    assert walk._multi_pass(soup)
    _single_pass(monkeypatch)
    assert not walk._multi_pass(soup)


@pytest.mark.parametrize("eng_name", ["soup", "parts_soup"])
def test_multipass_closest_bit_identity(eng_name, soup, parts_soup,
                                        monkeypatch):
    eng = {"soup": soup, "parts_soup": parts_soup}[eng_name]
    n = 512
    o, d = _rays(n, seed=21)
    tl = jnp.full((n,), 1e30, jnp.float32)

    _single_pass(monkeypatch)
    ri, rt, ru, rv, rn, rm = walk.walk_closest_hit_shade(eng, o, d, tl)

    _force_mp(monkeypatch)
    bi, bt, bu, bv, bn, bm = walk.walk_closest_hit_shade(eng, o, d, tl)

    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(rt))
    np.testing.assert_array_equal(np.asarray(bu), np.asarray(ru))
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(rn))
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(rm))
    assert (np.asarray(bi) >= 0).sum() > n // 3  # the case is non-trivial


def test_multipass_budget_windows_bind(soup, monkeypatch):
    """With budget=4 over a ~150-chunk soup the early passes MUST leave
    unresolved lanes (otherwise the test exercises nothing): check that a
    single budgeted pass alone disagrees with the full scan for some lane,
    while the assembled multi-pass result is exact."""
    n = 256
    o, d = _rays(n, seed=22)
    tl = jnp.full((n,), 1e30, jnp.float32)
    eng = soup
    _single_pass(monkeypatch)
    ri, rt, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    # one budgeted pass, directly through the parts layer
    out = walk._closest_parts(eng, o, d, tl, walk._interpret_default(),
                              budget=4)
    unresolved = np.asarray(walk._win_admits(out[:, 2],
                                             jnp.minimum(out[:, 0], tl)))
    assert unresolved.any()  # budget binds: some lanes not yet proven
    _force_mp(monkeypatch, budget=4, passes=3)
    bi, bt, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(rt))


@pytest.mark.parametrize("eng_name", ["soup", "parts_soup"])
def test_multipass_any_bit_identity(eng_name, soup, parts_soup, monkeypatch):
    eng = {"soup": soup, "parts_soup": parts_soup}[eng_name]
    n = 384
    o, d = _rays(n, seed=23)
    tl = jnp.full((n,), 1e30, jnp.float32)
    _single_pass(monkeypatch)
    ri, rt, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    hit = np.asarray(ri) >= 0
    rt_np = np.asarray(rt)
    near = jnp.asarray(np.where(hit, rt_np * 0.99, 1e-3).astype(np.float32))
    far = jnp.asarray(np.where(hit, rt_np * 1.01, 1e-3).astype(np.float32))
    a_near_sp = np.asarray(walk.walk_any_hit(eng, o, d, near))
    a_far_sp = np.asarray(walk.walk_any_hit(eng, o, d, far))
    _force_mp(monkeypatch)
    a_near_mp = np.asarray(walk.walk_any_hit(eng, o, d, near))
    a_far_mp = np.asarray(walk.walk_any_hit(eng, o, d, far))
    np.testing.assert_array_equal(a_near_mp, a_near_sp)
    np.testing.assert_array_equal(a_far_mp, a_far_sp)
    assert a_far_sp[hit].all() and not a_near_sp[hit].any()


@pytest.mark.parametrize("eng_name", ["ieng", "veng"])
def test_multipass_twolevel_bit_identity(eng_name, ieng, veng, monkeypatch):
    """iwalk (instance gates) and vwalk (virtual-chunk gates) multi-pass vs
    their own single-pass scans: closest + any, bit-identical."""
    eng = {"ieng": ieng, "veng": veng}[eng_name]
    n = 384
    o, d = _rays(n, seed=24, spread=6.0)
    tl = jnp.full((n,), 1e30, jnp.float32)

    _single_pass(monkeypatch)
    assert not iwalk._ieng_multi(eng)
    ri, rt, ru, rv, rn, rm, rinst = iwalk.iwalk_closest_hit_shade(eng, o, d, tl)
    far = jnp.asarray(np.asarray(rt) * 1.01)
    a_sp = np.asarray(iwalk.iwalk_any_hit(eng, o, d, far))

    _force_mp(monkeypatch, budget=2, passes=3)
    assert iwalk._ieng_multi(eng)
    bi, bt, bu, bv, bn, bm, binst = iwalk.iwalk_closest_hit_shade(eng, o, d, tl)
    a_mp = np.asarray(iwalk.iwalk_any_hit(eng, o, d, far))

    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(rt))
    np.testing.assert_array_equal(np.asarray(bu), np.asarray(ru))
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(rn))
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(rm))
    np.testing.assert_array_equal(np.asarray(binst), np.asarray(rinst))
    np.testing.assert_array_equal(a_mp, a_sp)
    assert (np.asarray(ri) >= 0).sum() > n // 4


def test_spp_batch_identity(monkeypatch):
    """render_film with PT_SPP_BATCH set vs unbatched at spp=8 on a
    walk-engine scene: the dispatch split that bounds TPU watchdog duration
    (wavefront.py) must not change WHAT is rendered. The exact contract
    (measured, see the render_film comment):

    - pinned lanes + batch=1 preserve the per-lane sample add order
      exactly -> BIT-equal sums;
    - pinned lanes + batch>1 reassociate the per-lane sum -> ulp-level
      (~1e-5) differences only;
    - the pooled work queue reschedules (pixel, sample) items across lanes,
      which changes block composition and therefore the walk engine's
      data-dependent chunk-visit ORDER: a handful of knife-edge lanes can
      break an exact-t tie differently (observed: 3 of 3072 elements above
      1e-3). Everything else is reassociation noise (mean rel ~3e-5).

    A sample-indexing bug (missing / doubled / wrongly-seeded sample) would
    shift EVERY pixel by ~1/spp = 12.5%, far outside all three bounds."""
    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film

    scene_host, cam = scenes.mesh_scene(subdivisions=4)
    t = scene_host.num_world_tris
    scene = scene_host.device()
    scene["tri"]["walk"] = {
        k: jnp.asarray(v)
        for k, v in walk.pack_walk(
            scene_host.tri, scene_host.tri["normals"].reshape(t, 9),
            scene_host.tri["model"], scene_host.tri["positions"],
        ).items()
    }
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=8, enable_nee=True, has_lights=True,
              mtypes=scene_host.active_mtypes,
              any_volumes=scene_host.has_volumes)

    def go(batch, pool):
        monkeypatch.setenv("PT_SPP_BATCH", str(batch))
        rad, rays = render_film(scene, ndc, org, 0, 32, 32, 8, pool=pool,
                                **kw)
        return np.asarray(rad), np.asarray(rays)

    # pinned lanes: batch=1 keeps the per-lane add order -> bit-equal
    pin_a, _ = go(0, pool=False)
    pin_b, _ = go(1, pool=False)
    np.testing.assert_array_equal(pin_a, pin_b)
    # pinned, ragged split (8 = 3+3+2): pure float reassociation
    pin_c, _ = go(3, pool=False)
    np.testing.assert_allclose(pin_c, pin_a, atol=1e-4, rtol=1e-5)

    # pooled (the render_film default for walk engines): same samples, new
    # schedule -> reassociation everywhere + rare knife-edge tie flips
    pool_a, rays_a = go(0, pool=None)
    pool_b, rays_b = go(2, pool=None)
    d = np.abs(pool_a - pool_b)
    rel = d / np.maximum(np.abs(pool_a), 1e-3)
    assert rel.mean() < 1e-3, f"mean rel err {rel.mean():.2e}"
    assert (d > 1e-2).mean() < 0.005, f"{(d > 1e-2).sum()} gross outliers"
    # traversal work may shift with block composition, but only slightly
    np.testing.assert_allclose(rays_a, rays_b, rtol=1e-2)
    assert pool_a.mean() > 0.0


def test_default_spp_batch_parts_aware():
    """Dispatch-duration policy (`wavefront._default_spp_batch`): walk-class
    engines split spp by the engine's PART count — the r4 known issue was
    the 18-part dragon two-level faulting the TPU worker at 8 spp per
    dispatch while its 1-spp warmup dispatch survived (RESULTS_r5.md
    bisect: the same run completes at spp_batch=1). Single-part engines
    keep 8 (config-5's 1080p vwalk ran clean, RESULTS_r4.md); non-walk
    engines stay unbounded."""
    from path_tracer_tpu.integrator.wavefront import _default_spp_batch

    part = {"w": 0}
    assert _default_spp_batch({"tri": {"dense": {}}}) == 0
    assert _default_spp_batch({"tri": {"walk": {"w": 0}}}) == 8
    assert _default_spp_batch(
        {"tri": {"walk": {"parts": (part, part)}}}) == 4
    assert _default_spp_batch(
        {"tri": {}, "twolevel": {"iwalk": {"vinst": 0}}}) == 8
    assert _default_spp_batch(
        {"tri": {}, "twolevel": {"iwalk": {"parts": (part,) * 18}}}) == 1
