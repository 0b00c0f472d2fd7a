"""SAH chunk-tree walk engine (trace/walk.py) vs the brute-force oracle,
under the Pallas interpreter (CPU). Covers multi-part streaming, the scalar
tree walk, winner mapping back to soup order through the SAH permutation,
shading attributes, any-hit window semantics, the coherence sort round-trip,
and dead/NaN-lane soundness.

NOTE: the interpreter runs exact f32 — TPU-side precision is covered by
benches/oracle_check.py on real hardware (the round-1 lesson).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.scene import procedural, triangle
from path_tracer_tpu.trace import walk
from path_tracer_tpu.trace.traversal import brute_force_closest, pack_tris


@pytest.fixture(scope="module")
def soup():
    # ~37K tris -> a few hundred chunks through the chunk partition
    pos, nrm = procedural.bumpy_sphere(nu=136, nv=136)
    tri = triangle.precompute(pos)
    model = (np.arange(pos.shape[0]) % 7).astype(np.int64)
    eng_np = walk.pack_walk(tri, nrm.reshape(-1, 9), model, pos)
    assert eng_np["w"].shape[1] // (2 * walk.CH_W) >= 64  # many chunks
    eng = {k: jnp.asarray(v) for k, v in eng_np.items()}
    return eng, tri, model, nrm


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o1 = rng.standard_normal((n // 2, 3))
    o1 = o1 / np.linalg.norm(o1, axis=1, keepdims=True) * 3.0
    d1 = -o1 + rng.standard_normal((n // 2, 3)) * 0.15
    o2 = (rng.random((n - n // 2, 3)) - 0.5) * 2.0
    d2 = rng.standard_normal((n - n // 2, 3))
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_closest_matches_brute_force(soup):
    eng, tri, model, nrm = soup
    n = 512
    o, d = _rays(n)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv, nn, mm = walk.walk_closest_hit_shade(eng, o, d, tl)
    ri, rt, ru, rv = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri))}, o, d, tl
    )
    bi, ri = np.asarray(bi), np.asarray(ri)
    assert ((bi >= 0) == (ri >= 0)).all()
    both = (bi >= 0) & (ri >= 0)
    assert both.sum() > n // 3
    assert (bi[both] == ri[both]).all()
    np.testing.assert_allclose(
        np.asarray(bt)[both], np.asarray(rt)[both], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bu)[both], np.asarray(ru)[both], rtol=1e-3, atol=1e-4
    )
    assert (np.asarray(mm)[both] == model[bi[both]]).all()
    w = 1.0 - np.asarray(bu)[both] - np.asarray(bv)[both]
    nref = (
        w[:, None] * nrm[bi[both], 0]
        + np.asarray(bu)[both][:, None] * nrm[bi[both], 1]
        + np.asarray(bv)[both][:, None] * nrm[bi[both], 2]
    )
    np.testing.assert_allclose(np.asarray(nn)[both], nref, rtol=1e-3, atol=1e-4)


def test_any_hit_window_semantics(soup):
    eng, tri, _, _ = soup
    n = 512
    o, d = _rays(n, seed=2)
    tl = jnp.full((n,), 1e30, jnp.float32)
    ri, rt, _, _ = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri))}, o, d, tl
    )
    ri, rt = np.asarray(ri), np.asarray(rt)
    hit = ri >= 0
    near = jnp.asarray(np.where(hit, rt * 0.99, 1e-3).astype(np.float32))
    far = jnp.asarray(np.where(hit, rt * 1.01, 1e-3).astype(np.float32))
    a_near = np.asarray(walk.walk_any_hit(eng, o, d, near))
    a_far = np.asarray(walk.walk_any_hit(eng, o, d, far))
    assert not a_near[hit].any()
    assert a_far[hit].all()
    assert not a_far[~hit].any()


def test_ragged_lane_count_and_t_limit(soup):
    eng, tri, _, _ = soup
    n = 333  # not a multiple of SBLK
    o, d = _rays(n, seed=3)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv = walk.walk_closest_hit(eng, o, d, tl)
    assert bi.shape == (n,)
    bt_np, bi_np = np.asarray(bt), np.asarray(bi)
    hit = bi_np >= 0
    lim2 = jnp.asarray(np.where(hit, bt_np * 0.5, 1e-3).astype(np.float32))
    bi2, bt2, _, _ = walk.walk_closest_hit(eng, o, d, lim2)
    assert (np.asarray(bi2)[hit] == -1).all()
    np.testing.assert_allclose(np.asarray(bt2)[hit], bt_np[hit] * 0.5, rtol=1e-6)


def test_dead_and_nan_lanes_do_not_poison_blocks(soup):
    eng, tri, _, _ = soup
    n = 256
    o, d = _rays(n, seed=4)
    tl_full = jnp.full((n,), 1e30, jnp.float32)
    ref_i, ref_t, _, _ = walk.walk_closest_hit(eng, o, d, tl_full)

    o_np, d_np = np.asarray(o).copy(), np.asarray(d).copy()
    tl_np = np.full(n, 1e30, np.float32)
    dead = np.arange(n) % 3 == 0
    tl_np[dead] = 0.0
    o_np[np.arange(n) % 7 == 0] = np.nan
    tl_np[np.arange(n) % 7 == 0] = 0.0
    live = tl_np > 0.0
    bi, bt, _, _ = walk.walk_closest_hit(
        eng, jnp.asarray(o_np), jnp.asarray(d_np), jnp.asarray(tl_np)
    )
    assert (np.asarray(bi)[live] == np.asarray(ref_i)[live]).all()
    a = walk.walk_any_hit(
        eng, jnp.asarray(o_np), jnp.asarray(d_np), jnp.asarray(tl_np)
    )
    assert not np.asarray(a)[~live].any()


def test_single_part_small_soup():
    pos, nrm = procedural.icosphere(subdivisions=3)
    tri = triangle.precompute(pos)
    eng_np = walk.pack_walk(tri, nrm.reshape(-1, 9), None, pos)
    assert eng_np["w"].shape[0] == 8  # compact plane-table rows
    eng = {k: jnp.asarray(v) for k, v in eng_np.items()}
    n = 200
    o, d = _rays(n, seed=5)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv = walk.walk_closest_hit(eng, o, d, tl)
    ri, rt, _, _ = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri))}, o, d, tl
    )
    bi, ri = np.asarray(bi), np.asarray(ri)
    assert ((bi >= 0) == (ri >= 0)).all()
    both = bi >= 0
    assert (bi[both] == ri[both]).all()


@pytest.fixture(scope="module")
def parts_soup():
    # force the multi-part path on a modest soup: ~9K tris, 1K-tri parts
    pos, nrm = procedural.bumpy_sphere(nu=68, nv=68)
    tri = triangle.precompute(pos)
    model = (np.arange(pos.shape[0]) % 5).astype(np.int64)
    eng_np = walk.pack_walk_parts(
        tri, nrm.reshape(-1, 9), model, pos, part_cap=1024
    )
    assert len(eng_np["parts"]) >= 4
    # all parts padded to ONE kernel shape
    shapes = {p["w"].shape for p in eng_np["parts"]}
    assert len(shapes) == 1

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return tuple(up(v) for v in x)
        return jnp.asarray(x)

    return up(eng_np), tri, model, nrm


def test_parts_closest_matches_brute_force(parts_soup):
    eng, tri, model, nrm = parts_soup
    n = 512
    o, d = _rays(n, seed=11)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi, bt, bu, bv, nn, mm = walk.walk_closest_hit_shade(eng, o, d, tl)
    ri, rt, ru, rv = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri))}, o, d, tl
    )
    bi, ri = np.asarray(bi), np.asarray(ri)
    assert ((bi >= 0) == (ri >= 0)).all()
    both = (bi >= 0) & (ri >= 0)
    assert both.sum() > n // 3
    assert (bi[both] == ri[both]).all()
    np.testing.assert_allclose(
        np.asarray(bt)[both], np.asarray(rt)[both], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(mm)[both] == model[bi[both]]).all()


def test_parts_any_hit_window_semantics(parts_soup):
    eng, tri, _, _ = parts_soup
    n = 384
    o, d = _rays(n, seed=12)
    tl = jnp.full((n,), 1e30, jnp.float32)
    ri, rt, _, _ = brute_force_closest(
        {"packed": jnp.asarray(pack_tris(tri))}, o, d, tl
    )
    ri, rt = np.asarray(ri), np.asarray(rt)
    hit = ri >= 0
    near = jnp.asarray(np.where(hit, rt * 0.99, 1e-3).astype(np.float32))
    far = jnp.asarray(np.where(hit, rt * 1.01, 1e-3).astype(np.float32))
    a_near = np.asarray(walk.walk_any_hit(eng, o, d, near))
    a_far = np.asarray(walk.walk_any_hit(eng, o, d, far))
    assert not a_near[hit].any()
    assert a_far[hit].all()
    assert not a_far[~hit].any()


def test_sort_disabled_matches(soup):
    """The coherence sort is a pure reordering — results must be identical
    with it disabled."""
    eng, tri, _, _ = soup
    n = 256
    o, d = _rays(n, seed=6)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi_a, bt_a, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    old = walk.WALK_SORT
    walk.WALK_SORT = False
    try:
        bi_b, bt_b, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    finally:
        walk.WALK_SORT = old
    assert (np.asarray(bi_a) == np.asarray(bi_b)).all()
    np.testing.assert_array_equal(np.asarray(bt_a), np.asarray(bt_b))


def test_walk_engine_validator(soup, parts_soup):
    from path_tracer_tpu.utils.debug import validate_walk_engine

    eng, tri, _, _ = soup
    t = tri["d0"].shape[0]
    validate_walk_engine(eng, t)
    eng_p, tri_p, _, _ = parts_soup
    validate_walk_engine(eng_p, tri_p["d0"].shape[0])


@pytest.mark.parametrize("obits", [0, 9])
def test_key_obits_invariance(soup, monkeypatch, obits):
    """PT_WALK_KEY_OBITS only reshapes the coherence-sort key (origin-cell
    vs direction-cone bits) — any value must leave results IDENTICAL; the
    knob is a pure perf A/B (hardware session ab_obits row)."""
    eng, tri, _, _ = soup
    n = 256
    o, d = _rays(n, seed=7)
    tl = jnp.full((n,), 1e30, jnp.float32)
    bi_a, bt_a, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    monkeypatch.setattr(walk, "_KEY_OBITS", obits)
    bi_b, bt_b, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    assert (np.asarray(bi_a) == np.asarray(bi_b)).all()
    np.testing.assert_array_equal(np.asarray(bt_a), np.asarray(bt_b))
    a_a = walk.walk_any_hit(eng, o, d, jnp.asarray(np.asarray(bt_a) * 1.01))
    monkeypatch.setattr(walk, "_KEY_OBITS", 15)
    a_b = walk.walk_any_hit(eng, o, d, jnp.asarray(np.asarray(bt_a) * 1.01))
    np.testing.assert_array_equal(np.asarray(a_a), np.asarray(a_b))


def test_mask_layout_invariance(soup, parts_soup, monkeypatch):
    """PT_WALK_MASK_LAYOUT=1 gates in chunk-LAYOUT order against one shared
    box table and permutes ok/tent afterwards — same values, same expression
    order, so masks must be BIT-IDENTICAL at real positions (pad ranks are
    explicitly off in layout mode; they are harmless chunk-0 revisits in the
    default mode) and end-to-end hits identical. Pure memory-traffic A/B."""
    eng, tri, _, _ = soup
    n = 256
    o, d = _rays(n, seed=11)
    tl = jnp.full((n,), 1e30, jnp.float32)
    tlc = walk._exit_clamp(eng, o, d, tl)
    k = int(np.asarray(eng["pos_valid"]).sum())

    def mask_real(e):
        _, words, tent, oct_b, _, _ = walk._build_mask(e, o, d, tlc)
        bits = (
            (np.asarray(words)[:, :, None]
             >> np.arange(32, dtype=np.int32)[None, None]) & 1
        ).reshape(words.shape[0], -1)
        return bits[:, :k], np.asarray(tent)[:, :k], np.asarray(oct_b)

    bits_a, tent_a, oct_a = mask_real(eng)
    bi_a, bt_a, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    pi_a, pt_a, _, _ = walk.walk_closest_hit(parts_soup[0], o, d, tl)
    any_a = walk.walk_any_hit(eng, o, d, jnp.asarray(np.asarray(bt_a) * 1.01))

    monkeypatch.setattr(walk, "_MASK_LAYOUT", True)
    bits_b, tent_b, oct_b = mask_real(eng)
    np.testing.assert_array_equal(oct_a, oct_b)
    np.testing.assert_array_equal(bits_a, bits_b)
    np.testing.assert_array_equal(tent_a, tent_b)
    bi_b, bt_b, _, _ = walk.walk_closest_hit(eng, o, d, tl)
    pi_b, pt_b, _, _ = walk.walk_closest_hit(parts_soup[0], o, d, tl)
    any_b = walk.walk_any_hit(eng, o, d, jnp.asarray(np.asarray(bt_a) * 1.01))
    assert (np.asarray(bi_a) == np.asarray(bi_b)).all()
    np.testing.assert_array_equal(np.asarray(bt_a), np.asarray(bt_b))
    assert (np.asarray(pi_a) == np.asarray(pi_b)).all()
    np.testing.assert_array_equal(np.asarray(pt_a), np.asarray(pt_b))
    np.testing.assert_array_equal(np.asarray(any_a), np.asarray(any_b))


def test_lskip_invariance(soup, parts_soup, monkeypatch):
    """Hierarchical window skips (word/summary min-tent levels) may only
    change HOW entries are skipped, never which chunks are visited: a level
    skips iff every entry in it fails the same per-entry admit inequality.
    Closest/any results must be bit-identical with the levels on and off."""
    eng, tri, _, _ = soup
    n = 512
    o, d = _rays(n, seed=13)
    tl = jnp.full((n,), 1e30, jnp.float32)
    results = {}
    for flag in (True, False):
        monkeypatch.setattr(walk, "WALK_LSKIP", flag)
        bi, bt, _, _ = walk.walk_closest_hit(eng, o, d, tl)
        pi, pt, _, _ = walk.walk_closest_hit(parts_soup[0], o, d, tl)
        ah = walk.walk_any_hit(eng, o, d, jnp.asarray(np.asarray(bt) * 1.01))
        results[flag] = tuple(np.asarray(x) for x in (bi, bt, pi, pt, ah))
    for a, b in zip(results[True], results[False]):
        np.testing.assert_array_equal(a, b)
