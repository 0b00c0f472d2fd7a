"""Unit tests for core math: vectors, ONB, RNG, Sobol, tonemap.

Reference formulas are re-derived independently (plain Python ints / NumPy)
and cross-checked against the batched jnp implementations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.core import onb, rng, sobol, tonemap, vecmath

M32 = 0xFFFFFFFF


# ---------- vecmath ----------

def test_reflect_matches_formula():
    rs = np.random.default_rng(0)
    i = rs.normal(size=(64, 3)).astype(np.float32)
    i /= np.linalg.norm(i, axis=-1, keepdims=True)
    n = rs.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    out = np.asarray(vecmath.reflect(jnp.asarray(i), jnp.asarray(n)))
    expect = i - 2.0 * np.sum(i * n, -1, keepdims=True) * n
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
    # reflection preserves length
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_refract_snell_and_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32)
    # 45 degrees incidence going down onto z-up surface
    i = jnp.asarray([[np.sqrt(0.5), 0.0, -np.sqrt(0.5)]] * 2, jnp.float32)
    eta = jnp.asarray([1.0 / 1.5, 1.5], jnp.float32)  # enter glass / TIR case
    refracted, tir = vecmath.refract(i, n, eta)
    refracted = np.asarray(refracted)
    tir = np.asarray(tir)
    assert not tir[0]
    # Snell: sin_out = eta * sin_in
    sin_out = np.linalg.norm(refracted[0][:2])
    np.testing.assert_allclose(sin_out, (1 / 1.5) * np.sqrt(0.5), rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(refracted[0]), 1.0, rtol=1e-5)
    # eta=1.5 from 45deg: 1.5^2 * 0.5 > 1 -> TIR
    assert tir[1]


def test_cosine_vector_distribution():
    u = np.random.default_rng(1).random((20000, 2)).astype(np.float32)
    v = np.asarray(vecmath.random_cosine_vector(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-4)
    assert (v[:, 2] >= 0).all()
    # E[cos theta] for cosine-weighted hemisphere = 2/3
    assert abs(v[:, 2].mean() - 2.0 / 3.0) < 0.01


# ---------- ONB ----------

def _any_orthonormal_pair_ref(n):
    """Scalar Duff et al. reference (glam Vec3A::any_orthonormal_pair)."""
    x, y, z = n
    sign = 1.0 if z >= 0.0 else -1.0
    a = -1.0 / (sign + z)
    b = x * y * a
    c0 = np.array([1.0 + sign * x * x * a, sign * b, -sign * x])
    c1 = np.array([b, sign + y * y * a, -y])
    return c0, c1


def test_generate_onb_matches_glam():
    rs = np.random.default_rng(2)
    normals = rs.normal(size=(32, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    mats = np.asarray(onb.generate_onb(jnp.asarray(normals, jnp.float32)))
    for k in range(32):
        c0, c1 = _any_orthonormal_pair_ref(normals[k])
        np.testing.assert_allclose(mats[k][:, 0], c0, atol=1e-5)
        np.testing.assert_allclose(mats[k][:, 1], c1, atol=1e-5)
        np.testing.assert_allclose(mats[k][:, 2], normals[k], atol=1e-6)
        # orthonormality
        np.testing.assert_allclose(mats[k].T @ mats[k], np.eye(3), atol=1e-5)


def test_generate_onb_ggx_orthonormal_and_guard():
    vs = np.array(
        [[0.0, 0.0, 1.0], [0.5, 0.5, np.sqrt(0.5)], [0.0, 0.0, 0.999999]], dtype=np.float32
    )
    vs /= np.linalg.norm(vs, axis=-1, keepdims=True)
    mats = np.asarray(onb.generate_onb_ggx(jnp.asarray(vs)))
    for k in range(len(vs)):
        np.testing.assert_allclose(mats[k].T @ mats[k], np.eye(3), atol=1e-5)
    # singular guard: columns X, -Y, Z (onb.rs:13-15)
    np.testing.assert_allclose(mats[0][:, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mats[0][:, 1], [0, -1, 0], atol=1e-6)


# ---------- RNG ----------

def _pcg4d_ref(v):
    v = [x & M32 for x in v]
    v = [(x * 1664525 + 1013904223) & M32 for x in v]
    v[0] = (v[0] + v[1] * v[3]) & M32
    v[1] = (v[1] + v[2] * v[0]) & M32
    v[2] = (v[2] + v[0] * v[1]) & M32
    v[3] = (v[3] + v[1] * v[2]) & M32
    v = [x ^ (x >> 16) for x in v]
    v[0] = (v[0] + v[1] * v[3]) & M32
    v[1] = (v[1] + v[2] * v[0]) & M32
    v[2] = (v[2] + v[0] * v[1]) & M32
    v[3] = (v[3] + v[1] * v[2]) & M32
    return v


def test_pcg4d_matches_scalar_reference():
    cases = [(0, 0, 0, 0), (1, 2, 3, 4), (123456789, 987654321, 42, 7)]
    for case in cases:
        got = rng.pcg4d(*[jnp.asarray([c], jnp.uint32) for c in case])
        expect = _pcg4d_ref(list(case))
        for g, e in zip(got, expect):
            assert int(np.asarray(g)[0]) == e, case


def test_uniform4_range_and_mean():
    lanes = jnp.arange(50000, dtype=jnp.uint32)
    u = np.asarray(rng.uniform4(lanes, 3, 1, 0))
    assert u.shape == (50000, 4)
    assert (u >= 0).all() and (u < 1).all()
    np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=0.01)
    # different streams decorrelated
    u2 = np.asarray(rng.uniform4(lanes, 3, 1, 1))
    assert abs(np.corrcoef(u[:, 0], u2[:, 0])[0, 1]) < 0.02


# ---------- Sobol ----------

def _lk_hash_ref(x, seed):
    x &= M32
    x ^= (x * 0x3D20ADEA) & M32
    x = (x + seed) & M32
    x = (x * ((seed >> 16) | 1)) & M32
    x ^= (x * 0x05526C56) & M32
    x ^= (x * 0x53A22864) & M32
    return x & M32


def _reverse_bits_ref(x):
    return int(f"{x & M32:032b}"[::-1], 2)


def _sobol_y_ref(index):
    out = 0
    for bit, d in enumerate(sobol.DIRECTIONS):
        if (index >> bit) & 1:
            out ^= d
    return out


def test_sobol_bit_ops_match_reference():
    for x in [0, 1, 2, 0xDEADBEEF, 0x12345678, M32]:
        assert int(np.asarray(sobol.reverse_bits(jnp.asarray([x], jnp.uint32)))[0]) == _reverse_bits_ref(x)
        assert int(np.asarray(sobol.sobol_y(jnp.asarray([x], jnp.uint32)))[0]) == _sobol_y_ref(x)
        for seed in [0, 1, 0xCAFEBABE]:
            assert (
                int(np.asarray(sobol.lk_hash(jnp.asarray([x], jnp.uint32), jnp.asarray([seed], jnp.uint32)))[0])
                == _lk_hash_ref(x, seed)
            )


def test_sobol_first_points_unscrambled():
    """With the identity scramble removed, dimension y of the raw sequence is
    the classic van der Corput-paired Sobol: check the first points of the
    underlying generator directly."""
    idx = jnp.arange(8, dtype=jnp.uint32)
    ys = np.asarray(sobol.sobol_y(idx))
    # First Sobol points in dim 2 as u32 fractions, from XOR of direction numbers:
    # 0, 0x8000.., 0xC000.., 0x4000.., 0xA000.., 0x2000.., 0x6000.., 0xE000..
    expect_frac = [0.0, 0.5, 0.75, 0.25, 0.625, 0.125, 0.375, 0.875]
    np.testing.assert_allclose(ys.astype(np.float64) / 2**32, expect_frac, atol=1e-9)


def test_get_ss_sobol_in_unit_square_and_stratified():
    pts = np.asarray(sobol.get_ss_sobol(jnp.arange(1024, dtype=jnp.uint32), jnp.asarray(12345, jnp.uint32)))
    assert ((pts >= 0.0) & (pts <= 1.0)).all()
    # Owen-scrambled Sobol keeps stratification: each half contains half the points
    assert abs((pts[:, 0] < 0.5).mean() - 0.5) < 0.01
    assert abs((pts[:, 1] < 0.5).mean() - 0.5) < 0.01
    # mean near 0.5
    np.testing.assert_allclose(pts.mean(axis=0), 0.5, atol=0.02)


# ---------- tonemap ----------

def _gt_tonemap_ref(x, p=1.0, a=1.0, m=0.22, l=0.4, c=1.33, b=0.0):  # noqa: E741
    """Scalar reference port of tonemapping.rs:68-96."""
    if x < 0.0:
        return b
    l0 = (p - m) * l / a
    if x < 0.0:
        w0 = 1.0
    elif x > m:
        w0 = 0.0
    else:
        t = x / m
        w0 = 1.0 - t * t * (3.0 - 2.0 * t)
    w2 = 1.0 if x > m + l0 else 0.0
    w1 = 1.0 - w0 - w2
    toe = m * (x / m) ** c + b
    lin = m + a * (x - m)
    s1 = m + a * l0
    c2 = a * p / (p - s1)
    shoulder = p - (p - s1) * np.exp(-c2 * (x - (m + l0)) / p)
    return toe * w0 + lin * w1 + shoulder * w2


@pytest.mark.parametrize("x", [0.0, 0.05, 0.1, 0.22, 0.3, 0.5, 0.62, 0.8, 1.0, 2.0, 10.0, -1.0])
def test_gt_tonemap_fixed_points(x):
    got = float(tonemap.gt_tonemap(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, _gt_tonemap_ref(x), rtol=1e-5, atol=1e-6)


def test_gt_tonemap_monotone_bounded():
    xs = jnp.linspace(0.0, 20.0, 2001)
    ys = np.asarray(tonemap.gt_tonemap(xs))
    assert (np.diff(ys) >= -1e-6).all()
    assert ys.max() <= 1.0 + 1e-6
