"""BSDF correctness: white-furnace energy tests, pdf integration, volumes.

The furnace test checks E[weakening * bsdf / pdf] == albedo for sampled
directions — exactly the path-weight update the integrator applies
(integrator.rs:249), so it validates sample/eval consistency end-to-end.
"""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.rng import uniform4
from path_tracer_tpu.integrator import bsdf as bsdf_mod
from path_tracer_tpu.scene.materials import (
    Dielectric,
    GGXDielectric,
    GGXMetal,
    Lambertian,
    Specular,
    pack_materials,
)

N = 40000


def _lane_mats(mat_table, n=N):
    from path_tracer_tpu.scene.materials import pack_material_rows

    idx = jnp.zeros(n, jnp.int32)
    table = {k: jnp.asarray(v) for k, v in mat_table.items()}
    table["rows"] = jnp.asarray(pack_material_rows(mat_table))
    return bsdf_mod.gather_mat(table, idx)


def _setup(n=N, seed=0):
    rs = np.random.default_rng(seed)
    normal = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    # incoming rays from the upper hemisphere pointing down at the surface
    d = rs.normal(size=(n, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 0.1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d, jnp.float32), normal


def _throughput(mat, ray_dir, normal, front, u):
    m = _lane_mats(mat)
    wo = bsdf_mod.sample_bsdf(m, ray_dir, normal, front, u)
    wi_viewer = -ray_dir
    bsdf_v, pdf = bsdf_mod.eval_bsdf_pdf(m, wi_viewer, wo, normal, front)
    weak = bsdf_mod.get_weakening(m, wo, normal)
    w = weak[:, None] * bsdf_v / pdf[:, None]
    return np.asarray(w), np.asarray(wo), np.asarray(pdf)


def test_lambertian_furnace():
    mat = pack_materials([Lambertian((0.73, 0.5, 0.25))])
    d, n = _setup()
    u = uniform4(jnp.arange(N, dtype=jnp.uint32), 0, 0, 3)
    w, wo, pdf = _throughput(mat, d, n, jnp.ones(N, bool), u)
    # cosine-sampled: weakening*bsdf/pdf = albedo exactly, per-sample
    np.testing.assert_allclose(w, np.tile([0.73, 0.5, 0.25], (N, 1)), rtol=1e-4)
    assert (wo[:, 2] > 0).all()


def test_specular_mirror():
    mat = pack_materials([Specular((0.9, 0.9, 0.9))])
    d, n = _setup()
    u = uniform4(jnp.arange(N, dtype=jnp.uint32), 0, 0, 3)
    w, wo, pdf = _throughput(mat, d, n, jnp.ones(N, bool), u)
    np.testing.assert_allclose(w, 0.9, rtol=1e-5)
    # mirror: wo.z == -d.z
    np.testing.assert_allclose(wo[:, 2], -np.asarray(d)[:, 2], atol=1e-5)


def test_ggx_metal_furnace_energy_bounded():
    """GGX reflective with white f0. The reference samples the VNDF but
    weights with the plain NDF pdf (material.rs:248-284 vs :437-438), so the
    per-sample ratio has a grazing-angle tail; the bulk (median) must still
    sit at ~1 and the mean stays order-1."""
    mat = pack_materials([GGXMetal((1.0, 1.0, 1.0), 0.3)])
    d, n = _setup()
    u = uniform4(jnp.arange(N, dtype=jnp.uint32), 1, 0, 3)
    w, wo, pdf = _throughput(mat, d, n, jnp.ones(N, bool), u)
    valid = pdf > 1e-6
    med = np.median(w[valid, 0])
    mean = w[valid].mean(axis=0)
    assert 0.9 < med < 1.1, med
    assert 0.5 < mean[0] < 1.6, mean
    # energy symmetric across channels for white f0
    np.testing.assert_allclose(mean, mean[0], rtol=1e-3)


def test_ggx_dielectric_furnace():
    """Rough glass, colour=1. Reflection throughput sits at ~1; transmission
    carries the eta^2 radiance-compression factor of the reference BTDF
    (material.rs:426) — >1 entering the dense medium, <1 exiting — so the
    product over an enter/exit pair conserves energy."""
    mat = pack_materials([GGXDielectric((1.0, 1.0, 1.0), 0.2, 1.5)])
    d, n = _setup()
    u = uniform4(jnp.arange(N, dtype=jnp.uint32), 2, 0, 3)

    # entering (front_facing=True): eval eta = ior = 1.5
    w, wo, pdf = _throughput(mat, d, n, jnp.ones(N, bool), u)
    valid = pdf > 1e-6
    refl = wo[:, 2] > 0
    med_refl = np.median(w[valid & refl, 0])
    med_in = np.median(w[valid & ~refl, 0])
    assert 0.9 < med_refl < 1.1, med_refl
    assert 1.0 < med_in < 2.25 * 2.0, med_in
    # both lobes populated
    assert (valid & refl).sum() > 0.03 * N and (valid & ~refl).sum() > 0.3 * N

    # exiting (front_facing=False): eval eta = 1/ior
    w2, wo2, pdf2 = _throughput(mat, d, n, jnp.zeros(N, bool), u)
    valid2 = (pdf2 > 1e-6) & (wo2[:, 2] < 0)
    med_out = np.median(w2[valid2, 0])
    assert med_out < 1.0, med_out
    # enter * exit medians roughly cancel the eta^2 factors
    assert 0.5 < med_in * med_out < 2.0, (med_in, med_out)


def test_dielectric_smooth_glass():
    mat = pack_materials([Dielectric((1.0, 1.0, 1.0), 1.5)])
    d, n = _setup()
    u = uniform4(jnp.arange(N, dtype=jnp.uint32), 3, 0, 3)
    w, wo, pdf = _throughput(mat, d, n, jnp.ones(N, bool), u)
    # Delta material: bsdf/pdf is exactly the Fresnel-normalized throughput.
    # Reflected rays carry f/f == 1; refracted carry (1-f)/eta^2/(1-f) = 1/eta^2
    refl = wo[:, 2] > 0
    np.testing.assert_allclose(w[refl, 0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(w[~refl, 0], 1.5**2, rtol=1e-4)
    # Snell's law for refracted rays
    dd = np.asarray(d)
    sin_in = np.sqrt(np.clip(1 - dd[~refl, 2] ** 2, 0, 1))
    sin_out = np.sqrt(np.clip(1 - wo[~refl, 2] ** 2, 0, 1))
    np.testing.assert_allclose(sin_out, sin_in / 1.5, atol=2e-4)


def test_ggx_eval_matches_reference_scalar():
    """Spot-check eval_bsdf_pdf against a direct scalar transcription of
    material.rs:349-450 for the REFLECTIVE model."""
    a = 0.4**2  # roughness 0.4 remapped

    def scalar_ref(wi, wo, colour):
        h = wi + wo
        h = h / np.linalg.norm(h)
        idh = float(wi @ h)
        odh = float(wo @ h)
        hz = h[2]
        cos_sq = hz * hz
        tan_sq = np.sqrt(1 - cos_sq) / cos_sq
        x = a * a + tan_sq
        d = a * a / (np.pi * cos_sq * cos_sq * x * x) if hz > 0 else 0.0
        a_sq = a * a
        xx = 2 * wi[2] * wo[2]
        y = 1 - a_sq
        z = wo[2] * np.hypot(a, wi[2] * np.sqrt(y))
        ww = wi[2] * np.hypot(a, wo[2] * np.sqrt(y))
        g = xx / (z + ww) if wi[2] > 0 and wo[2] > 0 else 0.0
        brdf = 1.0 * g * d / (4 * abs(wi[2] * wo[2]))
        pdf = d * hz * 1.0 / (4 * abs(odh))
        tint = colour + (1 - colour) * (1 - abs(idh)) ** 5
        return brdf * tint, pdf

    colour = np.array([0.3, 0.5, 0.7])
    mat = pack_materials([GGXMetal(tuple(colour), 0.4)])
    rs = np.random.default_rng(9)
    for _ in range(20):
        wi = rs.normal(size=3)
        wi[2] = abs(wi[2]) + 0.05
        wi /= np.linalg.norm(wi)
        wo = rs.normal(size=3)
        wo[2] = abs(wo[2]) + 0.05
        wo /= np.linalg.norm(wo)
        # world frame == tangent frame: normal +z
        m = _lane_mats(mat, 1)
        bsdf_v, pdf = bsdf_mod.eval_bsdf_pdf(
            m,
            jnp.asarray(wo[None], jnp.float32),  # viewer
            jnp.asarray(wi[None], jnp.float32),  # scatter
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
            jnp.ones(1, bool),
        )
        eb, ep = scalar_ref(wi, wo, colour)
        np.testing.assert_allclose(np.asarray(bsdf_v)[0], eb, rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(float(pdf[0]), ep, rtol=2e-3, atol=1e-6)


def test_hg_volume_pdf_normalized_and_sampling_consistent():
    g = 0.6
    n = 60000
    u = np.asarray(uniform4(jnp.arange(n, dtype=jnp.uint32), 7, 0, 3))
    inc = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    d = np.asarray(bsdf_mod.hg_scatter_direction(inc, jnp.full(n, g), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # The reference builds the sampling frame around -incoming
    # (volume.rs:58: generate_onb(-incoming)), so the sampled mean cosine
    # w.r.t. the ray direction is -g. Reproduced faithfully.
    cos = (d * np.asarray(inc)).sum(-1)
    assert abs(cos.mean() + g) < 0.01
    # pdf integrates to 1 over the sphere (uniform MC over directions)
    rs = np.random.default_rng(11)
    dirs = rs.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pdf = np.asarray(bsdf_mod.hg_pdf(inc, jnp.asarray(dirs, jnp.float32), jnp.full(n, g)))
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.02, integral


def test_beer_lambert_and_free_flight():
    absorb = jnp.asarray([[0.4, 0.62, 0.7]]) * 0.1
    tr = np.asarray(bsdf_mod.transmission(absorb, jnp.asarray([10.0])))
    np.testing.assert_allclose(tr[0], np.exp(-np.array([0.04, 0.062, 0.07]) * 10), rtol=1e-5)
    # free flight mean = 1/c
    c = 1.0 / 200.0
    u = np.asarray(uniform4(jnp.arange(100000, dtype=jnp.uint32), 8, 0, 3))[:, 0]
    t = np.asarray(bsdf_mod.free_flight(jnp.asarray(u), jnp.float32(c)))
    assert abs(t.mean() - 200.0) < 4.0


def test_ggx_half_vector_matches_independent_vndf_sampler():
    """The reference samples GGX half-vectors with Heitz's 2017 'Simpler and
    Exact' routine (material.rs:248-284). Validate our transcription against
    an INDEPENDENT implementation of VNDF sampling (Heitz 2018, hemisphere
    formulation) — both sample the same distribution of visible normals, so
    their cos-theta histograms must agree even though the algorithms differ."""
    from path_tracer_tpu.integrator.bsdf import _ggx_half_vector

    n = 60000
    rs = np.random.default_rng(3)
    a = 0.4**2  # linear roughness 0.4 remapped

    # fixed incoming direction 30 deg off normal (z-up world == tangent frame)
    ray_dir = np.tile([np.sin(0.5), 0.0, -np.cos(0.5)], (n, 1)).astype(np.float32)
    normal = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    u = rs.random((n, 2)).astype(np.float32)
    h_ours = np.asarray(
        _ggx_half_vector(
            jnp.full(n, a, jnp.float32), jnp.asarray(ray_dir), jnp.asarray(normal),
            jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        )
    )

    # independent sampler: Heitz 2018 "Sampling the GGX Distribution of
    # Visible Normals", JCGT — hemisphere/cross-section method
    v = -ray_dir[0]  # view direction (away from surface)
    vh = np.array([a * v[0], a * v[1], v[2]])
    vh /= np.linalg.norm(vh)
    lensq = vh[0] ** 2 + vh[1] ** 2
    T1 = np.array([-vh[1], vh[0], 0.0]) / np.sqrt(lensq) if lensq > 0 else np.array([1.0, 0, 0])
    T2 = np.cross(vh, T1)
    u2 = rs.random((n, 2))
    r = np.sqrt(u2[:, 0])
    phi = 2 * np.pi * u2[:, 1]
    t1 = r * np.cos(phi)
    t2 = r * np.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    t2 = (1.0 - s) * np.sqrt(np.maximum(1.0 - t1**2, 0)) + s * t2
    nh = (
        t1[:, None] * T1[None]
        + t2[:, None] * T2[None]
        + np.sqrt(np.maximum(1.0 - t1**2 - t2**2, 0))[:, None] * vh[None]
    )
    h_ref = np.stack([a * nh[:, 0], a * nh[:, 1], np.maximum(nh[:, 2], 1e-6)], axis=1)
    h_ref /= np.linalg.norm(h_ref, axis=1, keepdims=True)

    # compare cos-theta distributions
    q = np.linspace(0.05, 0.95, 10)
    qo = np.quantile(h_ours[:, 2], q)
    qr = np.quantile(h_ref[:, 2], q)
    np.testing.assert_allclose(qo, qr, atol=0.01)
    # azimuthal means around the view plane agree
    assert abs(h_ours[:, 1].mean()) < 0.01 and abs(h_ref[:, 1].mean()) < 0.01
    np.testing.assert_allclose(h_ours[:, 0].mean(), h_ref[:, 0].mean(), atol=0.01)


def test_ggx_consistent_mode_is_self_consistent():
    """consistent_ggx=True (standard tan^2 D + exact VNDF pdf) must make the
    sampler estimate of the directional albedo agree with an independent
    uniform-hemisphere estimate — the property the reference's quirky
    estimator lacks (see benches/quality.py caveat). In the default
    (reference-faithful) mode the two disagree by >10x."""
    import jax

    from path_tracer_tpu.scene.materials import GGXMetal, pack_material_rows

    n = 1 << 16
    mat = pack_materials([GGXMetal((1.0, 1.0, 1.0), 0.3)])
    mat_d = {k: jnp.asarray(v) for k, v in mat.items()}
    mat_d["rows"] = jnp.asarray(pack_material_rows(mat))
    m = bsdf_mod.gather_mat(mat_d, jnp.zeros(n, jnp.int32))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    front = jnp.ones(n, bool)
    cos_view = 0.5
    sv = float(np.sqrt(1 - cos_view**2))
    d = jnp.tile(jnp.asarray([[sv, 0.0, -cos_view]], jnp.float32), (n, 1))
    wi_viewer = -d

    key = jax.random.PRNGKey(0)
    u1, u2 = jax.random.uniform(key, (2, n))
    z = u1
    r = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    phi = 2 * jnp.pi * u2
    wo_u = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)

    u4 = uniform4(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7), jnp.uint32(0), jnp.uint32(3))
    wo_s = bsdf_mod.sample_bsdf(m, d, normal, front, u4)
    cos_s = jnp.maximum(wo_s[:, 2], 0.0)

    def albedos(consistent):
        f_u, _ = bsdf_mod.eval_bsdf_pdf(m, wi_viewer, wo_u, normal, front, consistent_ggx=consistent)
        rho_uniform = float(jnp.mean(f_u[:, 0] * z) * 2 * jnp.pi)
        f_s, pdf_s = bsdf_mod.eval_bsdf_pdf(m, wi_viewer, wo_s, normal, front, consistent_ggx=consistent)
        ok = pdf_s > 1e-8
        rho_sampler = float(jnp.mean(jnp.where(ok, f_s[:, 0] * cos_s / jnp.maximum(pdf_s, 1e-20), 0.0)))
        return rho_uniform, rho_sampler

    rho_u_c, rho_s_c = albedos(True)
    assert abs(rho_u_c - rho_s_c) / rho_s_c < 0.15, (rho_u_c, rho_s_c)
    assert 0.7 < rho_s_c < 1.05, rho_s_c

    rho_u_q, rho_s_q = albedos(False)  # reference-faithful: wildly inconsistent
    assert rho_s_q / max(rho_u_q, 1e-9) > 5.0, (rho_u_q, rho_s_q)
