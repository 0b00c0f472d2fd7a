"""Light sampling at mesh-light scale (light_sampler.rs:31-39 parity).

Round-1 light picking was an O(L) full-CDF compare per lane — fine for the
2-triangle Cornell light, quadratic pain for mesh lights. These tests pin the
scalable two-level segmented search (trace/gather.searchsorted_cdf) against
numpy's searchsorted and validate NEE against brute-force path tracing on a
scene whose light is a >4K-triangle emissive mesh (forcing the segmented
path through the real integrator).
"""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.trace.gather import SEARCH_FLAT_MAX, searchsorted_cdf


def test_searchsorted_cdf_small_matches_numpy():
    rs = np.random.default_rng(0)
    pdf = rs.random(97).astype(np.float32) + 1e-3
    cdf = np.cumsum(pdf / pdf.sum()).astype(np.float32)
    u = rs.random(4096).astype(np.float32)
    got = np.asarray(searchsorted_cdf(jnp.asarray(cdf), jnp.asarray(u)))
    want = np.searchsorted(cdf, u, side="left")
    np.testing.assert_array_equal(got, np.minimum(want, len(cdf) - 1))


def test_searchsorted_cdf_large_matches_numpy():
    """Above SEARCH_FLAT_MAX the two-level segmented path must agree exactly,
    including at segment boundaries and exact-CDF-value probes."""
    rs = np.random.default_rng(1)
    l = SEARCH_FLAT_MAX * 3 + 57  # non-multiple of the 128 segment width
    pdf = rs.random(l).astype(np.float64) + 1e-6
    cdf = np.cumsum(pdf / pdf.sum()).astype(np.float32)
    u = np.concatenate([
        rs.random(8192).astype(np.float32),
        cdf[rs.integers(0, l, 512)],          # exact boundary probes
        np.array([0.0, 1.0], np.float32),
    ])
    got = np.asarray(searchsorted_cdf(jnp.asarray(cdf), jnp.asarray(u)))
    want = np.minimum(np.searchsorted(cdf, u, side="left"), l - 1)
    np.testing.assert_array_equal(got, want)


def test_mesh_light_nee_matches_brute_force():
    """A >4K-triangle emissive icosphere over a diffuse floor: the NEE+MIS
    estimator and plain BSDF-sampling path tracing must converge to the same
    image mean (they share geometry but weight light very differently, so a
    wrong CDF segment, pdf, or MIS weight shows up as an energy error)."""
    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film
    from path_tracer_tpu.scene import procedural
    from path_tracer_tpu.scene.materials import Emissive, Lambertian
    from path_tracer_tpu.scene.model import Model
    from path_tracer_tpu.scene.scene import Scene

    light_p, light_n = procedural.icosphere((0.0, 320.0, 0.0), 140.0, 4)
    assert light_p.shape[0] > SEARCH_FLAT_MAX  # 5120 tris: segmented path
    floor_p, floor_n = procedural.box((0.0, -60.0, 0.0), (400.0, 10.0, 400.0))
    models = [
        Model(Emissive((6.0, 6.0, 6.0)), positions=light_p, normals=light_n),
        Model(Lambertian((0.6, 0.6, 0.6)), positions=floor_p, normals=floor_n),
    ]
    scene_host = Scene(models)
    assert scene_host.light["cdf"].shape[0] > SEARCH_FLAT_MAX
    scene = scene_host.device()
    cam = scenes.cornell_camera()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    w = h = 24
    kw = dict(
        max_bounces=4, has_lights=True, mtypes=scene_host.active_mtypes,
        any_volumes=scene_host.has_volumes,
    )
    rad_nee, _ = render_film(scene, ndc, org, 0, w, h, 16, enable_nee=True, **kw)
    rad_pt, _ = render_film(scene, ndc, org, 0, w, h, 64, enable_nee=False, **kw)
    m_nee = float(np.asarray(rad_nee).mean()) / 16
    m_pt = float(np.asarray(rad_pt).mean()) / 64
    assert m_nee > 0.01  # scene is actually lit
    # estimator agreement within Monte Carlo noise of the PT side
    assert abs(m_nee - m_pt) / m_pt < 0.15, (m_nee, m_pt)
