"""Two-level TLAS/BLAS traversal vs the baked world BVH."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.scene import procedural
from path_tracer_tpu.scene.materials import Lambertian
from path_tracer_tpu.scene.model import Model, rigid_transform, rotation_y
from path_tracer_tpu.scene.scene import Scene
from path_tracer_tpu.scene.twolevel_scene import TwoLevelGeometry
from path_tracer_tpu.trace import traversal
from path_tracer_tpu.trace.twolevel import any_hit_twolevel, closest_hit_twolevel


def _models():
    sphere_p, sphere_n = procedural.icosphere((0.0, 0.0, 0.0), 3.0, 1)
    box_p, box_n = procedural.box((0.0, 0.0, 0.0), (2.0, 1.0, 1.5))
    mats = [
        rigid_transform(None, (-6.0, 0.0, 0.0)),
        rigid_transform(rotation_y(0.7), (6.0, 1.0, -2.0)),
        rigid_transform(rotation_y(2.1), (0.0, -2.0, 5.0)),
    ]
    return [
        Model(Lambertian((0.5, 0.5, 0.5)), matrices=mats, positions=sphere_p, normals=sphere_n),
        Model(Lambertian((0.7, 0.2, 0.2)), matrices=[rigid_transform(rotation_y(0.3), (0.0, 4.0, 0.0))],
              positions=box_p, normals=box_n),
    ]


def _rays(n=400, seed=0):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = -o + rs.normal(scale=5.0, size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d, jnp.float32)


def test_twolevel_matches_baked_world():
    models = _models()
    baked = Scene(models).device()
    two = TwoLevelGeometry(models).device()

    o, d = _rays()
    n = o.shape[0]
    lim = jnp.full(n, np.inf, jnp.float32)

    bi, bt, bu, bv = traversal.closest_hit(baked["bvh"], baked["tri"], o, d, lim)
    ti, tt, tu, tv, inst = closest_hit_twolevel(
        two["tlas_packed"], two["blas_packed"], two["inst_rows"], two["tri_packed"], o, d, lim
    )
    bi, bt, ti, tt = map(np.asarray, (bi, bt, ti, tt))
    hit_b = bi >= 0
    hit_t = ti >= 0
    np.testing.assert_array_equal(hit_t, hit_b)
    assert hit_b.sum() > 50
    # t values agree (frames are rigid; tolerance for transform rounding)
    np.testing.assert_allclose(tt[hit_b], bt[hit_b], rtol=1e-4, atol=1e-4)
    # hit instance recorded for every hit
    assert (np.asarray(inst)[hit_t] >= 0).all()


def test_twolevel_any_hit():
    models = _models()
    two = TwoLevelGeometry(models).device()
    o, d = _rays(seed=3)
    n = o.shape[0]
    ti, tt, _, _, _ = closest_hit_twolevel(
        two["tlas_packed"], two["blas_packed"], two["inst_rows"], two["tri_packed"],
        o, d, jnp.full(n, np.inf, jnp.float32),
    )
    found = any_hit_twolevel(
        two["tlas_packed"], two["blas_packed"], two["inst_rows"], two["tri_packed"],
        o, d, jnp.full(n, 1e9, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ti) >= 0)


def test_twolevel_full_render_matches_baked():
    """End-to-end: the two-level integrator path converges to the baked
    image (same estimator, same RNG -> identical modulo traversal order)."""
    import jax.numpy as jnp

    from path_tracer_tpu.integrator.wavefront import render_sample

    sphere_p, sphere_n = procedural.icosphere((0.0, 250.0, 0.0), 120.0, 1)
    from path_tracer_tpu.scene.materials import Emissive

    light_p, light_n = procedural.cornell_light()
    walls_p, walls_n = procedural.cornell_walls()
    models = [
        Model(Emissive((15.0, 15.0, 15.0)), positions=light_p, normals=light_n),
        Model(Lambertian((0.73, 0.73, 0.73)), positions=walls_p, normals=walls_n),
        Model(Lambertian((0.3, 0.5, 0.7)),
              matrices=[rigid_transform(rotation_y(0.4), (0.0, -60.0, 0.0))],
              positions=sphere_p, normals=sphere_n),
    ]
    from path_tracer_tpu import scenes

    cam = scenes.cornell_camera()
    baked = Scene(models)
    two = Scene(models, two_level=True)
    assert "twolevel" in two.device()

    W = H = 24
    args = (jnp.asarray(cam.view_proj_inverse()), jnp.asarray(cam.origin), 0, W, H)
    kw = dict(max_bounces=8, enable_nee=True, has_lights=True, spp=2)
    rad_b, _, fid_b, _ = render_sample(baked.device(), *args, **kw)
    rad_t, _, fid_t, _ = render_sample(two.device(), *args, **kw)
    rad_b, rad_t = np.asarray(rad_b), np.asarray(rad_t)
    # identical RNG + geometry -> same paths; tiny FP differences from the
    # object-space transform round trip
    np.testing.assert_array_equal(np.asarray(fid_t), np.asarray(fid_b))
    close = np.isclose(rad_t, rad_b, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.98, close


def test_vwalk_integrator_matches_gather_machine():
    """Engine-vs-engine INTEGRATOR parity: the same two-level scene rendered
    through the gather phase machine and through vwalk must agree — same
    closest-hit winners, same shading epilogue (object->world normals,
    model ids) through different wiring. Different FMA formations can flip
    knife-edge paths, so: identical for >=99% of pixels, close in mean."""
    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_sample
    from path_tracer_tpu.scene.scene import Scene
    from path_tracer_tpu.trace import iwalk

    scene_host, cam = scenes.many_instance_scene(grid=3, subdivisions=1)
    two = Scene(scene_host.models, two_level=True)
    scene = two.device()
    assert "iwalk" not in scene["twolevel"]  # CPU: gather machine
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=4, enable_nee=True, has_lights=True,
              mtypes=two.active_mtypes, any_volumes=two.has_volumes)
    W = H = 32
    rad_g, _, _, _ = render_sample(scene, ndc, org, 0, W, H, **kw)

    scene["twolevel"]["iwalk"] = {
        k: jnp.asarray(v) for k, v in iwalk.pack_vwalk(two.models).items()
    }
    rad_v, _, _, _ = render_sample(scene, ndc, org, 0, W, H, **kw)
    rad_g, rad_v = np.asarray(rad_g), np.asarray(rad_v)
    same = np.isclose(rad_g, rad_v, rtol=1e-5, atol=1e-6).all(axis=1)
    # measured: ~1% of pixels land on knife-edge tests that the two
    # engines' FMA formations round differently (valid MC either way)
    assert same.mean() >= 0.98, f"only {same.mean():.3f} pixels agree"
    assert np.isfinite(rad_v).all()
    assert abs(rad_g.mean() - rad_v.mean()) <= 0.01 * max(rad_g.mean(), 1e-6)
