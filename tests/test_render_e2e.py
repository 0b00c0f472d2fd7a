"""End-to-end integrator tests.

The strongest correctness check without the Rust binary: NEE+MIS and pure
BSDF path tracing are two very different estimators of the same integral —
their converged images must agree (SURVEY.md §4c oracle strategy). Plus
deterministic-replay, env-map miss shading, and film/PNG round trips.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu import scenes
from path_tracer_tpu.film import film_to_srgb, load_checkpoint, resolve, save_checkpoint, save_png
from path_tracer_tpu.integrator import render
from path_tracer_tpu.integrator.wavefront import render_sample

W = H = 32


@pytest.fixture(scope="module")
def cornell():
    scene_host, cam = scenes.cornell_diffuse()
    return scene_host.device(), cam, scene_host


def _sample(scene, cam, s, **kw):
    rad, pos, fid, rays = render_sample(
        scene,
        jnp.asarray(cam.view_proj_inverse()),
        jnp.asarray(cam.origin),
        s,
        W,
        H,
        **kw,
    )
    return np.asarray(rad), np.asarray(pos), np.asarray(fid), np.asarray(rays)


def test_deterministic_replay(cornell):
    scene, cam, _ = cornell
    r1, p1, f1, _ = _sample(scene, cam, 5, max_bounces=8, enable_nee=True, has_lights=True)
    r2, p2, f2, _ = _sample(scene, cam, 5, max_bounces=8, enable_nee=True, has_lights=True)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(f1, f2)


def test_output_sane(cornell):
    scene, cam, _ = cornell
    rad, pos, fid, rays = _sample(scene, cam, 0, max_bounces=8, enable_nee=True, has_lights=True)
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()
    # firefly clamp (integrator.rs:274)
    assert np.linalg.norm(rad, axis=-1).max() <= 100.0 + 1e-3
    # the box fills the frame center; edge rays exit past the open front
    hit = fid != 0xFF
    assert hit.mean() > 0.5
    assert pos[hit, 3].max() < 1e4  # finite depth where geometry was hit
    assert rays.sum() > W * H  # at least one traversal per lane


def test_nee_vs_brute_force_agreement(cornell):
    """NEE+MIS vs pure BSDF sampling must converge to the same image."""
    scene, cam, _ = cornell
    spp = 48
    acc_nee = np.zeros((W * H, 3))
    acc_pt = np.zeros((W * H, 3))
    for s in range(spp):
        acc_nee += _sample(scene, cam, s, max_bounces=24, enable_nee=True, has_lights=True)[0]
        acc_pt += _sample(scene, cam, 1000 + s, max_bounces=24, enable_nee=False, has_lights=True)[0]
    img_nee = acc_nee / spp
    img_pt = acc_pt / spp
    # Myopic per-pixel comparison is hopeless at 48spp for pure PT; compare
    # low-frequency content: global mean and per-row means.
    assert abs(img_nee.mean() - img_pt.mean()) / img_pt.mean() < 0.15
    rows_nee = img_nee.reshape(H, W, 3).mean(axis=(1, 2))
    rows_pt = img_pt.reshape(H, W, 3).mean(axis=(1, 2))
    corr = np.corrcoef(rows_nee, rows_pt)[0, 1]
    assert corr > 0.95, corr


def test_env_map_miss_shading():
    scene_host, cam = scenes.env_sphere_scene()
    scene = scene_host.device()
    rad, pos, fid, _ = (
        np.asarray(a)
        for a in render_sample(
            scene,
            jnp.asarray(cam.view_proj_inverse()),
            jnp.asarray(cam.origin),
            0,
            W,
            H,
            max_bounces=4,
            enable_nee=False,
            has_lights=False,
        )
    )
    assert np.isfinite(rad).all()
    # miss lanes shade from the gradient env (non-trivial radiance)
    miss = fid == 0xFF
    assert miss.any() and (rad[miss].mean() > 0.05)
    # sphere lanes see the mirror-reflected env -> also lit
    assert (~miss).any() and (rad[~miss].mean() > 0.01)


def test_env_quad_table_bit_identical():
    """The quad-table fetch (one 12-wide gather) must reproduce the
    four-fetch bilinear BIT-FOR-BIT — same texel values, same blend
    expression — including both wrap seams (image_helper.rs:61-88)."""
    from path_tracer_tpu.scene import envmap

    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 4.0, (37, 61, 3)).astype(np.float32)
    quad = jnp.asarray(envmap.build_quad_table(img))
    image = jnp.asarray(img)
    # random uv + exact seam/corner probes
    u = np.concatenate([rng.uniform(0, 1, 512), [0.0, 0.999999, 0.5, 60.5 / 61]])
    v = np.concatenate([rng.uniform(0, 1, 512), [0.999999, 0.0, 36.5 / 37, 0.5]])
    u = jnp.asarray(u.astype(np.float32))
    v = jnp.asarray(v.astype(np.float32))
    ref = envmap.get_pixel_bilinear(image, u, v)
    got = envmap.get_pixel_bilinear_quad(quad, 37, 61, u, v)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_env_quad_through_integrator(monkeypatch):
    """A scene over the quad threshold renders IDENTICALLY with and without
    the quad table (PT_ENV_QUAD gate in Scene.device)."""
    scene_host, cam = scenes.env_sphere_scene(env_size=256)  # 256x512 >= 64K
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    monkeypatch.setenv("PT_ENV_QUAD", "0")
    plain = scene_host.device()
    assert "env_quad" not in plain
    rad0 = np.asarray(render_sample(plain, ndc, org, 0, W, H, max_bounces=4,
                                    enable_nee=False, has_lights=False)[0])

    monkeypatch.setenv("PT_ENV_QUAD", "1")
    quad = scene_host.device()
    assert "env_quad" in quad and quad["env_quad"].shape == (256 * 512, 12)
    rad1 = np.asarray(render_sample(quad, ndc, org, 0, W, H, max_bounces=4,
                                    enable_nee=False, has_lights=False)[0])
    # The env FETCH is bit-identical (test above); end-to-end the two
    # variants are different XLA programs, so FMA contraction may differ by
    # an ulp elsewhere in the pipeline (measured max 2.4e-5 on CPU).
    np.testing.assert_allclose(rad0, rad1, atol=1e-3, rtol=0)


def test_film_accumulate_resolve_and_png(tmp_path, cornell):
    _, cam, scene_host = cornell
    film = render(scene_host, cam, W, H, spp=2, max_bounces=6)
    assert film.shape == (H, W, 4)
    np.testing.assert_allclose(np.asarray(film[..., 3]), 2.0)
    img = np.asarray(resolve(film))
    assert np.isfinite(img).all()
    srgb = np.asarray(film_to_srgb(film))
    assert (srgb >= 0).all() and (srgb <= 1).all()
    p = tmp_path / "out.png"
    save_png(p, film)
    from PIL import Image

    im = Image.open(p)
    assert im.size == (W, H)


def test_checkpoint_resume_identical(tmp_path, cornell):
    _, cam, scene_host = cornell
    full = render(scene_host, cam, W, H, spp=4, max_bounces=6)

    part = render(scene_host, cam, W, H, spp=2, max_bounces=6)
    ckpt = tmp_path / "ckpt.npz"
    save_checkpoint(ckpt, part, next_sample=2)
    film2, next_sample = load_checkpoint(ckpt)
    resumed = render(
        scene_host, cam, W, H, spp=2, max_bounces=6, start_sample=next_sample, film=film2
    )
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full), rtol=1e-6, atol=1e-6)


def test_volume_scene_finite():
    scene_host, cam = scenes.cornell_volume()
    scene = scene_host.device()
    rad, _, _, _ = render_sample(
        scene,
        jnp.asarray(cam.view_proj_inverse()),
        jnp.asarray(cam.origin),
        0,
        16,
        16,
        max_bounces=16,
        enable_nee=True,
        has_lights=True,
    )
    rad = np.asarray(rad)
    assert np.isfinite(rad).all() and (rad >= 0).all()
    assert rad.mean() > 0.0


def test_dragon_scene_finite():
    """The reference's showcase configuration (main.rs:100-117) at toy
    scale: 2-instance displaced-knot mesh, GGX glass + medium, procedural
    equirect env. Full-scale throughput is covered by benches/bench_all.py
    on hardware."""
    scene_host, cam = scenes.dragon_scene(nu=48, nv=24, env_h=32)
    assert scene_host.has_volumes and scene_host.has_lights
    scene = scene_host.device()
    rad, _, _, _ = render_sample(
        scene,
        jnp.asarray(cam.view_proj_inverse()),
        jnp.asarray(cam.origin),
        0,
        16,
        16,
        max_bounces=12,
        enable_nee=True,
        has_lights=True,
        mtypes=scene_host.active_mtypes,
        any_volumes=True,
    )
    rad = np.asarray(rad)
    assert np.isfinite(rad).all() and (rad >= 0).all()
    assert rad.mean() > 0.0


def test_pooled_matches_pinned(cornell):
    """Global-work-queue regeneration (pool=True) computes the same
    per-(pixel, sample) radiances; film sums match the pinned schedule up to
    float add order, and the pooled schedule is self-deterministic."""
    scene, cam, scene_host = cornell
    import jax.numpy as jnp

    from path_tracer_tpu.integrator.wavefront import render_film

    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=8, mtypes=scene_host.active_mtypes,
              any_volumes=scene_host.has_volumes)
    a, ra = render_film(scene, ndc, org, 0, W, H, 4, **kw)
    b, rb = render_film(scene, ndc, org, 0, W, H, 4, pool=True, **kw)
    c, rc = render_film(scene, ndc, org, 0, W, H, 4, pool=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb))  # same rays either way
    np.testing.assert_array_equal(np.asarray(b), np.asarray(c))  # deterministic


def test_render_film_tiling_invariance(cornell):
    """Tile size must not change the image (lane-keyed RNG)."""
    scene, cam, scene_host = cornell
    import jax.numpy as jnp

    from path_tracer_tpu.integrator.wavefront import render_film

    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=6, mtypes=scene_host.active_mtypes,
              any_volumes=scene_host.has_volumes)
    a, ra = render_film(scene, ndc, org, 0, W, H, 2, tile_lanes=W * H, **kw)
    b, rb = render_film(scene, ndc, org, 0, W, H, 2, tile_lanes=(W * H) // 4, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb))
    # a tile size that does NOT divide the film: full tiles + one remainder
    # tile (the 1080p case — lane count factors as 2^10 * odd)
    c, rc = render_film(scene, ndc, org, 0, W, H, 2,
                        tile_lanes=(W * H) // 4 - 8, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rc))


def test_thin_lens_defocus():
    """Thin-lens aperture (the live form of camera.rs:17's dead params):
    aperture=0 is the pinhole path (compiled out); aperture>0 jitters lens
    origins deterministically and re-aims at the focal plane."""
    scene_host, cam = scenes.cornell_diffuse()
    scene = scene_host.device()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    basis = jnp.asarray(cam.matrix[:, :3])
    kw = dict(max_bounces=6, enable_nee=True, has_lights=True,
              mtypes=scene_host.active_mtypes, any_volumes=False)
    pin, _, _, _ = render_sample(scene, ndc, org, 0, W, H, **kw)
    # focus at the look-at point; wide aperture for visible defocus
    lens = dict(aperture=120.0, focus=cam.focus_distance, cam_basis=basis)
    blur, _, _, _ = render_sample(scene, ndc, org, 0, W, H, **kw, **lens)
    blur2, _, _, _ = render_sample(scene, ndc, org, 0, W, H, **kw, **lens)
    pin, blur, blur2 = np.asarray(pin), np.asarray(blur), np.asarray(blur2)
    assert np.isfinite(blur).all() and (blur >= 0).all()
    np.testing.assert_array_equal(blur, blur2)  # deterministic lens samples
    assert np.abs(blur - pin).max() > 1e-3      # the lens path is live
    # same scene, same estimator: the (huge test) aperture shifts energy at
    # edges/occlusions but must stay the same image family, not garbage
    assert abs(blur.mean() - pin.mean()) < 0.3 * max(pin.mean(), 1e-6)
