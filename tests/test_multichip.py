"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Verifies the SURVEY.md §7 determinism requirement: sharded renders match
single-device renders because RNG keys derive from absolute film lanes and
sample ids, never from device indices. Identity is up to float reassociation
(~1 ulp) — XLA may fuse the differently-shaped per-shard programs differently.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_tpu import scenes
from path_tracer_tpu.integrator.wavefront import render_sample
from path_tracer_tpu.parallel.mesh import (
    make_mesh,
    render_sample_sharded,
    render_spp_sharded,
)

W = H = 32


@pytest.fixture(scope="module")
def setup():
    scene_host, cam = scenes.cornell_diffuse()
    scene = scene_host.device()
    return scene, jnp.asarray(cam.view_proj_inverse()), jnp.asarray(cam.origin)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_tile_sharded_matches_single_device(setup):
    scene, ndc, org = setup
    mesh = make_mesh(8)
    rad_sh, rays_sh = render_sample_sharded(scene, ndc, org, 0, W, H, mesh, max_bounces=6)
    rad_ref, _, _, rays_ref = render_sample(
        scene, ndc, org, 0, W, H, max_bounces=6, enable_nee=True, has_lights=True
    )
    np.testing.assert_allclose(np.asarray(rad_sh), np.asarray(rad_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(rays_sh)), float(jnp.sum(rays_ref)))


def test_spp_sharded_psum_matches_sequential(setup):
    scene, ndc, org = setup
    mesh = make_mesh(4)
    acc = np.asarray(render_spp_sharded(scene, ndc, org, 0, W, H, mesh, max_bounces=6))
    # sequential references for samples 0..3
    expect = np.zeros((W * H, 4), np.float32)
    for s in range(4):
        rad, _, _, _ = render_sample(
            scene, ndc, org, s, W, H, max_bounces=6, enable_nee=True, has_lights=True
        )
        expect[:, :3] += np.asarray(rad)
        expect[:, 3] += 1.0
    np.testing.assert_allclose(acc, expect, rtol=1e-6, atol=1e-6)


def test_uneven_mesh_sizes(setup):
    scene, ndc, org = setup
    mesh = make_mesh(2)
    rad_sh, _ = render_sample_sharded(scene, ndc, org, 3, W, H, mesh, max_bounces=4)
    rad_ref, _, _, _ = render_sample(
        scene, ndc, org, 3, W, H, max_bounces=4, enable_nee=True, has_lights=True
    )
    np.testing.assert_allclose(np.asarray(rad_sh), np.asarray(rad_ref), rtol=1e-5, atol=1e-6)


def test_twolevel_scene_sharded():
    """Two-level geometry through shard_map tiling."""
    from path_tracer_tpu.scene import procedural
    from path_tracer_tpu.scene.materials import Emissive, Lambertian
    from path_tracer_tpu.scene.model import Model, rigid_transform, rotation_y
    from path_tracer_tpu.scene.scene import Scene

    light_p, light_n = procedural.cornell_light()
    walls_p, walls_n = procedural.cornell_walls()
    sph_p, sph_n = procedural.icosphere((0.0, 250.0, 0.0), 120.0, 1)
    models = [
        Model(Emissive((15.0,) * 3), positions=light_p, normals=light_n),
        Model(Lambertian((0.7,) * 3), positions=walls_p, normals=walls_n),
        Model(Lambertian((0.2, 0.4, 0.7)),
              matrices=[rigid_transform(rotation_y(0.5), (0.0, -80.0, 0.0))],
              positions=sph_p, normals=sph_n),
    ]
    scene_host = Scene(models, two_level=True)
    scene = scene_host.device()
    cam = scenes.cornell_camera()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    mesh = make_mesh(4)
    rad_sh, _ = render_sample_sharded(scene, ndc, org, 0, W, H, mesh, max_bounces=4)
    rad_ref, _, _, _ = render_sample(
        scene, ndc, org, 0, W, H, max_bounces=4, enable_nee=True, has_lights=True
    )
    np.testing.assert_allclose(np.asarray(rad_sh), np.asarray(rad_ref), rtol=1e-5, atol=1e-6)


import pytest


@pytest.mark.parametrize("packer", ["iwalk", "vwalk"])
def test_twolevel_iwalk_sharded(packer):
    """Config-5 regime: the FAST two-level engines (instance-granular iwalk
    and virtual-chunk vwalk) under shard_map tiling — sharded must match
    single-device with the SAME engine (sharding is pure work division; the
    kernels run under the Pallas interpreter on the CPU mesh)."""
    from path_tracer_tpu.scene.scene import Scene
    from path_tracer_tpu.trace import iwalk

    scene_host, cam = scenes.many_instance_scene(grid=3, subdivisions=1)
    two = Scene(scene_host.models, two_level=True)
    scene = two.device()
    pack = iwalk.pack_iwalk if packer == "iwalk" else iwalk.pack_vwalk
    scene["twolevel"]["iwalk"] = {
        k: jnp.asarray(v) for k, v in pack(two.models).items()
    }
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    mesh = make_mesh(4)
    rad_sh, _ = render_sample_sharded(
        scene, ndc, org, 0, W, H, mesh, max_bounces=4,
        mtypes=two.active_mtypes, any_volumes=two.has_volumes,
    )
    rad_ref, _, _, _ = render_sample(
        scene, ndc, org, 0, W, H, max_bounces=4, enable_nee=True,
        has_lights=True, mtypes=two.active_mtypes, any_volumes=two.has_volumes,
    )
    np.testing.assert_allclose(
        np.asarray(rad_sh), np.asarray(rad_ref), rtol=1e-5, atol=1e-6
    )


def test_defocus_sharded_matches_single(setup):
    """Thin-lens camera rays key RNG on absolute (lane, sample) — sharding
    must not change the lens sample pattern."""
    scene, ndc, org = setup
    scene_host, cam = scenes.cornell_diffuse()
    lens = dict(aperture=80.0, focus=cam.focus_distance,
                cam_basis=jnp.asarray(cam.matrix[:, :3]))
    mesh = make_mesh(4)
    rad_sh, _ = render_sample_sharded(
        scene, ndc, org, 2, W, H, mesh, max_bounces=4, **lens)
    rad_ref, _, _, _ = render_sample(
        scene, ndc, org, 2, W, H, max_bounces=4, enable_nee=True,
        has_lights=True, **lens)
    # lens-jittered rays land on more knife-edge triangle tests than pinhole
    # rays; differently-shaped shard programs may round those differently
    # (see module docstring) — identical for >=99% of lanes, close in mean
    rad_sh, rad_ref = np.asarray(rad_sh), np.asarray(rad_ref)
    same = (np.abs(rad_sh - rad_ref).max(axis=-1) < 1e-5).mean()
    assert same >= 0.99, same
    assert abs(rad_sh.mean() - rad_ref.mean()) < 0.02 * max(rad_ref.mean(), 1e-6)


def test_interactive_frame_sharded_matches_single(setup):
    """The multi-chip interactive frame (`frame_segmented_sharded`: per-shard
    dead-lane compaction, host-side global schedule) must reproduce the
    single-device frame: radiance, TAA position/id buffers, and per-lane ray
    counters, up to the documented per-shard-program reassociation (~1 ulp).
    Uses a schedule forced tiny so several segments and shrink levels run on
    every shard."""
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.parallel.mesh import frame_segmented_sharded

    old = (wf._SEG_B0, wf._SEG_STEPS, wf._seg_caps,
           wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS)
    wf._SEG_B0, wf._SEG_STEPS = 2, 2
    wf._seg_caps = lambda n: [n // 2, n // 4]
    wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS = 0, 4
    try:
        scene, ndc, org = setup
        mesh = make_mesh(8)
        rad_sh, pos_sh, fid_sh, rays_sh = frame_segmented_sharded(
            scene, ndc, org, 0, W, H, mesh, max_bounces=8)
    finally:
        (wf._SEG_B0, wf._SEG_STEPS, wf._seg_caps,
         wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS) = old
    rad_ref, pos_ref, fid_ref, _ = render_sample(
        scene, ndc, org, 0, W, H, max_bounces=8)
    np.testing.assert_allclose(np.asarray(rad_sh), np.asarray(rad_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pos_sh), np.asarray(pos_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fid_sh), np.asarray(fid_ref))


def test_interactive_session_sharded_smoke(setup):
    """InteractiveRenderer(mesh=...): two frames (static + moving) of the
    full multi-chip interactive loop — trace sharded, TAA/display on the
    gathered film — produce a finite display image matching the unsharded
    session."""
    from path_tracer_tpu import scenes
    from path_tracer_tpu.interactive.session import InteractiveRenderer

    scene_host, cam = scenes.cornell_diffuse()
    cam2 = scenes.cornell_diffuse()[1]
    a = InteractiveRenderer(scene_host, cam, W, H, max_bounces=6,
                            mesh=make_mesh(8))
    b = InteractiveRenderer(scene_host, cam2, W, H, max_bounces=6)
    for r in (a, b):
        r.frame()
        r.mouse(2e-4, 1e-4, 1.0 / 60.0)
        r.frame()
    ia, ib = a.display(), b.display()
    assert np.isfinite(ia).all()
    np.testing.assert_allclose(ia, ib, rtol=1e-4, atol=1e-5)
