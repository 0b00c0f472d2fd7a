"""Subprocess body for the sharded interactive-frame checks.

Run by ``tests/test_multichip.py::test_interactive_frame_sharded_isolated``
in a fresh interpreter with the CPU platform forced and 8 virtual devices
(see that test's docstring for why isolation is required). Importable only —
asserts and prints ``SHARDED_FRAME_OK`` on success.
"""

from __future__ import annotations

import numpy as np

W = H = 32


def run_checks() -> None:
    import jax

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.wavefront import render_sample
    from path_tracer_tpu.interactive.session import InteractiveRenderer
    from path_tracer_tpu.parallel.mesh import (
        frame_segmented_sharded,
        make_mesh,
    )
    import jax.numpy as jnp

    scene_host, cam = scenes.cornell_diffuse()
    scene = scene_host.device()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    mesh = make_mesh(8)

    # (1) sharded frame vs single-device frame, forced multi-segment
    # multi-shrink schedule so several compactions run on every shard
    old = (wf._SEG_B0, wf._SEG_STEPS, wf._seg_caps,
           wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS)
    wf._SEG_B0, wf._SEG_STEPS = 2, 2
    wf._seg_caps = lambda n: [n // 2, n // 4]
    wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS = 0, 4
    try:
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
    assert np.isfinite(np.asarray(rays_sh)).all()

    # (2) full sharded session loop (static + TAA moving) vs unsharded
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

    # (3) sharded temporal schedule prediction: frame 1 seeds the plan from
    # the count-driven run; frames 2+ run the async predicted chain — must
    # be BIT-identical to the count-driven sharded frame; a sabotaged plan
    # must be caught by the status check and fall back exactly
    old_predict = wf._SEG_PREDICT
    wf._SEG_B0, wf._SEG_STEPS = 2, 2
    wf._seg_caps = lambda n: [n // 2, n // 4]
    wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS = 0, 4
    wf._SEG_PREDICT = True
    try:
        pred = wf.SegmentPredictor()
        for sid in (0, 1, 2):
            ref = frame_segmented_sharded(
                scene, ndc, org, sid, W, H, mesh, max_bounces=8)
            got = frame_segmented_sharded(
                scene, ndc, org, sid, W, H, mesh, max_bounces=8,
                predictor=pred)
            for r_, g_ in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(r_), np.asarray(g_))
        assert pred.plan and pred.overflows == 0
        # caps of 4 lanes are far below any shard's early boundary counts
        pred.plan = tuple((4, st) for _, st in pred.plan)
        ref = frame_segmented_sharded(
            scene, ndc, org, 3, W, H, mesh, max_bounces=8)
        got = frame_segmented_sharded(
            scene, ndc, org, 3, W, H, mesh, max_bounces=8, predictor=pred)
        assert pred.overflows == 1
        for r_, g_ in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r_), np.asarray(g_))
    finally:
        (wf._SEG_B0, wf._SEG_STEPS, wf._seg_caps,
         wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS) = old
        wf._SEG_PREDICT = old_predict

    print("SHARDED_FRAME_OK")
