"""Temporal segment-schedule prediction (``SegmentPredictor``).

The predicted path replaces per-segment host count-reads with one
end-of-frame status fetch; its contract is that an ACCEPTED frame is
bit-identical to the count-driven schedule's output, and a plan that would
drop live lanes (overflow) or leave lanes alive (incomplete) is detected
on device and answered with an exact re-render of the same sample. The
reference has no analog (its per-ray loop exits eagerly,
``integrator.rs:163``); this is the wavefront equivalent's steady-state
optimisation for high-latency device links.
"""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu import scenes
from path_tracer_tpu.integrator import wavefront


def _force_small_schedule(monkeypatch):
    monkeypatch.setattr(wavefront, "_SEG_B0", 2)
    monkeypatch.setattr(wavefront, "_SEG_STEPS", 2)
    monkeypatch.setattr(
        wavefront, "_seg_caps", lambda n: [(3 * n) // 4, n // 2, n // 4])
    monkeypatch.setattr(wavefront, "_SEG_TAIL_AT", (24 * 16) // 4)
    monkeypatch.setattr(wavefront, "_SEG_TAIL_STEPS", 5)
    monkeypatch.setattr(wavefront, "_SEG_PREDICT", True)
    monkeypatch.setattr(wavefront, "_seg_warmed", set())


def _setup(scene_name, w, h):
    scene_host, cam = getattr(scenes, scene_name)(aspect=w / h)
    scene = scene_host.device()
    kw = dict(
        max_bounces=12,
        has_lights="light" in scene,
        any_volumes=getattr(scene_host, "has_volumes", True),
    )
    mtypes = getattr(scene_host, "active_mtypes", None)
    if mtypes is not None:
        kw["mtypes"] = mtypes
    return scene, jnp.asarray(cam.view_proj_inverse()), jnp.asarray(cam.origin), kw


def test_predicted_matches_exact(monkeypatch):
    """Frame 1 seeds the plan (count-driven); frames 2+ run predicted with
    zero mid-frame reads — every output must equal the count-driven
    schedule's bit-for-bit, across samples (different RNG / alive decay)."""
    _force_small_schedule(monkeypatch)
    w, h = 24, 16
    for scene_name in ("cornell_diffuse", "cornell_specular"):
        scene, ndc, org, kw = _setup(scene_name, w, h)
        pred = wavefront.SegmentPredictor()
        for sample_id in (0, 1, 2, 5):
            ref = wavefront.render_sample_segmented(
                scene, ndc, org, sample_id, w, h, **kw)
            got = wavefront.render_sample_segmented(
                scene, ndc, org, sample_id, w, h, predictor=pred, **kw)
            for r_, g_, nm in zip(ref, got, ("rad", "pos", "id", "rays")):
                np.testing.assert_array_equal(
                    np.asarray(r_), np.asarray(g_),
                    err_msg=f"{scene_name} sample {sample_id}: {nm} differs")
        # the plan really was in play after the seed frame
        assert pred.plan, "predictor never built a plan"


def test_overflow_falls_back_exact(monkeypatch):
    """A tampered plan whose caps are far below the true alive counts MUST
    be rejected by the on-device overflow check and answered with the exact
    schedule — outputs still bit-identical, overflow counter incremented."""
    _force_small_schedule(monkeypatch)
    w, h = 24, 16
    scene, ndc, org, kw = _setup("cornell_diffuse", w, h)
    pred = wavefront.SegmentPredictor()
    # seed the plan + warm programs
    wavefront.render_sample_segmented(
        scene, ndc, org, 0, w, h, predictor=pred, **kw)
    assert pred.plan and pred.overflows == 0
    # sabotage: caps at the menu floor guarantee a boundary count overflow
    floor = min(wavefront._seg_caps(w * h))
    pred.plan = tuple((floor, steps) for _, steps in pred.plan)
    ref = wavefront.render_sample_segmented(scene, ndc, org, 1, w, h, **kw)
    got = wavefront.render_sample_segmented(
        scene, ndc, org, 1, w, h, predictor=pred, **kw)
    assert pred.overflows == 1, "overflow was not detected"
    for r_, g_, nm in zip(ref, got, ("rad", "pos", "id", "rays")):
        np.testing.assert_array_equal(
            np.asarray(r_), np.asarray(g_),
            err_msg=f"overflow fallback: {nm} differs")
    # the fallback rebuilt a sane plan: next predicted frame accepts
    wavefront.render_sample_segmented(
        scene, ndc, org, 2, w, h, predictor=pred, **kw)
    assert pred.overflows == 1


def test_incomplete_plan_falls_back(monkeypatch):
    """A plan that ends while lanes are still alive (termination
    misprediction) must also be rejected — the final-alive arm of the
    status check, distinct from the boundary-cap arm above."""
    _force_small_schedule(monkeypatch)
    w, h = 24, 16
    scene, ndc, org, kw = _setup("cornell_specular", w, h)
    pred = wavefront.SegmentPredictor()
    wavefront.render_sample_segmented(
        scene, ndc, org, 0, w, h, predictor=pred, **kw)
    assert len(pred.plan) > 1
    # keep only the first planned segment: caps are valid (no boundary
    # overflow) but glass paths outlive one segment at 24x16 x 12 bounces
    pred.plan = pred.plan[:1]
    ref = wavefront.render_sample_segmented(scene, ndc, org, 1, w, h, **kw)
    got = wavefront.render_sample_segmented(
        scene, ndc, org, 1, w, h, predictor=pred, **kw)
    assert pred.overflows == 1, "incomplete frame was not detected"
    for r_, g_, nm in zip(ref, got, ("rad", "pos", "id", "rays")):
        np.testing.assert_array_equal(np.asarray(r_), np.asarray(g_))


def test_plan_from_counts_margin_and_guard(monkeypatch):
    """Plan construction: buffer cap = smallest menu level holding
    count*margin; STEPS from the unmargined level (the observed
    trajectory); monotone; stops at the first zero; guard appended."""
    monkeypatch.setattr(wavefront, "_SEG_MARGIN", 1.25)
    caps = [768, 512, 256, 128]
    n = 1024
    plan = wavefront._plan_from_counts([600, 300, 90, 0, 0], n, caps)
    pcaps = tuple(c for c, _ in plan)
    # 600*1.25=750 -> 768; 300*1.25=375 -> 512; 90*1.25=112 -> 128; stop; guard
    assert pcaps == (768, 512, 128, 128)
    # steps follow the UNMARGINED caps (768, 512, 128): here the menu has no
    # quarter/tail structure at these sizes beyond steps_for's thresholds —
    # just assert each steps equals steps_for of the unmargined level
    assert plan[0][1] == wavefront._seg_steps_for(768, n)
    assert plan[1][1] == wavefront._seg_steps_for(512, n)
    assert plan[2][1] == wavefront._seg_steps_for(128, n)
    # margin crossing a level: count 500 (unmargined 512) margins to 768 but
    # keeps 512's step count
    plan2 = wavefront._plan_from_counts([500], n, caps)
    assert plan2[0] == (768, wavefront._seg_steps_for(512, n))
    # count above every cap stays at full size
    assert wavefront._plan_from_counts([1000], n, caps)[0][0] == n
    # all dead at the first boundary: no segments, no guard
    assert wavefront._plan_from_counts([0], n, caps) == ()


def test_session_uses_predictor(monkeypatch):
    """The interactive session wires its predictor into the segmented entry
    — steady-state frames must run the predicted path (plan present after
    two frames), and the session images stay finite."""
    _force_small_schedule(monkeypatch)
    from path_tracer_tpu.interactive.session import InteractiveRenderer

    w, h = 24, 16
    scene_host, cam = scenes.cornell_diffuse(aspect=w / h)
    r = InteractiveRenderer(scene_host, cam, w, h, max_bounces=8)
    r.frame()
    assert r._predictor.plan is not None, "frame 1 did not seed the plan"
    r.frame()
    assert r._predictor.overflows == 0
    img = r.display()
    assert np.isfinite(img).all()
