"""Tests for the TAA/accumulation image ops and the interactive session."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu import scenes
from path_tracer_tpu.interactive import taa
from path_tracer_tpu.interactive.session import InteractiveRenderer

H = W = 16


def test_accumulate_layout():
    acc = jnp.zeros((H, W, 4))
    colour = jnp.ones((H, W, 4)) * 2.0
    out = taa.accumulate(acc, colour)
    np.testing.assert_allclose(np.asarray(out[..., :3]), 2.0)
    np.testing.assert_allclose(np.asarray(out[..., 3]), 1.0)  # count, not colour alpha
    out2 = taa.accumulate(out, colour)
    np.testing.assert_allclose(np.asarray(out2[..., 3]), 2.0)


def test_velocity_zero_for_static_camera():
    cam = scenes.cornell_camera()
    # positions on a plane in front of the camera
    rs = np.random.default_rng(0)
    pts = rs.uniform(-200, 200, (H, W, 3)).astype(np.float32)
    pts[..., 2] = 0.0
    pos = np.concatenate([pts, np.ones((H, W, 1), np.float32)], axis=-1)
    wtc = jnp.asarray(cam.world_to_clip())

    # For a static camera, reprojecting through the same matrix recovers the
    # current uv IF the position actually projects to that pixel. Construct
    # positions from the camera rays so this holds.
    from path_tracer_tpu.camera import ray_directions

    ys = (np.arange(H) + 0.5) / H
    xs = (np.arange(W) + 0.5) / W
    u, v = np.meshgrid(xs, ys, indexing="xy")
    d = np.asarray(
        ray_directions(
            jnp.asarray(cam.view_proj_inverse()),
            jnp.asarray(cam.origin),
            jnp.asarray(u.ravel(), jnp.float32),
            jnp.asarray(v.ravel(), jnp.float32),
        )
    )
    t = 800.0
    world = cam.origin[None] + d * t
    pos = np.concatenate([world, np.full((H * W, 1), t, np.float32)], axis=-1).reshape(H, W, 4)

    vel = np.asarray(taa.compute_velocity(jnp.asarray(pos), wtc))
    assert np.abs(vel).max() < 1e-3


def test_clip_aabb_inside_unchanged():
    q = jnp.asarray([[0.5, 0.5, 0.5]])
    out = taa._clip_aabb(jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[1.0, 1.0, 1.0]]), q)
    np.testing.assert_allclose(np.asarray(out), 0.5)
    q2 = jnp.asarray([[2.0, 0.5, 0.5]])
    out2 = np.asarray(
        taa._clip_aabb(jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[1.0, 1.0, 1.0]]), q2)
    )
    assert 0.0 <= out2[0, 0] <= 1.001  # clipped toward center


def test_ycocg_roundtrip():
    rs = np.random.default_rng(1)
    rgb = jnp.asarray(rs.uniform(0, 1, (64, 3)), jnp.float32)
    back = np.asarray(taa._ycocg_to_rgb(taa._rgb_to_ycocg(rgb)))
    np.testing.assert_allclose(back, np.asarray(rgb), atol=1e-6)


def test_interactive_session_static_then_move():
    scene_host, cam = scenes.cornell_diffuse()
    r = InteractiveRenderer(scene_host, cam, W, H, max_bounces=4)
    r.frame()
    r.frame()
    assert float(r.accumulation[..., 3].max()) == 2.0
    frame_static = r.display()
    assert frame_static.shape == (H, W, 3)
    assert np.isfinite(frame_static).all()

    # move the camera: TAA reprojection path resets the accumulation count
    r.key("w", dt=1e-4)
    r.frame()
    assert float(r.accumulation[..., 3].max()) == 1.0
    frame_moved = r.display()
    assert np.isfinite(frame_moved).all()
    # image changed
    assert np.abs(frame_moved - frame_static).max() > 1e-4


def test_pack_ids():
    prev = jnp.asarray([[0x00AB]], jnp.uint32)
    new = jnp.asarray([[0x00CD]], jnp.uint32)
    packed = np.asarray(taa.pack_ids(prev, new))[0, 0]
    assert packed == (0xAB << 16) | 0xCD


def test_display_letterboxed():
    import jax.numpy as jnp

    frame = jnp.ones((9, 16, 3), jnp.float32)  # 16:9 content
    out = np.asarray(taa.display_letterboxed(frame, 20, 20))  # square window
    assert out.shape == (20, 20, 3)
    # bars top/bottom, content centered
    assert out[0].max() == 0.0 and out[-1].max() == 0.0
    assert out[10].max() == 1.0
    # no horizontal bars for width-limited fit
    assert out[:, 0].max() == 1.0 or out[:, 1].max() == 1.0


def test_http_live_view_stream_and_input():
    """The HTTP display vehicle end-to-end: serve an interactive session,
    pull MJPEG frames, inject key/mouse input, fetch a PNG still."""
    import io
    import threading
    import urllib.request

    from PIL import Image

    from path_tracer_tpu.interactive.stream import make_server

    scene_host, cam = scenes.cornell_diffuse()
    r = InteractiveRenderer(scene_host, cam, 32, 32, max_bounces=4)
    srv = make_server(r, "127.0.0.1", 0, max_frames=2)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/", timeout=30).read()
        assert b"/stream" in page
        # input events mutate the camera
        yaw0 = r.camera.yaw
        urllib.request.urlopen(f"{base}/mouse?dx=0&dy=2e-4&dt=0.0167", timeout=30).read()
        assert r.camera.yaw != yaw0
        urllib.request.urlopen(f"{base}/key?k=w&dt=1e-6", timeout=30).read()
        # the MJPEG stream produces parseable JPEG frames
        raw = urllib.request.urlopen(f"{base}/stream", timeout=300).read()
        parts = raw.split(b"--frame")
        jpgs = [p.split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n")
                for p in parts if b"image/jpeg" in p]
        assert len(jpgs) == 2
        img = np.asarray(Image.open(io.BytesIO(jpgs[-1])))
        assert img.shape == (32, 32, 3)
        assert r.sample >= 2  # the stream drove the render loop
        # PNG still endpoint
        png = urllib.request.urlopen(f"{base}/frame.png", timeout=60).read()
        still = np.asarray(Image.open(io.BytesIO(png)))
        assert still.shape == (32, 32, 3)
    finally:
        srv.shutdown()


def test_resize_reconfigures_surface():
    """Resize drops stale history, restarts sampling, and reshapes every
    buffer + the projection aspect (state.rs reconfigure semantics)."""
    scene_host, cam = scenes.cornell_diffuse()
    r = InteractiveRenderer(scene_host, cam, 32, 32, max_bounces=4)
    r.frame()
    assert r.sample == 1
    proj_before = r.camera.projection.copy()
    r.resize(48, 24)
    assert r.accumulation.shape == (24, 48, 4)
    assert r.ids.shape == (24, 48)
    assert r.sample == 0
    assert not np.allclose(r.camera.projection, proj_before)  # new aspect
    r.frame()
    img = r.display()
    assert img.shape == (24, 48, 3)
    assert np.isfinite(img).all()
    # no-op resize keeps history
    r.resize(48, 24)
    assert r.sample == 1


def test_frame_path_compiles_once():
    """Compile-count regression for the interactive frame loop (VERDICT r3
    weak #4): after the warmup frames compile the static and moving paths,
    further frames must trigger ZERO backend compilations — the round-3
    hardware session found the frame path silently eager (15.5 s/frame at
    1024x576 where the compiled program is sub-second). Also asserts the
    frame actually flows through the jitted `_render_sample_jit` entry, so
    a rewiring to an eager trace_lanes call cannot pass."""
    import jax.monitoring as monitoring

    from path_tracer_tpu.integrator import wavefront

    compiles = []

    def listener(name, *a, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            compiles.append(name)

    scene_host, cam = scenes.cornell_diffuse()
    r = InteractiveRenderer(scene_host, cam, 32, 18, max_bounces=4)

    # warmup: compile the static path, then the moving (velocity+TAA) path
    r.frame()
    r.mouse(2e-4, 1e-4, 1.0 / 60.0)
    r.frame()
    r.display()

    # count flow-through by wrapping the name `frame()` actually calls
    # (the session module's import-time binding); also pin that the
    # underlying trace entry is a jax.jit callable, so once compiled,
    # steady-state frames must hit the jit cache, never retrace
    import path_tracer_tpu.interactive.session as session_mod

    seg = session_mod._SEGMENTED
    name = "render_sample_segmented" if seg else "render_sample"
    real_entry = getattr(session_mod, name)
    assert hasattr(wavefront._render_sample_jit, "lower") and hasattr(
        wavefront._render_sample_jit, "_cache_size"
    ), "_render_sample_jit is no longer a jax.jit entry point"
    entry_calls = []

    def counting_entry(*a, **kw):
        entry_calls.append(1)
        return real_entry(*a, **kw)

    monitoring.register_event_duration_secs_listener(listener)
    setattr(session_mod, name, counting_entry)
    try:
        for i in range(4):
            if i % 2 == 0:
                r.mouse(-1e-4, 2e-4, 1.0 / 60.0)
                r.key("w", 6e-6)
            r.frame()
            img = r.display()
    finally:
        setattr(session_mod, name, real_entry)
        monitoring.unregister_event_duration_listener(listener)

    assert compiles == [], (
        f"{len(compiles)} backend compiles during steady-state frames — "
        "the frame path is retracing (or eager, or the segment warm-up "
        "missed a reachable program)")
    assert len(entry_calls) == 4, (
        f"frames did not flow through the session {name} entry")
    assert real_entry is getattr(wavefront, name), (
        f"session.py no longer calls wavefront.{name}")
    assert np.isfinite(img).all()


def test_segmented_matches_monolithic(monkeypatch):
    """The r4 interactive fps fix — dead-lane segmented compaction
    (`render_sample_segmented`) — must be BIT-identical to the monolithic
    `render_sample` on every output (radiance, TAA position/id buffers, ray
    counters): RNG draws are keyed on (lane, sample, bounce, site) and
    traversal is schedule-invariant, so re-packing survivors into smaller
    buffers may not change any lane's arithmetic. Segment lengths and the
    size menu are forced tiny so several segments AND several shrink levels
    actually run (the default menu floors at 2048 lanes)."""
    from path_tracer_tpu.integrator import wavefront

    monkeypatch.setattr(wavefront, "_SEG_B0", 2)
    monkeypatch.setattr(wavefront, "_SEG_STEPS", 2)
    monkeypatch.setattr(
        wavefront, "_seg_caps", lambda n: [(3 * n) // 4, n // 2, n // 4])
    # engage the tail-batched path (PT_SEG_TAIL_*) at the smallest cap so
    # the longer-step tail program is also covered by the identity check
    monkeypatch.setattr(wavefront, "_SEG_TAIL_AT", (24 * 16) // 4)
    monkeypatch.setattr(wavefront, "_SEG_TAIL_STEPS", 5)

    w, h = 24, 16
    for scene_name in ("cornell_diffuse", "cornell_specular"):
        scene_host, cam = getattr(scenes, scene_name)(aspect=w / h)
        scene = scene_host.device()
        mtypes = getattr(scene_host, "active_mtypes", None)
        kw = dict(
            max_bounces=12,
            has_lights="light" in scene,
            any_volumes=getattr(scene_host, "has_volumes", True),
        )
        if mtypes is not None:
            kw["mtypes"] = mtypes
        ndc = jnp.asarray(cam.view_proj_inverse())
        org = jnp.asarray(cam.origin)
        for sample_id in (0, 3):
            ref = wavefront.render_sample(scene, ndc, org, sample_id, w, h, **kw)
            got = wavefront.render_sample_segmented(
                scene, ndc, org, sample_id, w, h, **kw)
            for r_, g_, nm in zip(ref, got, ("rad", "pos", "id", "rays")):
                np.testing.assert_array_equal(
                    np.asarray(r_), np.asarray(g_),
                    err_msg=f"{scene_name} sample {sample_id}: {nm} differs")


def test_seg_warm_key_covers_resize_and_focus(monkeypatch):
    """ADVICE r4: the segmented frame path's warm key must include every
    input that changes the compiled segment programs — a transposed resize
    keeps the lane count but changes the program (width/height are static
    argnames), as does a focus change with aperture > 0. Pre-fix, these
    reused the old key, silently skipped warm-up, and steady-state frames
    hit lazy mid-session compiles. Pins: distinct configs -> distinct warm
    keys, and each segmented render still matches its monolithic twin."""
    from path_tracer_tpu.integrator import wavefront

    monkeypatch.setattr(wavefront, "_SEG_B0", 2)
    monkeypatch.setattr(wavefront, "_SEG_STEPS", 3)
    monkeypatch.setattr(wavefront, "_seg_caps", lambda n: [n // 2])
    monkeypatch.setattr(wavefront, "_seg_warmed", set())

    scene_host, cam = scenes.cornell_specular(aspect=1.0)
    scene = scene_host.device()
    kw = dict(max_bounces=6, has_lights="light" in scene,
              mtypes=scene_host.active_mtypes,
              any_volumes=scene_host.has_volumes)
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    basis = jnp.asarray(cam.matrix[:, :3])
    configs = [
        dict(width=24, height=16),
        dict(width=16, height=24),             # transposed: same lane count
        dict(width=24, height=16, aperture=8.0, focus=400.0, cam_basis=basis),
        dict(width=24, height=16, aperture=8.0, focus=800.0, cam_basis=basis),
    ]
    for cfg in configs:
        rad_s, pos_s, fid_s, rays_s = wavefront.render_sample_segmented(
            scene, ndc, org, 0, **cfg, **kw)
        rad_m, pos_m, fid_m, rays_m = wavefront.render_sample(
            scene, ndc, org, 0, **cfg, **kw)
        np.testing.assert_array_equal(np.asarray(rad_s), np.asarray(rad_m))
        np.testing.assert_array_equal(np.asarray(pos_s), np.asarray(pos_m))
        np.testing.assert_array_equal(np.asarray(fid_s), np.asarray(fid_m))
    assert len(wavefront._seg_warmed) == len(configs), (
        "each config must warm its own program set")
