"""Interactive-loop throughput: frames/s at 1024x576 with and without
camera motion (state.rs:557-586 / main.rs:179-218 parity vehicle).

Two modes per scene:
* static   — camera still: progressive accumulation (accumulate.wgsl path)
* moving   — WASD+mouse each frame: velocity + temporal reprojection
             (velocity.wgsl + compute.wgsl TAA path)

Every frame is fully synchronized to the host through the tonemapped
display image (np.asarray) — the same cost a presentation engine pays to
hand the frame to a swapchain; frames/s therefore includes tonemap +
readback, not just the render dispatch. ``--sink DIR`` writes a PNG
sequence (the environment's stand-in for a winit window).

Usage: python benches/interactive_fps.py [--scene cornell_specular]
       [--width 1024] [--height 576] [--frames 48] [--sink DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(mode: str, scene_name: str, w: int, h: int, frames: int,
        sink: str | None) -> dict:
    import numpy as np

    from path_tracer_tpu import scenes
    from path_tracer_tpu.interactive.session import InteractiveRenderer

    scene_host, cam = getattr(scenes, scene_name)(aspect=w / h)
    r = InteractiveRenderer(scene_host, cam, w, h)

    u8 = os.environ.get("PT_FPS_U8", "0") != "0"

    def step(i: int) -> np.ndarray:
        if mode == "moving":
            # gentle orbit + strafe (~2 deg + a few world units per frame;
            # camera.update_* sensitivities are the reference's huge
            # constants, so deltas must be mouse-pixel scale)
            r.mouse(2e-4 if i % 2 == 0 else -1.5e-4, 1e-4, 1.0 / 60.0)
            r.key("w" if i % 4 < 2 else "d", 6e-6)
        r.frame()
        return r.display(as_uint8=u8)  # host sync: the "present"

    img = step(0)  # warmup/compile
    profile = os.environ.get("PT_FPS_PROFILE", "0") != "0"
    # Pipelined present (PT_FPS_PIPELINED=1): swapchain-style double
    # buffering — dispatch frame i's tonemap on device, start its host copy
    # asynchronously, and fetch frame i-1's pixels only when the loop comes
    # back around, so the present d2h overlaps the NEXT frame's trace.
    # Every frame is still fully materialized on the host (one frame of
    # present latency, like any real swapchain); the reference's present()
    # likewise never blocks the next frame's encoding (state.rs:505-586).
    pipelined = os.environ.get("PT_FPS_PIPELINED", "0") != "0"
    if pipelined:
        pending = None
        t0 = time.perf_counter()
        for i in range(1, frames + 1):
            if mode == "moving":
                r.mouse(2e-4 if i % 2 == 0 else -1.5e-4, 1e-4, 1.0 / 60.0)
                r.key("w" if i % 4 < 2 else "d", 6e-6)
            r.frame()
            nxt = r.display_device(as_uint8=u8)
            try:
                nxt.copy_to_host_async()
            except Exception:
                pass  # backends without async d2h still correct, just sync
            if pending is not None:
                img = np.asarray(pending)[::-1]
            pending = nxt
        img = np.asarray(pending)[::-1]  # drain the last present
        dt = time.perf_counter() - t0
        assert img.dtype == np.uint8 or np.isfinite(img).all()
        out = {
            "mode": mode, "scene": scene_name, "size": f"{w}x{h}",
            "frames": frames, "fps": round(frames / dt, 2),
            "ms_per_frame": round(1e3 * dt / frames, 2),
            "mean": float(img.mean()), "u8": u8, "pipelined": True,
        }
        pred = getattr(r, "_predictor", None)
        if pred is not None and pred.plan is not None:
            out["overflows"] = pred.overflows
        return out
    t_frame = t_disp = 0.0
    t0 = time.perf_counter()
    for i in range(1, frames + 1):
        if profile:
            # phase split: frame() issues the trace segments (each ends in a
            # host count-read, so it is ~synchronous); display() adds the
            # TAA/tonemap dispatch + the full-film d2h readback
            ta = time.perf_counter()
            if mode == "moving":
                r.mouse(2e-4 if i % 2 == 0 else -1.5e-4, 1e-4, 1.0 / 60.0)
                r.key("w" if i % 4 < 2 else "d", 6e-6)
            r.frame()
            tb = time.perf_counter()
            img = r.display(as_uint8=u8)
            tc = time.perf_counter()
            t_frame += tb - ta
            t_disp += tc - tb
        else:
            img = step(i)
        if sink and i % 8 == 0:
            # display() is already tonemapped + image-row order
            from PIL import Image

            data = (img if img.dtype == np.uint8
                    else np.clip(img * 255.0, 0, 255).astype(np.uint8))
            Image.fromarray(data, "RGB").save(
                os.path.join(sink, f"{mode}_{i:04d}.png"))
    dt = time.perf_counter() - t0
    assert img.dtype == np.uint8 or np.isfinite(img).all()
    out = {
        "mode": mode, "scene": scene_name, "size": f"{w}x{h}",
        "frames": frames, "fps": round(frames / dt, 2),
        "ms_per_frame": round(1e3 * dt / frames, 2),
        "mean": float(img.mean()),
        "u8": u8,
    }
    if profile:
        out["ms_trace"] = round(1e3 * t_frame / frames, 2)
        out["ms_display"] = round(1e3 * t_disp / frames, 2)
    pred = getattr(r, "_predictor", None)
    if pred is not None and pred.plan is not None:
        # schedule-prediction health: fallback re-renders over the run
        out["overflows"] = pred.overflows
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_specular")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sink", default=None,
                    help="directory for a PNG frame sequence (frame sink)")
    args = ap.parse_args()
    if args.sink:
        os.makedirs(args.sink, exist_ok=True)
    for mode in ("static", "moving"):
        print(json.dumps(run(mode, args.scene, args.width, args.height,
                             args.frames, args.sink)), flush=True)


if __name__ == "__main__":
    main()
