"""Per-bounce alive-lane decay profile for the interactive segment schedule.

Runs the wavefront one bounce-step at a time (1 spp pinned, the interactive
frame regime) and prints the fraction of lanes still alive after each
bounce. This is the measurement behind the PT_SEG_B0 / menu defaults
(RESULTS_r5.md): the schedule's cost model is

    cost(frame) ~= sum over segments of steps x buffer_size + overheads

so the optimal first-segment length is where the alive fraction first drops
under the largest compaction slot (n/4 by default). Backend-independent
(alive decisions are RNG-keyed, not float-knife-edge) — run it on CPU.

Usage: python benches/alive_profile.py [--scene cornell_specular]
       [--width 256 --height 144] [--max-bounces 64] [--aspect 1.7778]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_specular")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--max-bounces", type=int, default=64)
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast enough at probe sizes)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

    import jax.numpy as jnp

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import _render_sample_jit

    sh, cam = getattr(scenes, args.scene)(aspect=args.width / args.height)
    scene = sh.device()
    w, h = args.width, args.height
    n = w * h
    lane = jnp.arange(n, dtype=jnp.uint32)
    common = dict(width=w, height=h, max_bounces=args.max_bounces,
                  enable_nee=True, has_lights="light" in scene, spp=1,
                  mtypes=sh.active_mtypes, any_volumes=sh.has_volumes,
                  aperture=0.0, focus=0.0, cam_basis=None, return_state=True)
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)

    s = None
    alive = []
    for b in range(args.max_bounces):
        s = _render_sample_jit(scene, ndc, org, args.sample, lane,
                               init_state=s, max_steps=1, **common)
        a = int(jnp.count_nonzero(s["alive"]))
        alive.append(a)
        if a == 0:
            break
    print(json.dumps({
        "scene": args.scene, "size": f"{w}x{h}", "lanes": n,
        "alive_frac": [round(a / n, 4) for a in alive],
        "lane_steps_ideal": sum(alive) + n,
        "lane_steps_monolithic": n * (len(alive) + 1),
    }), flush=True)


if __name__ == "__main__":
    main()
