"""Capture a jax.profiler trace of the wavefront step and print the top ops.

Parses the trace.json.gz that jax.profiler writes and aggregates device-op
durations by (fused) op name — the direct answer to "where do the
milliseconds per bounce iteration go".

Usage: python benches/profile_trace.py [--config mesh_scene]
"""

from __future__ import annotations

import argparse, glob, gzip, json, os, sys, time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mesh_scene")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--nee", action="store_true", default=False)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from path_tracer_tpu import scenes
    from path_tracer_tpu.integrator.wavefront import render_film

    host, cam = getattr(scenes, args.config)()
    scene = host.device()
    ndc = jnp.asarray(cam.view_proj_inverse())
    org = jnp.asarray(cam.origin)
    kw = dict(max_bounces=64, mtypes=host.active_mtypes,
              any_volumes=host.has_volumes, enable_nee=args.nee)

    # warm up / compile
    rad, _ = render_film(scene, ndc, org, 0, args.size, args.size, args.spp, **kw)
    rad.block_until_ready()

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        rad, _ = render_film(scene, ndc, org, args.spp, args.size, args.size,
                             args.spp, **kw)
        rad.block_until_ready()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found", glob.glob(f"{logdir}/**", recursive=True)[:20])
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    # device lanes: pick pid names containing TPU / device
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        d = float(e.get("dur", 0.0))
        dur[name] += d
        cnt[name] += 1
        total += d
    print(f"total device time: {total/1e3:.1f} ms over {sum(cnt.values())} events")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
