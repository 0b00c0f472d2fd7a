#!/bin/bash
# Round-3 hardware measurement session, in dependency/priority order.
# Run on the real TPU: bash benches/r3_hw_session.sh [outdir]
#
# Differences from r2_hw_session.sh, learned the hard way on 2026-08-19:
# * guard() between steps: a kernel that outruns the device watchdog kills
#   the TPU worker process; the NEXT fresh process reconnects once the
#   worker restarts (~1-10 min) — retries inside the dead process never
#   recover. Every step runs after an explicit liveness probe.
# * dragon runs SMALL first: the r2 dragon row was the watchdog kill
#   (nested-scan visits at ~40 us each x 884K tris exceeded the execution
#   limit). With flat-scan + suffix-min stop it should be orders faster,
#   but prove it at 256x144@1spp before committing to the 512@16 row.
set -u -o pipefail
OUT="${1:-/tmp/r3hw2}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

guard() { # block until the TPU answers from a FRESH process (<= 12 min)
  for i in $(seq 1 24); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "  (tpu probe $i/24 failed; waiting 30s)"; sleep 30
  done
  echo "!! TPU did not come back; continuing anyway"; return 1
}

run() { # name, cmd...
  local name="$1"; shift
  guard
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log"
  local rc=$?
  echo "rc=$rc ($name)"
  return $rc
}

# 1. correctness gate — REQUIRED before any perf claim (same fallback
#    ladder as r2: never bench a kernel the oracle rejected)
run oracle python benches/oracle_check.py || {
  if run oracle_noflat env PT_WALK_FLAT=0 python benches/oracle_check.py; then
    export PT_WALK_FLAT=0
    echo "!! oracle failed in flat-scan mode; session continues with PT_WALK_FLAT=0"
  elif run oracle_legacy env PT_WALK_FLAT=0 PT_WALK_LSKIP=0 \
      python benches/oracle_check.py; then
    export PT_WALK_FLAT=0 PT_WALK_LSKIP=0
    echo "!! oracle needed legacy knobs; session continues with them"
  fi
  if grep -q "vwalk.*FAIL" "$OUT"/oracle*.log; then
    export PT_VWALK=0
    echo "!! vwalk oracle case failed; two-level rows fall back to iwalk"
  fi
}

# 2. headline (driver metric) — now includes the 1024-bounce row
run headline python bench.py

# 3. the five BASELINE configs at spec size
run bench_all python benches/bench_all.py --size 512 --spp 16

# 4. dragon: small proof first (watchdog check), then the real row
run dragon_small python benches/bench_all.py --size 256 --spp 4 --only dragon_scene
run dragon python benches/bench_all.py --size 512 --spp 16 --only dragon_scene
run env4k python benches/bench_all.py --size 512 --spp 16 --only env_sphere_4k

# 5. config 5 two-level (vwalk) + dragon two-level
run twolevel python benches/bench_twolevel.py --spp 64
run twolevel_dragon python benches/bench_twolevel.py --scene dragon \
    --width 512 --height 512 --spp 8

# 6. interactive loop (reference headline feature): cornell + dragon
run fps python benches/interactive_fps.py --frames 48
run fps_dragon python benches/interactive_fps.py --scene dragon_scene --frames 12

# 7. knob A/Bs for the engine-selection matrix (VERDICT r2 #2/#9)
run ab_walkmin env PT_WALK_MIN=0 python benches/bench_all.py --size 512 --spp 16 \
    --only mesh_scene
run ab_mlayout_mesh env PT_WALK_MIN=0 PT_WALK_MASK_LAYOUT=1 \
    python benches/bench_all.py --size 512 --spp 16 --only mesh_scene
run ab_mlayout_dragon env PT_WALK_MASK_LAYOUT=1 \
    python benches/bench_all.py --size 512 --spp 16 --only dragon_scene
run ab_nosort_mesh env PT_WALK_MIN=0 PT_WALK_SORT=0 \
    python benches/bench_all.py --size 512 --spp 16 --only mesh_scene
run ab_flat0_dragon env PT_WALK_FLAT=0 python benches/bench_all.py \
    --size 256 --spp 4 --only dragon_scene

# 8. phase profiles (honest scalar-reduction sync)
run profile_call python benches/profile_walk_call.py --rays 262144
run profile_walk_dragon python benches/profile_walk.py --scene dragon --rays 262144

# 9. the real-asset scene end-to-end on TPU (r2 gap #2, now on hardware)
run asset_scene python -m path_tracer_tpu.cli --scene assets/asset_scene.json \
    --width 512 --height 288 --spp 64 --max-bounces 32 --out renders/asset_scene_tpu.png

# 10. spec-scale quality (slow — run last; r2 weak #5)
run quality_spec python benches/quality.py --size 512 --spp 64 --max-bounces 64
run quality_spec_cggx python benches/quality.py --size 512 --spp 64 \
    --max-bounces 64 --consistent-ggx

echo "=== session done ($(date -u +%H:%M:%S)) ==="
