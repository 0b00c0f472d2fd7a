#!/bin/bash
# Round-3 follow-up session on the FINAL round-3 code (multi-pass tracing,
# spp-batched dispatches, jitted interactive path): re-runs every row the
# main session lost to watchdog kills or measured on stale code.
# Run: bash benches/r3b_followup.sh [outdir]
set -u -o pipefail
OUT="${1:-/tmp/r3b2}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

guard() {
  for i in $(seq 1 24); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "  (tpu probe $i/24 failed; waiting 30s)"; sleep 30
  done
  echo "!! TPU did not come back; continuing anyway"; return 1
}

run() {
  local name="$1"; shift
  guard
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log"
  local rc=$?
  echo "rc=$rc ($name)"
  return $rc
}

# 0. oracle gate on the final kernels (budget path included via multi-pass
#    engines in the dragon / mesh_scene6 cases)
run oracle python benches/oracle_check.py || {
  if run oracle_sp env PT_WALK_BUDGET=0 python benches/oracle_check.py; then
    export PT_WALK_BUDGET=0
    echo "!! oracle failed with multi-pass; session continues single-pass"
  fi
}

# 1. standalone multi-pass A/B at BVH scale (the dragon decision number)
run multi_dragon python benches/profile_multi.py --scene dragon --rays 262144
run multi_dragon_sp env PT_WALK_BUDGET=0 timeout 1200 \
    python benches/profile_multi.py --scene dragon --rays 131072 --reps 1
run multi_mesh6 python benches/profile_multi.py --scene mesh6 --rays 262144

# 2. dragon end-to-end, small first
run dragon_small python benches/bench_all.py --size 256 --spp 4 --only dragon_scene
run dragon python benches/bench_all.py --size 512 --spp 16 --only dragon_scene

# 3. config 5 two-level (spp-batched dispatches now)
run twolevel python benches/bench_twolevel.py --spp 64
run twolevel_dragon python benches/bench_twolevel.py --scene dragon \
    --width 512 --height 512 --spp 8

# 4. interactive fps on the JITTED frame path
run fps python benches/interactive_fps.py --frames 48
run fps_dragon python benches/interactive_fps.py --scene dragon_scene --frames 12

# 5. multi-pass knob A/Bs on the dragon
run ab_budget48 env PT_WALK_BUDGET=48 python benches/bench_all.py \
    --size 256 --spp 4 --only dragon_scene
run ab_budget192 env PT_WALK_BUDGET=192 python benches/bench_all.py \
    --size 256 --spp 4 --only dragon_scene
run ab_mlayout env PT_WALK_MASK_LAYOUT=1 python benches/bench_all.py \
    --size 256 --spp 4 --only dragon_scene

echo "=== follow-up done ($(date -u +%H:%M:%S)) ==="
