#!/bin/bash
# Round-4 hardware session: prove the round-3 fixes on silicon (VERDICT r3
# "next round" items 1, 3, 4, 5, 7, 8, 9). Block-runnable so rows can be
# committed to benches/RESULTS_r4.md as they land instead of at round end:
#
#   bash benches/r4_session.sh <block> [outdir]
#
# Blocks, in value/minute order:
#   oracle_fast    f64 oracle, cheap camera cases (pre-bench gate)
#   oracle_bounce  f64 oracle, NEW bounce-regime cases (VERDICT item 9)
#   fps            interactive fps, cornell, jitted frame path (item 5)
#   fps_dragon     interactive fps, dragon (item 3/5)
#   multi_dragon   multi-pass A/B at BVH scale (item 3 decision number)
#   multi_mesh6    multi-pass A/B at 82K tris
#   dragon_small   dragon end-to-end 256x256@4spp (item 3)
#   twolevel_dragon config-5-class dragon two-level 512x512@8spp (item 7)
#   twolevel       config 5 at 1080p slice (item 7)
#   dragon         dragon end-to-end 512x512@16spp
#   ab_knobs       PT_WALK_BUDGET 48/192 A/B on dragon_small (item 3)
#   sweep24        configs 2-4 engine/knob sweep (item 4)
#   oracle_slow    f64 oracle, dragon+iwalk+vwalk (post-bench full gate)
#   quality        spec-scale 512x512@64spp MSE rows (item 8)
#
# Hard-won notes (r3): one host CPU — never run pytest or other host work
# concurrently with the f64 oracle; an oracle TIMEOUT is not a precision
# failure — never fall back to PT_WALK_BUDGET=0 on rc=124.
set -u -o pipefail
# Budgets include the tunnel's ~300-500 s first-d2h-per-process cold start
# (measured 2026-08-20: d2h0 278-488 s, d2h1+ instant).
BLOCK="${1:?usage: r4_session.sh <block> [outdir]}"
OUT="$(mkdir -p "${2:-/tmp/r4hw}" && cd "${2:-/tmp/r4hw}" && pwd)"
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
  local name="$1"; local tmo="$2"; shift 2
  guard
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.log"
  local rc=$?
  echo "rc=$rc ($name)" | tee -a "$OUT/$name.log"
  return $rc
}

case "$BLOCK" in
  oracle_fast)
    run oracle_fast 2400 env PT_ORACLE_CASES=mesh_scene,mesh_scene6 \
        python benches/oracle_check.py ;;
  oracle_bounce)
    run oracle_bounce 3600 env PT_ORACLE_CASES=mesh6_bounce,vwalk_bounce \
        python benches/oracle_check.py ;;
  fps)
    run fps 1800 python benches/interactive_fps.py --frames 48 ;;
  fps_dragon)
    run fps_dragon 2400 python benches/interactive_fps.py \
        --scene dragon_scene --frames 12 ;;
  multi_dragon)
    run multi_dragon 2400 python benches/profile_multi.py \
        --scene dragon --rays 262144 ;;
  multi_mesh6)
    run multi_mesh6 1800 python benches/profile_multi.py \
        --scene mesh6 --rays 262144 ;;
  dragon_small)
    run dragon_small 2100 python benches/bench_all.py \
        --size 256 --spp 4 --only dragon_scene ;;
  twolevel_dragon)
    run twolevel_dragon 2400 python benches/bench_twolevel.py \
        --scene dragon --width 512 --height 512 --spp 8 ;;
  twolevel)
    run twolevel 3000 python benches/bench_twolevel.py --spp 64 ;;
  dragon)
    run dragon 3000 python benches/bench_all.py \
        --size 512 --spp 16 --only dragon_scene ;;
  ab_knobs)
    run ab_budget48 1500 env PT_WALK_BUDGET=48 python benches/bench_all.py \
        --size 256 --spp 4 --only dragon_scene
    run ab_budget192 1500 env PT_WALK_BUDGET=192 python benches/bench_all.py \
        --size 256 --spp 4 --only dragon_scene ;;
  sweep24)
    for cfg in cornell_specular cornell_volume mesh_scene many_instance_scene; do
      run "sweep24_$cfg" 1500 python benches/bench_all.py \
          --size 512 --spp 16 --only "$cfg"
    done ;;
  oracle_slow)
    run oracle_slow 4800 env PT_ORACLE_CASES=dragon,iwalk,vwalk \
        python benches/oracle_check.py ;;
  quality)
    run quality 3600 python benches/quality.py --size 512 --spp 64
    run quality_cggx 3600 python benches/quality.py --size 512 --spp 64 \
        --consistent-ggx ;;
  *)
    echo "unknown block: $BLOCK"; exit 2 ;;
esac
echo "=== block $BLOCK done ($(date -u +%H:%M:%S)) ==="
