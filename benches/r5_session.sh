#!/bin/bash
# Round-5 hardware session. Block-runnable; rows are committed to
# benches/RESULTS_r5.md as they land (the r3 lesson).
#
#   bash benches/r5_session.sh <block> [outdir]
#
# Blocks, in value/minute order:
#   oracle_fast      f64 oracle, cheap camera cases (pre-bench gate)
#   fps              interactive fps at 1024x576, cornell, B0=2 schedule A/B
#   fps_dragon       interactive fps, dragon walk-parts (the r4-unreached row)
#   twolevel_dragon  dragon two-level with the parts-aware default batch
#   vsplit_ab        PT_VWALK_SPLIT 1024/2048 A/B on the dragon two-level
#   headline         bench.py (driver metric sanity before round end)
#   fps_mesh         interactive fps, mesh_scene (schedule generality)
#   fps_512          interactive fps at 512x288 (film-size scaling)
#   fps_profile      interactive fps with trace/display phase split
#   fps_u8           fps with device-side u8 present handoff
#   dragon_small     dragon end-to-end under the shipped default batch
#
# Hard-won notes: one host CPU — never run pytest concurrently with the f64
# oracle; an oracle TIMEOUT is not a precision failure. The tunnel charges
# ~300-500 s to each process's first device->host transfer.
set -u -o pipefail
BLOCK="${1:?usage: r5_session.sh <block> [outdir]}"
OUT="$(mkdir -p "${2:-/tmp/r5hw}" && cd "${2:-/tmp/r5hw}" && pwd)"
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
  fps)
    # B0=2 (new default) vs the r4 schedule (B0=6) on the same process's
    # warm cache; 24 frames each after warmup
    run fps_b2 5400 python benches/interactive_fps.py \
        --scene cornell_specular --frames 24
    run fps_b6 5400 env PT_SEG_B0=6 python benches/interactive_fps.py \
        --scene cornell_specular --frames 24 ;;
  fps_dragon)
    run fps_dragon 10800 python benches/interactive_fps.py \
        --scene dragon_scene --frames 4 ;;
  twolevel_dragon)
    run twolevel_dragon 5400 python benches/bench_twolevel.py \
        --scene dragon --width 512 --height 512 --spp 8 ;;
  vsplit_ab)
    run vsplit2048 5400 env PT_VWALK_SPLIT=2048 python \
        benches/bench_twolevel.py --scene dragon --width 512 --height 512 --spp 8 ;;
  headline)
    run headline 3600 python bench.py ;;
  fps_mesh)
    run fps_mesh 7200 python benches/interactive_fps.py \
        --scene mesh_scene --frames 16 ;;
  fps_512)
    run fps_512 7200 python benches/interactive_fps.py \
        --scene cornell_specular --width 512 --height 288 --frames 24 ;;
  fps_profile)
    run fps_profile 5400 env PT_FPS_PROFILE=1 python \
        benches/interactive_fps.py --scene cornell_specular --frames 24 ;;
  fps_u8)
    run fps_u8 5400 env PT_FPS_PROFILE=1 PT_FPS_U8=1 python \
        benches/interactive_fps.py --scene cornell_specular --frames 24 ;;
  dragon_small)
    run dragon_small 3600 python benches/bench_all.py \
        --only dragon_scene --size 256 --spp 4 ;;
  *)
    echo "unknown block: $BLOCK"; exit 2 ;;
esac
