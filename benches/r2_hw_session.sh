#!/bin/bash
# Round-2 hardware measurement session, in dependency order.
# Run on the real TPU: bash benches/r2_hw_session.sh [outdir]
set -u -o pipefail
OUT="${1:-/tmp/r2hw}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, cmd...
  local name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log"
  local rc=$?            # pipefail: rc is the command's, not tee's
  echo "rc=$rc ($name)"
  return $rc
}

# 1. correctness gate — REQUIRED before any perf claim. On failure, bisect
#    the round-2 kernel knobs (hierarchical skips / layout gating), log
#    WHICH path broke, and FALL BACK to the safe knobs for the rest of the
#    session — never bench a kernel the oracle rejected.
run oracle python benches/oracle_check.py || {
  if run oracle_noskip env PT_WALK_LSKIP=0 python benches/oracle_check.py; then
    export PT_WALK_LSKIP=0
    echo "!! oracle failed with hierarchical skips; session continues with PT_WALK_LSKIP=0"
  elif run oracle_legacy env PT_WALK_LSKIP=0 PT_WALK_MASK_LAYOUT=0 \
      python benches/oracle_check.py; then
    export PT_WALK_LSKIP=0 PT_WALK_MASK_LAYOUT=0
    echo "!! oracle needed full legacy knobs; session continues with them"
  fi
  # the two-level vwalk case is packed directly (PT_VWALK can't gate the
  # oracle) — if ONLY that case failed, route two-level rows through iwalk
  if grep -q "vwalk.*FAIL" "$OUT/oracle.log"; then
    export PT_VWALK=0
    echo "!! vwalk oracle case failed; two-level rows fall back to iwalk"
  fi
}

# 2. headline (driver metric)
run headline python bench.py

# 3. all configs incl. dragon + 4K env
run bench_all python benches/bench_all.py --size 512 --spp 16 --extended

# 4. config 5 as specified (slice: 64 spp for the rate; full 1024 spp only
#    if time allows — rate is spp-invariant past a few waves); engine A/B
run twolevel python benches/bench_twolevel.py --spp 64
run ab_c5_iwalk env PT_VWALK=0 python benches/bench_twolevel.py --spp 16

# 4b. two-level dragon (shared BLAS, multi-part) at a modest slice —
#     default engine is vwalk ((instance, chunk)-granular gated walk)
run twolevel_dragon python benches/bench_twolevel.py --scene dragon \
    --width 512 --height 512 --spp 8
# engine A/B: instance-granular iwalk instead of vwalk
run ab_vwalk0 env PT_VWALK=0 python benches/bench_twolevel.py \
    --scene dragon --width 512 --height 512 --spp 8
# finer per-(instance, part) gating A/B for iwalk (smaller parts = tighter)
run ab_isplit env PT_VWALK=0 PT_IWALK_SPLIT=256 python benches/bench_twolevel.py \
    --scene dragon --width 512 --height 512 --spp 8

# 4c. A/B knobs on the mid-size configs (walk below the dense threshold;
#     sort on/off) — cheap single-config runs
run ab_walkmin env PT_WALK_MIN=0 python benches/bench_all.py --size 512 --spp 16
run ab_nosort env PT_WALK_SORT=0 python benches/bench_all.py --size 512 --spp 16 --extended

# 4d. env fetch A/B: quad table (default) vs four 3-wide gathers
run ab_envplain env PT_ENV_QUAD=0 python benches/bench_all.py --size 512 --spp 16 --only env_sphere_4k
# 4e. shadow-batch coherence sort A/B (any-hit batches keep pixel-major
#     order by default) and wave-size A/B on the dragon
run ab_sortany env PT_WALK_SORT_ANY=1 python benches/bench_all.py --size 512 --spp 16 --only dragon_scene
run ab_tile64k env PT_WALK_TILE=65536 python benches/bench_all.py --size 512 --spp 16 --only dragon_scene
run ab_part128k env PT_WALK_PART_TRIS=131072 python benches/bench_all.py --size 512 --spp 16 --only dragon_scene

# 5. interactive loop
run fps python benches/interactive_fps.py --frames 48
# the reference's own showcase, interactively: dragon + env map
run fps_dragon python benches/interactive_fps.py --scene dragon_scene --frames 12

# 5b. walk phase breakdown (sort/mask/kernel split + visit efficiency)
run profile_walk python benches/profile_walk.py --scene mesh --rays 262144
run profile_walk_dragon python benches/profile_walk.py --scene dragon --rays 262144
# key-split A/B: origin-cell vs direction-cone tightness for bounce batches
run ab_obits env PT_WALK_KEY_OBITS=9 python benches/profile_walk.py --scene dragon --rays 262144
# hierarchical window-skip A/B (word/summary min-tent levels; default ON —
# this row measures the win by turning it OFF)
run ab_lskip0 env PT_WALK_LSKIP=0 python benches/profile_walk.py --scene dragon --rays 262144
# mask-build memory-traffic A/B: layout-order gate + row permute vs the
# default per-block cb_oct fetch (bit-identical masks)
run ab_mlayout env PT_WALK_MASK_LAYOUT=1 python benches/profile_walk.py --scene dragon --rays 262144

# 6. quality harness (the slow one — run last)
run quality python benches/quality.py --spp 256 --size 128
