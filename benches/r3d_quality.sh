#!/bin/bash
# Round-3 session D: spec-scale quality rows (VERDICT r2 item 7).
# 512x512 @ 64 spp cross-estimator MSE for all 5 configs, default +
# consistent-ggx control column. Run after the perf session.
set -u -o pipefail
# canonicalize the outdir BEFORE cd (ADVICE r3: a relative argument must not
# split the mkdir target and the tee target across directories)
OUT="$(mkdir -p "${1:-/tmp/r3d}" && cd "${1:-/tmp/r3d}" && pwd)"
cd "$(dirname "$0")/.."

guard() {
  for i in $(seq 1 24); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && return 0
    echo "  (tpu probe $i/24 failed; waiting 30s)"; sleep 30
  done
  echo "!! TPU did not come back; continuing anyway"; return 1
}

run() {
  # record rc (incl. timeout rc=124) in the log so a truncated quality row
  # can never be mistaken for a completed one (ADVICE r3)
  local name="$1"; local tmo="$2"; shift 2
  guard
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.log"
  local rc=$?
  echo "rc=$rc ($name)" | tee -a "$OUT/$name.log"
  return $rc
}

run quality 3000 python benches/quality.py --size 512 --spp 64
run quality_cggx 3000 python benches/quality.py --size 512 --spp 64 --consistent-ggx
echo "=== session D done ($(date -u +%H:%M:%S)) ==="
