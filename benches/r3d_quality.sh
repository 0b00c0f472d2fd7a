#!/bin/bash
# Round-3 session D: spec-scale quality rows (VERDICT r2 item 7).
# 512x512 @ 64 spp cross-estimator MSE for all 5 configs, default +
# consistent-ggx control column. Run after the perf session.
set -u -o pipefail
OUT="${1:-/tmp/r3d}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 1 24); do
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  echo "  (tpu probe $i/24 failed; waiting 30s)"; sleep 30
done

echo "=== quality default ($(date -u +%H:%M:%S)) ==="
timeout 3000 python benches/quality.py --size 512 --spp 64 2>&1 | tee "$OUT/quality.log"
echo "=== quality consistent-ggx ($(date -u +%H:%M:%S)) ==="
timeout 3000 python benches/quality.py --size 512 --spp 64 --consistent-ggx 2>&1 \
  | tee "$OUT/quality_cggx.log"
echo "=== session D done ($(date -u +%H:%M:%S)) ==="
