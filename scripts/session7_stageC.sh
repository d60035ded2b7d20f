#!/bin/bash
# Round-4 stage C (run after stage B frees the chip): temperature A/B on
# the cifar_flow_100k checkpoint. The T=1.0 row is already measured
# (Frechet 10.97 / MMD2 0.505 / density 0.068 / coverage 0.218 - the
# flow's inverse over-disperses, RESULTS.md); T<1 truncates the base
# draw (Glow app. D). Success = Frechet collapsing toward/below the
# adversarial baseline's 4.36 while coverage stays >> 0.004.
cd "$(dirname "$0")/.."
set -x

FAILED=0
run() {
  local name="$1"; shift
  echo "=== PHASE START: $name ($(date -u +%H:%M:%S)) ==="
  if "$@"; then
    echo "=== PHASE OK: $name ($(date -u +%H:%M:%S)) ==="
  else
    echo "=== PHASE FAILED: $name ($(date -u +%H:%M:%S)) ==="
    FAILED=$((FAILED + 1))
  fi
}

for T in 0.9 0.8 0.7; do
  run "flow_quality_T$T" apv sample --preset cifar_advprior_resnet \
    --set name=cifar_flow_100k --set adversarial.enabled=false \
    --set model.prior=flow -n 64 --quality 2048 --seed 0 --mode sample \
    --temperature "$T" \
    --out "results/cifar_flow_100k/samples_T$T.png"
  cp results/cifar_flow_100k/sample_quality.json \
     "results/cifar_flow_100k/sample_quality_T$T.json"
done

echo "=== stageC complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
