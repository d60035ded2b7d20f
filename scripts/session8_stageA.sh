#!/bin/bash
# Round-5 stage A (run AFTER the cifar_gb_400k train frees the chip; one
# TPU process at a time — CLAUDE.md). VERDICT r4 tasks 1, 3b, 10:
#   1. Standing orders first (cheap + certain): on-chip kernel parity,
#      bench with spread.
#   2. The gb long-horizon gate's measurement tail: bits/dim k=1000,
#      shaped + expost sample quality (entry points now write
#      prior-suffixed artifacts natively), expost eval for the NLL A/B,
#      OOD prior-ratio integrity, latent scatter.
#   3. Evidence-retention recapture on cifar_gb_100k (VERDICT weak-2):
#      the shaped-prior headline 0.365 now lands in sample_quality.json
#      while the expost rerun lands in sample_quality_expost.json —
#      both durable.
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

quality_ab() {  # quality_ab <run_name>: shaped-vs-expost Frechet gap
  run "${1}_q_shaped" apv sample --preset cifar_advprior_resnet \
    --set name="$1" -n 64 --quality 2048 --seed 0 --mode sample
  run "${1}_q_expost" apv sample --preset cifar_advprior_resnet \
    --set name="$1" -n 64 --quality 2048 --seed 0 --mode sample \
    --prior expost
}

# --- 1. standing orders ----------------------------------------------------
run tpu_parity python scripts/tpu_checks.py
run bench python bench.py

# --- 2. gb_400k measurement tail ------------------------------------------
run gb400k_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_gb_400k --set name=cifar_gb_400k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
run gb400k_eval_expost apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_gb_400k --set name=cifar_gb_400k \
  --set eval.iwae_k=1000 --set eval.max_examples=512 --prior expost
quality_ab cifar_gb_400k
run gb400k_ood apv ood --preset ood_suite --set name=ood_cifar_gb_400k \
  --set checkpoint_of=cifar_gb_400k --set ood.score=prior_ratio
run gb400k_scatter apv sample --preset cifar_advprior_resnet \
  --set name=cifar_gb_400k --set model.prior=gaussian -n 512 \
  --visualize latent --out docs/latent_scatter_cifar_gb_400k.png

# --- 3. gb_100k headline recapture (durable artifacts) ---------------------
quality_ab cifar_gb_100k

echo "=== stageA complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
