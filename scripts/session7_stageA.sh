#!/bin/bash
# Round-4 stage A (one TPU process at a time — CLAUDE.md): the long-pole
# flagship retrain + the VERDICT r3 items that depend on it.
#   1. cifar_400k retrain (~1.6-2.6 h depending on relay phase) — the A/B
#      target for the prior ladder (checkpoints were wiped by the reboot).
#   2. Headline eval (k=1000, 512 ex) + prior-ratio OOD (scaling row).
#   3. gmm_followup.sh: NLL under expost/expost_gmm/expost_flow priors,
#      generation-quality ladder shaped vs expost vs gmm vs flow,
#      complexity OOD on the CIFAR<->SVHN pair.   (VERDICT r3 items 1, 4)
#   4. Latent scatter (under-dispersion check at 400k).
#   5. flow_prior_gate.sh (VERDICT r3 item 2).
# Phases continue past failures; the script exits with the failure count
# (ADVICE r3: a fully-failed queue must not look like a finished one).
cd "$(dirname "$0")/.."
set -x

FAILED=0
run() {  # run "phase name" cmd...
  local name="$1"; shift
  echo "=== PHASE START: $name ($(date -u +%H:%M:%S)) ==="
  if "$@"; then
    echo "=== PHASE OK: $name ($(date -u +%H:%M:%S)) ==="
  else
    echo "=== PHASE FAILED: $name ($(date -u +%H:%M:%S)) ==="
    FAILED=$((FAILED + 1))
  fi
}

run cifar_400k_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_400k --set train.steps=400000

run cifar_400k_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_400k \
  --set eval.iwae_k=1000 --set eval.max_examples=512

run cifar_400k_ood apv ood --preset ood_suite --set checkpoint_of=cifar_400k \
  --set ood.score=prior_ratio

run gmm_followup bash scripts/gmm_followup.sh cifar_400k

run cifar_400k_scatter apv sample --preset cifar_advprior_resnet \
  --set name=cifar_400k -n 512 --visualize latent \
  --out docs/latent_scatter_cifar_400k.png

run flow_prior_gate bash scripts/flow_prior_gate.sh

echo "=== stageA complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
