#!/bin/bash
# Round-3 session-6 TPU queue (one TPU process at a time — CLAUDE.md).
# This session has ~1h of wall clock, so the queue is ordered
# cheapest-first so the artifacts that are certain to fit (kernel parity
# gate, MNIST-pair evidence, bench refresh) land before the long flagship
# retrain fills whatever time remains. Phases continue past failures; the
# driver polls the log.
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

# 1. On-chip Pallas kernel parity gate (VERDICT r2 standing order: every
#    round) — refreshes results/tpu_parity.json (git-tracked).
run tpu_parity python scripts/tpu_checks.py

# 2. Config-1/2 evidence: full 30k presets + k=1000 eval (RESULTS.md
#    protocol). Small graphs, fast compiles, minutes of stepping.
run mnist_vae_train apv train --preset mnist_vae --overwrite
run mnist_vae_eval apv evaluate --preset mnist_vae \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 --set eval.max_examples=1024
run mnist_adv_train apv train --preset mnist_advprior --overwrite
run mnist_adv_eval apv evaluate --preset mnist_advprior \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 --set eval.max_examples=1024

# 3. Fashion counterpart at the recorded operating point (30k, d_lr=1e-3).
run fashion_train apv train --preset mnist_advprior --overwrite \
  --set name=fashion_advprior \
  --set data.dataset=fashion_mnist --set adversarial.d_lr=1e-3

# 4. MNIST-pair OOD, both directions + two-checkpoint model_ratio.
run ood_mnist apv ood --preset ood_suite --set name=ood_mnist_pair \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.reverse_of=fashion_advprior --both
run ood_mnist_mr apv ood --preset ood_suite --set name=ood_mnist_pair_model_ratio \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=model_ratio --set ood.baseline_of=fashion_advprior \
  --set ood.reverse_of=fashion_advprior --both

# 5. Official bench refresh — also pre-warms the flagship step's compile
#    cache for phase 6 and for the driver's own end-of-round bench run.
run bench python bench.py

# 6. Flagship 100k retrain + headline eval; fills the remaining wall
#    clock (periodic checkpoints make a cutoff non-fatal).
run flagship_train apv train --preset cifar_advprior_resnet --overwrite
run flagship_eval apv evaluate --preset iwae_eval --set eval.max_examples=512
run flagship_ood apv ood --preset ood_suite
run flagship_grid apv sample --preset cifar_advprior_resnet -n 64 \
  --out docs/samples_cifar_synth_100k_silu.png

# 7. Stretch: SVHN counterpart + CIFAR-pair both-direction OOD.
run svhn_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=svhn_advprior_resnet \
  --set data.dataset=svhn --set train.steps=50000
run ood_cifar apv ood --preset ood_suite --set ood.reverse_of=svhn_advprior_resnet --both

echo "session6 queue complete, $FAILED phases failed ($(date -u +%H:%M:%S))"
exit "$FAILED"
