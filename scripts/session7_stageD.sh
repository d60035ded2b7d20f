#!/bin/bash
# Round-4 stage D: cheap integrity + robustness checks on the new
# gaussian-base prior, then the interrupted floor_adaptive CIFAR arm as
# the long tail (resume from its ~40k checkpoint).
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

# 1. Does prior_ratio OOD survive the moving base? (score = D on
#    posterior samples; the ratio is now vs N(mu,sigma))
run gb_ood apv ood --preset ood_suite --set name=ood_cifar_gb \
  --set checkpoint_of=cifar_gb_100k --set ood.score=prior_ratio

# 2. Serving-path smoke on the real chip: export sampler+scorer from the
#    gb checkpoint (bakes the base + base-aware log Z).
run gb_export_sampler apv export --preset cifar_advprior_resnet \
  --set name=cifar_gb_100k --what sampler \
  --out results/cifar_gb_100k/sampler.stablehlo
run gb_export_scorer apv export --preset cifar_advprior_resnet \
  --set name=cifar_gb_100k --what scorer \
  --out results/cifar_gb_100k/scorer.stablehlo

# 3. Robustness: the gaussian base on the WELL-MATCHED MNIST config-2
#    regime (round-3 scatter shows q ~= N(0,I) there) - it should be
#    neutral, not harmful.
run mnist_gb_train apv train --preset mnist_advprior --overwrite \
  --set name=mnist_gb --set model.prior=gaussian
run mnist_gb_eval apv evaluate --preset mnist_advprior \
  --set name=mnist_gb --set model.prior=gaussian \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 --set eval.max_examples=1024
run mnist_gb_ood apv ood --preset ood_suite --set name=ood_mnist_gb \
  --set checkpoint_of=mnist_gb \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist

# 4. Long tail: finish the interrupted floor_adaptive CIFAR arm.
run cifar_fa_resume apv train --preset cifar_advprior_resnet --resume \
  --set name=cifar_fa_100k --set adversarial.d_lr_schedule=floor_adaptive
run cifar_fa_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_fa_100k --set name=cifar_fa_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
run cifar_fa_q_shaped apv sample --preset cifar_advprior_resnet \
  --set name=cifar_fa_100k -n 64 --quality 2048 --seed 0 --mode sample
run cifar_fa_q_expost apv sample --preset cifar_advprior_resnet \
  --set name=cifar_fa_100k -n 64 --quality 2048 --seed 0 --mode sample \
  --prior expost --out results/cifar_fa_100k/samples_expost.png

echo "=== stageD complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
