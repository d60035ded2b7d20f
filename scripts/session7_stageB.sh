#!/bin/bash
# Round-4 stage B (run AFTER session7_stageA.sh frees the chip; one TPU
# process at a time — CLAUDE.md). Ordered cheap-and-certain first:
#   1. Standing orders: on-chip kernel parity gate + bench refresh (the
#      bench now reports window spread — VERDICT r3 items 7, 8).
#   2. MNIST-pair evidence: mnist_advprior + fashion counterpart retrains
#      (checkpoints were wiped), fashion eval.json (VERDICT weak-5),
#      OOD both directions + model_ratio + the unmeasured complexity
#      score on the pair (VERDICT item 4).
#   3. Equilibrium-aware fashion arms (VERDICT item 6): d_lr cosine decay
#      at 30k and at 60k — does the decay prevent the measured 30k->60k
#      reverse-AUROC regression (0.865 -> 0.834, constant d_lr)?
#   4. D-saturation arms on the config where D actually saturates
#      (VERDICT item 3): flagship 100k baseline retrain + r1_gamma=0.1 /
#      d_lr cosine / spectral-norm arms, each with the headline eval and
#      the shaped-vs-expost sample-quality gap.
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

# --- 1. standing orders ----------------------------------------------------
run tpu_parity python scripts/tpu_checks.py
run bench python bench.py

# --- 2. MNIST-pair evidence ------------------------------------------------
run mnist_adv_train apv train --preset mnist_advprior --overwrite
run mnist_adv_eval apv evaluate --preset mnist_advprior \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 --set eval.max_examples=1024

run fashion_train apv train --preset mnist_advprior --overwrite \
  --set name=fashion_advprior \
  --set data.dataset=fashion_mnist --set adversarial.d_lr=1e-3
# VERDICT weak-5: the counterpart's own NLL on record (eval.json in its
# results dir; arch/data adopted from the checkpoint's config.json).
run fashion_eval apv evaluate --preset mnist_advprior \
  --set name=fashion_advprior --set data.dataset=fashion_mnist \
  --set adversarial.d_lr=1e-3 \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 --set eval.max_examples=1024

run ood_mnist apv ood --preset ood_suite --set name=ood_mnist_pair \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.reverse_of=fashion_advprior --both
run ood_mnist_mr apv ood --preset ood_suite \
  --set name=ood_mnist_pair_model_ratio \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=model_ratio --set ood.baseline_of=fashion_advprior \
  --set ood.reverse_of=fashion_advprior --both
# The unmeasured complexity score, MNIST pair (CIFAR pair runs in stage A).
run ood_mnist_cx apv ood --preset ood_suite \
  --set name=ood_mnist_complexity \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=complexity --set ood.reverse_of=fashion_advprior --both

# --- 3. fashion equilibrium arms (d_lr cosine decay) -----------------------
run fashion_cos30_train apv train --preset mnist_advprior --overwrite \
  --set name=fashion_cos30 --set data.dataset=fashion_mnist \
  --set adversarial.d_lr=1e-3 --set adversarial.d_lr_schedule=cosine
run fashion_cos30_ood apv ood --preset ood_suite \
  --set name=ood_fashion_cos30 --set checkpoint_of=fashion_cos30 \
  --set ood.in_dataset=fashion_mnist --set ood.ood_dataset=mnist
run fashion_cos60_train apv train --preset mnist_advprior --overwrite \
  --set name=fashion_cos60 --set data.dataset=fashion_mnist \
  --set train.steps=60000 \
  --set adversarial.d_lr=1e-3 --set adversarial.d_lr_schedule=cosine
run fashion_cos60_ood apv ood --preset ood_suite \
  --set name=ood_fashion_cos60 --set checkpoint_of=fashion_cos60 \
  --set ood.in_dataset=fashion_mnist --set ood.ood_dataset=mnist
# Closed-loop variant at the regression horizon: D updates throttled by
# d_loss's distance from the smoothing floor (d_lr_schedule=floor_adaptive).
run fashion_fa60_train apv train --preset mnist_advprior --overwrite \
  --set name=fashion_fa60 --set data.dataset=fashion_mnist \
  --set train.steps=60000 \
  --set adversarial.d_lr=1e-3 --set adversarial.d_lr_schedule=floor_adaptive
run fashion_fa60_ood apv ood --preset ood_suite \
  --set name=ood_fashion_fa60 --set checkpoint_of=fashion_fa60 \
  --set ood.in_dataset=fashion_mnist --set ood.ood_dataset=mnist

# --- 4. D-saturation arms on the flagship 100k schedule --------------------
quality_ab() {  # quality_ab <run_name>: shaped-vs-expost Frechet gap
  run "${1}_q_shaped" apv sample --preset cifar_advprior_resnet \
    --set name="$1" -n 64 --quality 2048 --seed 0 --mode sample
  run "${1}_q_expost" apv sample --preset cifar_advprior_resnet \
    --set name="$1" -n 64 --quality 2048 --seed 0 --mode sample \
    --prior expost --out "results/$1/samples_expost.png"
}

run cifar_base_train apv train --preset cifar_advprior_resnet --overwrite
run cifar_base_eval apv evaluate --preset iwae_eval \
  --set name=cifar_advprior_resnet \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_advprior_resnet

# Trained flow prior at the FULL flagship schedule (VERDICT r3 item 2's
# "full-schedule run"): its 3k/10k gates BEAT the adversarial baseline
# (2.382 vs 2.495; 1.128 vs 1.315 bits/dim) - if that holds at 100k this
# is the new quality headline. Exact NLL (log Z = 0).
run cifar_flow_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_flow_100k --set adversarial.enabled=false \
  --set model.prior=flow
run cifar_flow_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_flow_100k --set name=cifar_flow_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
run cifar_flow_q apv sample --preset cifar_advprior_resnet \
  --set name=cifar_flow_100k --set adversarial.enabled=false \
  --set model.prior=flow -n 64 --quality 2048 --seed 0 --mode sample
run cifar_flow_scatter apv sample --preset cifar_advprior_resnet \
  --set name=cifar_flow_100k --set adversarial.enabled=false \
  --set model.prior=flow -n 512 \
  --visualize latent --out docs/latent_scatter_cifar_flow_100k.png

# Trainable gaussian base composed with the D (round-4 feature): the
# training-time counterpart of the measured-winning ex-post fit - the
# direct attack on the shaped prior's under-dispersion (VERDICT weak-3).
run cifar_gb_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_gb_100k --set model.prior=gaussian
run cifar_gb_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_gb_100k --set name=cifar_gb_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_gb_100k
run cifar_gb_scatter apv sample --preset cifar_advprior_resnet \
  --set name=cifar_gb_100k --set model.prior=gaussian -n 512 \
  --visualize latent --out docs/latent_scatter_cifar_gb_100k.png

run cifar_dcos_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_dcos_100k --set adversarial.d_lr_schedule=cosine
run cifar_dcos_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_dcos_100k --set name=cifar_dcos_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_dcos_100k

run cifar_r1_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_r1_100k --set adversarial.r1_gamma=0.1
run cifar_r1_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_r1_100k --set name=cifar_r1_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_r1_100k

run cifar_fa_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_fa_100k --set adversarial.d_lr_schedule=floor_adaptive
run cifar_fa_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_fa_100k --set name=cifar_fa_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_fa_100k

run cifar_sn_train apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_sn_100k --set adversarial.d_spectral_norm=true
run cifar_sn_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_sn_100k --set name=cifar_sn_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
quality_ab cifar_sn_100k

echo "=== stageB complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
