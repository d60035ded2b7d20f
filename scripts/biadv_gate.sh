#!/bin/bash
# Biadversarial quality gate (round 3): does the two-discriminator variant
# (adversarial.variant=biadversarial — latent prior-shaping D + pixel-space
# conv D on decoded means, pixel_weight=0.05 default) change NLL, sample
# quality (random-feature Frechet + RBF-MMD^2), and OOD AUROC vs
# learned_prior at identical schedules/seeds? Baselines are retrained
# in-script: results/ is ephemeral across VM reboots, and same-session
# retrains keep the comparison seed-exact.
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

# --- MNIST config-2, full 30k preset schedule ------------------------------
apv train --preset mnist_advprior --overwrite --set name=mnist_lp_30k
apv evaluate --preset iwae_eval --set checkpoint_of=mnist_lp_30k \
  --set eval.iwae_k=1000 --set eval.max_examples=1024
apv sample --preset mnist_advprior --set name=mnist_lp_30k \
  --quality 2048 -n 64 --out results/mnist_lp_30k/grid.png

apv train --preset mnist_advprior --overwrite --set name=mnist_biadv_30k \
  --set adversarial.variant=biadversarial
apv evaluate --preset iwae_eval --set checkpoint_of=mnist_biadv_30k \
  --set eval.iwae_k=1000 --set eval.max_examples=1024
apv sample --preset mnist_advprior --set name=mnist_biadv_30k \
  --set adversarial.variant=biadversarial \
  --quality 2048 -n 64 --out results/mnist_biadv_30k/grid.png

# OOD forward MNIST->Fashion, both models (eval adopts each checkpoint's
# saved config incl. the binarized protocol + variant)
apv ood --preset ood_suite --set name=ood_mnist_lp \
  --set checkpoint_of=mnist_lp_30k \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist
apv ood --preset ood_suite --set name=ood_mnist_biadv \
  --set checkpoint_of=mnist_biadv_30k \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist

# --- CIFAR config-3, 10k-step gate (roofline-2b horizon) -------------------
apv train --preset cifar_advprior_resnet --overwrite --set name=cifar_lp_10k \
  --set train.steps=10000 --set train.eval_every=2000 \
  --set train.checkpoint_every=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_lp_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
apv sample --preset cifar_advprior_resnet --set name=cifar_lp_10k \
  --quality 2048 -n 64 --out results/cifar_lp_10k/grid.png

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_biadv_10k --set adversarial.variant=biadversarial \
  --set train.steps=10000 --set train.eval_every=2000 \
  --set train.checkpoint_every=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_biadv_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
apv sample --preset cifar_advprior_resnet --set name=cifar_biadv_10k \
  --set adversarial.variant=biadversarial \
  --quality 2048 -n 64 --out results/cifar_biadv_10k/grid.png

# OOD forward CIFAR->SVHN, both models
apv ood --preset ood_suite --set name=ood_cifar_lp \
  --set checkpoint_of=cifar_lp_10k
apv ood --preset ood_suite --set name=ood_cifar_biadv \
  --set checkpoint_of=cifar_biadv_10k
