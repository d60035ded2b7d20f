#!/bin/bash
# 16x-schedule scaling run (round 3, session 3): extends the doubling
# curve 100k->200k->400k->800k (0.833 -> 0.793 -> 0.759 -> 0.728 bits/dim
# at k=1000; RESULTS.md) one more doubling. ~6-8 h wall on one chip at the
# snapped preset's 13.8-14.3 ms/step (periodic checkpoints every 2k steps
# de-risk a relay slowdown: evaluate from the latest checkpoint if the
# session ends first). Run me with nohup; one TPU process at a time
# (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_1600k --set train.steps=1600000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_1600k \
  --set eval.iwae_k=1000 --set eval.max_examples=512

# OOD vs SVHN (the config-5 CIFAR pair) on the converged model.
apv ood --preset ood_suite --set checkpoint_of=cifar_1600k \
  --set ood.score=prior_ratio

# Sample quality: trained shaped prior vs the ex-post aggregate-posterior
# fit (the 800k model's measured win; does it grow with the horizon?).
apv sample --preset cifar_advprior_resnet --set name=cifar_1600k \
  -n 64 --quality 2048 --seed 0 --mode sample
apv sample --preset cifar_advprior_resnet --set name=cifar_1600k \
  -n 64 --quality 2048 --seed 0 --mode sample --prior expost \
  --out results/cifar_1600k/samples_expost.png

# Latent-space scatter: is the prior still under-dispersed at 1.6M?
apv sample --preset cifar_advprior_resnet --set name=cifar_1600k \
  -n 512 --visualize latent --out docs/latent_scatter_cifar_1600k.png

echo "scale_1600k complete"
