#!/bin/bash
# 8x-schedule scaling run (round 3): extends the 100k->200k->400k curve
# (0.833 -> 0.793 -> 0.759 bits/dim at k=1000; RESULTS.md) one more
# doubling, then runs the MALA-refinement A/B on the converged model —
# the exact regime the refinement targets (the 400k run's D saturates,
# collapsing the SIR pool's ESS). Run me with nohup; one TPU process at
# a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_800k --set train.steps=800000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_800k \
  --set eval.iwae_k=1000 --set eval.max_examples=512

# Sample-quality A/B: SIR-only vs MALA-refined shaped prior (metrics also
# land in the log; the json file is overwritten by the second call).
apv sample --preset cifar_advprior_resnet --set name=cifar_800k \
  -n 64 --quality 2048 --seed 0 --mode sample
apv sample --preset cifar_advprior_resnet --set name=cifar_800k \
  -n 64 --quality 2048 --seed 0 --mode sample --refine 30 \
  --out results/cifar_800k/samples_refined.png

# Latent-space pictures for docs/: what the shaped prior learned, and
# what the refinement does to it.
apv sample --preset cifar_advprior_resnet --set name=cifar_800k \
  -n 512 --visualize latent --out docs/latent_scatter_cifar_800k.png
apv sample --preset cifar_advprior_resnet --set name=cifar_800k \
  -n 512 --visualize latent --refine 30 \
  --out docs/latent_scatter_cifar_800k_refined.png

echo "scale_800k complete"
