#!/bin/bash
# IWAE-k training-objective quality gate (round 3): does training on the
# k=5 importance-weighted bound with DReG inference-net gradients beat the
# ELBO at the standard 3k/10k protocol (RESULTS.md roofline 2b)?
# Baselines (snapped silu+rms flagship, ELBO): 3k/k=100 -> 2.495 bits/dim,
# 10k/k=1000 -> 1.315. MNIST full-30k preset ELBO baseline: 515.10 nats.
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

# CIFAR 3k gate
apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_iwaeobj_3k --set train.objective=iwae \
  --set train.steps=3000 --set train.eval_every=1000 \
  --set train.checkpoint_every=3000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_iwaeobj_3k \
  --set eval.iwae_k=100 --set eval.max_examples=512

# CIFAR 10k gate
apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_iwaeobj_10k --set train.objective=iwae \
  --set train.steps=10000 --set train.eval_every=2000 \
  --set train.checkpoint_every=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_iwaeobj_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512

# MNIST full 30k preset (config-2), IWAE objective: vs ELBO's 515.10 nats
apv train --preset mnist_advprior --overwrite \
  --set name=mnist_iwaeobj_30k --set train.objective=iwae
apv evaluate --preset iwae_eval --set checkpoint_of=mnist_iwaeobj_30k \
  --set eval.iwae_k=1000 --set eval.max_examples=1024
