#!/bin/bash
# train.free_bits quality gate: the exact 3k/10k-step IWAE protocol of
# RESULTS.md roofline 2b/3b. Baselines to beat (flagship silu+rms,
# free_bits=0): 3k/k=100 -> 2.495 bits/dim, 10k/k=1000 -> 1.315.
# FB defaults to 0.25 nats/dim (z_dim=128 runs at ~3 nats/dim mean KL, so
# the floor binds only on units the objective is trying to prune).
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."
FB="${FB:-0.25}"

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_fb_gate --set train.free_bits="$FB" \
  --set train.steps=3000 --set train.eval_every=1000 \
  --set train.checkpoint_every=3000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_fb_gate \
  --set eval.iwae_k=100 --set eval.max_examples=512

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_fb_10k --set train.free_bits="$FB" \
  --set train.steps=10000 --set train.eval_every=2000 \
  --set train.checkpoint_every=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_fb_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
