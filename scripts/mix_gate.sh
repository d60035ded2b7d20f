#!/bin/bash
# disc_logistic_mix quality gate: the exact 3k/10k-step IWAE protocol of
# RESULTS.md roofline 2b/3b. Baselines to beat (flagship silu+rms, single
# disc-logistic): 3k/k=100 -> 2.495 bits/dim, 10k/k=1000 -> 1.315.
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_mix_gate --set model.likelihood=disc_logistic_mix \
  --set train.steps=3000 --set train.eval_every=1000 \
  --set train.checkpoint_every=3000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_mix_gate \
  --set eval.iwae_k=100 --set eval.max_examples=512

apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_mix_10k --set model.likelihood=disc_logistic_mix \
  --set train.steps=10000 --set train.eval_every=2000 \
  --set train.checkpoint_every=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_mix_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
