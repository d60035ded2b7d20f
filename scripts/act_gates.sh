#!/bin/bash
# Activation quality gates (VERDICT r2 item 1): the exact 3k-step/IWAE-k=100
# protocol of RESULTS.md roofline 2b, for the two cheap activations that were
# measured faster (14.4-14.8 ms vs 15.5) but never quality-gated.
# Baselines to beat (rms trunk, gelu): 3k -> 2.582 bits/dim, 10k -> 1.391.
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

for ACT in gelu_sigmoid silu; do
  NAME="cifar_${ACT}_gate"
  apv train --preset cifar_advprior_resnet --overwrite \
    --set name=$NAME --set model.activation=$ACT \
    --set train.steps=3000 --set train.eval_every=1000 \
    --set train.checkpoint_every=3000
  apv evaluate --preset iwae_eval --set checkpoint_of=$NAME \
    --set eval.iwae_k=100 --set eval.max_examples=512
done
