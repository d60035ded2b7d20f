#!/bin/bash
# 10k-step / IWAE k=1000 activation gates (second horizon of the round-2
# protocol; baseline rms+gelu 10k -> 1.391 bits/dim).
set -ex
cd "$(dirname "$0")/.."
for ACT in silu gelu_sigmoid; do
  NAME="cifar_${ACT}_10k"
  apv train --preset cifar_advprior_resnet --overwrite \
    --set name=$NAME --set model.activation=$ACT \
    --set train.steps=10000 --set train.eval_every=2000 \
    --set train.checkpoint_every=10000
  apv evaluate --preset iwae_eval --set checkpoint_of=$NAME \
    --set eval.iwae_k=1000 --set eval.max_examples=512
done
