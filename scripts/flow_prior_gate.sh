#!/bin/bash
# Trained-flow-prior quality gate (round 3, session 4) — the exact
# roofline-§2b protocol, comparing model.prior=flow against the two
# recorded prior families on identical schedules/seeds:
#   CIFAR 3k steps  / eval k=100 / 512 ex   (adv baseline 2.495 bits/dim)
#   CIFAR 10k steps / eval k=1000 / 512 ex  (adv baseline 1.315 bits/dim)
#   MNIST config-2 full 30k / k=1000 / 1024 ex
#     (adversarial 515.10 nats, plain N(0,I) 515.46 — RESULTS.md)
# The flow prior is exact (log Z = 0), so its NLL rows need no MC
# log-partition caveat. ~15 min on one chip. One TPU process at a time
# (CLAUDE.md); run with nohup after the chip frees.
set -ex
cd "$(dirname "$0")/.."

# --- CIFAR 3k gate
apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_flow_3k --set adversarial.enabled=false \
  --set model.prior=flow --set train.steps=3000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_flow_3k \
  --set eval.iwae_k=100 --set eval.max_examples=512

# --- CIFAR 10k gate
apv train --preset cifar_advprior_resnet --overwrite \
  --set name=cifar_flow_10k --set adversarial.enabled=false \
  --set model.prior=flow --set train.steps=10000
apv evaluate --preset iwae_eval --set checkpoint_of=cifar_flow_10k \
  --set eval.iwae_k=1000 --set eval.max_examples=512

# --- MNIST 30k (config-2 protocol, flow prior instead of adversarial)
apv train --preset mnist_advprior --overwrite \
  --set name=mnist_flow_30k --set adversarial.enabled=false \
  --set model.prior=flow
apv evaluate --preset iwae_eval --set checkpoint_of=mnist_flow_30k \
  --set eval.iwae_k=1000 --set eval.max_examples=1024

# Sample quality + latent scatter on the MNIST flow model (same protocol
# as the expost A/B: n=2048, mode=sample).
apv sample --preset mnist_advprior --set name=mnist_flow_30k \
  -n 64 --quality 2048 --seed 0 --mode sample
apv sample --preset mnist_advprior --set name=mnist_flow_30k \
  -n 512 --visualize latent --out docs/latent_scatter_mnist_flow.png

echo "flow_prior_gate complete"
