#!/bin/bash
# R1 gradient-penalty gate (round 3): does adversarial.r1_gamma help the
# D-saturation failure mode on the config-2 MNIST OOD protocol (the same
# 30k + forward prior-ratio AUROC protocol as the round-2 GAN sweep)?
# Baseline retrained in-session (checkpoints don't survive reboots):
# prior sessions measured NLL ~515.1, forward prior-ratio AUROC ~0.94.
# Variants: R1 on top of the snapped label smoothing, and R1 replacing it.
# Run me with nohup; one TPU process at a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

for v in "mnist_r1_base:adversarial.r1_gamma=0.0" \
         "mnist_r1_smooth:adversarial.r1_gamma=1.0" \
         "mnist_r1_only:adversarial.r1_gamma=1.0,adversarial.label_smoothing=0.0"; do
  name="${v%%:*}"; sets="${v#*:}"
  extra=()
  IFS=',' read -ra kvs <<< "$sets"
  for kv in "${kvs[@]}"; do extra+=(--set "$kv"); done
  apv train --preset mnist_advprior --overwrite --set "name=$name" "${extra[@]}"
  apv evaluate --preset iwae_eval --set "checkpoint_of=$name" \
    --set eval.iwae_k=1000 --set eval.max_examples=1024
  apv ood --preset ood_suite --set "name=ood_$name" \
    --set "checkpoint_of=$name" \
    --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist
done
