#!/bin/bash
# Spectral-norm D gate (round 3): the third D-regularization option next
# to label smoothing (snapped) and R1 (gated this round). Protocol
# matches scripts/r1_gate.sh: full 30k mnist_advprior schedule, IWAE
# k=1000 NLL + forward prior-ratio AUROC vs fashion. In-session baseline:
# mnist_r1_base (NLL 515.08, AUROC 0.9418). Variants: SN replacing label
# smoothing, and SN on top of it. Run me with nohup; one TPU process at
# a time (CLAUDE.md).
set -ex
cd "$(dirname "$0")/.."

for v in "mnist_sn_only:adversarial.d_spectral_norm=true,adversarial.label_smoothing=0.0" \
         "mnist_sn_smooth:adversarial.d_spectral_norm=true"; do
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
echo "sn_gate complete"
