#!/bin/bash
# Round-3 session-3/4 measurement batch — run AFTER scale_1600k.sh frees
# the chip (one TPU process at a time, CLAUDE.md). Measures the new
# capabilities on converged checkpoints:
#   1. Ex-post (GMM / flow) NLL: does the exact train-split-fitted prior
#      beat the shaped prior's MC-estimated NLL on an under-dispersed
#      checkpoint?
#   2. Ex-post GMM / flow generation quality vs the diagonal-Gaussian
#      ex-post fit (the 800k A/B's residual gap was q's heavy tails —
#      exactly what the flow exists to carry).
#   3. complexity OOD score on the CIFAR<->SVHN pair.
set -ex
cd "$(dirname "$0")/.."

RUN="${1:-cifar_800k}"

# --- 1. NLL under each prior (k=1000, 512 examples, the headline protocol)
apv evaluate --preset iwae_eval --set checkpoint_of="$RUN" \
  --set eval.iwae_k=1000 --set eval.max_examples=512 \
  --prior expost_gmm --gmm-k 10
apv evaluate --preset iwae_eval --set checkpoint_of="$RUN" \
  --set eval.iwae_k=1000 --set eval.max_examples=512 \
  --prior expost
apv evaluate --preset iwae_eval --set checkpoint_of="$RUN" \
  --set eval.iwae_k=1000 --set eval.max_examples=512 \
  --prior expost_flow

# --- 2. Generation-quality A/B/C: shaped prior vs expost vs expost_gmm
apv sample --preset cifar_advprior_resnet --set name="$RUN" \
  -n 64 --quality 2048 --seed 0 --mode sample
apv sample --preset cifar_advprior_resnet --set name="$RUN" \
  -n 64 --quality 2048 --seed 0 --mode sample --prior expost \
  --out "results/$RUN/samples_expost.png"
apv sample --preset cifar_advprior_resnet --set name="$RUN" \
  -n 64 --quality 2048 --seed 0 --mode sample --prior expost_gmm \
  --gmm-k 10 --out "results/$RUN/samples_expost_gmm.png"
apv sample --preset cifar_advprior_resnet --set name="$RUN" \
  -n 64 --quality 2048 --seed 0 --mode sample --prior expost_flow \
  --out "results/$RUN/samples_expost_flow.png"

# --- 3. complexity OOD score (needs no D / second model)
apv ood --preset ood_suite --set checkpoint_of="$RUN" \
  --set ood.score=complexity

echo "gmm_followup complete for $RUN"
