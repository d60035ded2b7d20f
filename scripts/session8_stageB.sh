#!/bin/bash
# Round-5 stage B (after stage A frees the chip). VERDICT r4 tasks 2, 5, 6:
#   1. The flow-prior generation fix gate: retrain the 100k flow flagship
#      WITH train.flow_dispersion_penalty (one-sided inverse-bulk-scale
#      penalty, λ = z_dim = 128 for KL-comparable gradients under 'sum'
#      reduction) — success = model-prior Fréchet ≤ ~1.0 (vs 10.97
#      unpenalized) while exact NLL holds ≤ ~0.72 bits/dim.
#   2. MNIST-flow rescue: the config-2 flow gate WITH the round-5
#      free-information floor (train.free_bits=0.25) — success = NLL
#      within ~2 nats of adversarial 515.1 with >0 active units.
#   3. Reverse-OOD code-thinness arms on the fashion counterpart (30k,
#      d_lr=1e-3): free_bits / β-warmup stretch / wider z, each scored on
#      reverse prior-ratio AUROC + active units (the thinness→AUROC link).
cd "$(dirname "$0")/.."
set -x

FAILED=0
run() {
  local name="$1"; shift
  echo "=== PHASE START: $name ($(date -u +%H:%M:%S)) ==="
  if "$@"; then
    echo "=== PHASE OK: $name ($(date -u +%H:%M:%S)) ==="
  else
    echo "=== PHASE FAILED: $name ($(date -u +%H:%M:%S)) ==="
    FAILED=$((FAILED + 1))
  fi
}

# --- 1. flow dispersion-penalty gate ---------------------------------------
run flowreg_train apv train --preset cifar_flow --overwrite \
  --set name=cifar_flowreg_100k --set train.flow_dispersion_penalty=128
run flowreg_eval apv evaluate --preset iwae_eval \
  --set checkpoint_of=cifar_flowreg_100k --set name=cifar_flowreg_100k \
  --set eval.iwae_k=1000 --set eval.max_examples=512
run flowreg_q_model apv sample --preset cifar_flow \
  --set name=cifar_flowreg_100k -n 64 --quality 2048 --seed 0 --mode sample
run flowreg_q_expost apv sample --preset cifar_flow \
  --set name=cifar_flowreg_100k -n 64 --quality 2048 --seed 0 \
  --mode sample --prior expost_gmm
run flowreg_scatter apv sample --preset cifar_flow \
  --set name=cifar_flowreg_100k -n 512 --visualize latent \
  --out docs/latent_scatter_cifar_flowreg_100k.png

# --- 2. MNIST-flow free-information rescue ---------------------------------
run mnist_flow_fb_train apv train --preset mnist_advprior --overwrite \
  --set name=mnist_flow_fb --set adversarial.enabled=false \
  --set model.prior=flow --set train.free_bits=0.25
run mnist_flow_fb_eval apv evaluate --preset mnist_advprior \
  --set name=mnist_flow_fb --set adversarial.enabled=false \
  --set model.prior=flow \
  --set eval.iwae_k=1000 --set eval.iwae_chunk=50 \
  --set eval.max_examples=1024

# --- 3. fashion code-thinness arms (reverse-OOD 0.9 bar) -------------------
fashion_arm() {  # fashion_arm <name> [extra --set args...]
  local name="$1"; shift
  run "${name}_train" apv train --preset mnist_advprior --overwrite \
    --set name="$name" --set data.dataset=fashion_mnist \
    --set adversarial.d_lr=1e-3 "$@"
  run "${name}_eval" apv evaluate --preset mnist_advprior \
    --set name="$name" --set data.dataset=fashion_mnist \
    --set adversarial.d_lr=1e-3 "$@" \
    --set eval.iwae_k=100 --set eval.max_examples=1024
  run "${name}_ood" apv ood --preset ood_suite \
    --set name="ood_${name}" --set checkpoint_of="$name" \
    --set ood.in_dataset=fashion_mnist --set ood.ood_dataset=mnist
}
fashion_arm fashion_fb025 --set train.free_bits=0.25
fashion_arm fashion_bwarm --set train.beta_warmup_steps=10000
fashion_arm fashion_z64 --set model.z_dim=64

echo "=== stageB complete, $FAILED phases failed ($(date -u +%H:%M:%S)) ==="
exit "$FAILED"
