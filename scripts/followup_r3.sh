#!/bin/bash
# Post-evidence-refresh follow-ups:
# 1. Re-run the MNIST-pair model_ratio --both with the fixed reverse-role
#    pairing (the first run predated the ood_both fix and scored the
#    reverse direction as numerator==denominator).
# 2. Seed spread for the config-2 GAN: the refreshed mnist_advprior run
#    scored prior-ratio 0.711 where earlier records said 0.93 — quantify
#    run-to-run variance instead of trusting either single number.
# 3. IWAE k=1000 chunk-size probe (committed last session, never run).
set -ex
cd "$(dirname "$0")/.."

apv ood --preset ood_suite --set name=ood_mnist_pair_model_ratio \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=model_ratio --set ood.baseline_of=fashion_advprior \
  --set ood.reverse_of=fashion_advprior --both

for SEED in 1 2; do
  apv train --preset mnist_advprior --overwrite \
    --set name=mnist_advprior_s$SEED --set train.seed=$SEED
  apv ood --preset ood_suite --set name=ood_mnist_pair_s$SEED \
    --set checkpoint_of=mnist_advprior_s$SEED \
    --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist
done

python scripts/iwae_chunk_probe.py

echo "followup complete"
