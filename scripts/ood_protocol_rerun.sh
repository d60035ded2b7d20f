#!/bin/bash
# Round 3: re-run every MNIST-pair OOD table entry under the FIXED eval
# protocol (api._adopt_checkpoint_arch now adopts the checkpoint's data
# section, so ood_suite-preset runs binarize MNIST/Fashion inputs exactly
# as training did). The pre-fix round-3 numbers scored binarized-trained
# Bernoulli models on unbinarized [0,1] levels.
set -ex
cd "$(dirname "$0")/.."

apv ood --preset ood_suite --set name=ood_mnist_pair \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.reverse_of=fashion_advprior --both

for SEED in 1 2; do
  apv ood --preset ood_suite --set name=ood_mnist_pair_s$SEED \
    --set checkpoint_of=mnist_advprior_s$SEED \
    --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist
done

apv ood --preset ood_suite --set name=ood_mnist_pair_model_ratio \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=model_ratio --set ood.baseline_of=fashion_advprior \
  --set ood.reverse_of=fashion_advprior --both

echo "protocol rerun complete"
