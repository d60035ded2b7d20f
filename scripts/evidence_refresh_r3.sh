#!/bin/bash
# Round-3 evidence refresh: re-materialize the results/ tree on the current
# architecture (silu+rms flagship @100k, already trained + evaluated at
# k=1000 -> 0.8398 bits/dim). Fast jobs first; one TPU process at a time
# (CLAUDE.md) — run me with nohup and poll the log.
set -ex
cd "$(dirname "$0")/.."

# 1. OOD forward, CIFAR-vs-SVHN pair, refreshed flagship
apv ood --preset ood_suite

# 2. flagship sample grid
apv sample --preset cifar_advprior_resnet -n 64 \
  --out docs/samples_cifar_synth_100k_silu.png

# 3. config 1: full 30k MNIST VAE + k=1000 eval (protocol of RESULTS.md)
apv train --preset mnist_vae
apv evaluate --preset mnist_vae --set eval.iwae_k=1000 \
  --set eval.iwae_chunk=50 --set eval.max_examples=1024

# 4. config 2: full 30k MNIST adversarial prior + same eval protocol
apv train --preset mnist_advprior
apv evaluate --preset mnist_advprior --set eval.iwae_k=1000 \
  --set eval.iwae_chunk=50 --set eval.max_examples=1024

# 5. fashion counterpart at the recorded operating point (30k, d_lr=1e-3)
apv train --preset mnist_advprior --set name=fashion_advprior \
  --set data.dataset=fashion_mnist --set adversarial.d_lr=1e-3

# 6. MNIST-pair OOD: both directions (own-dataset models) + model_ratio
apv ood --preset ood_suite --set name=ood_mnist_pair \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.reverse_of=fashion_advprior --both
apv ood --preset ood_suite --set name=ood_mnist_pair_model_ratio \
  --set checkpoint_of=mnist_advprior \
  --set ood.in_dataset=mnist --set ood.ood_dataset=fashion_mnist \
  --set ood.score=model_ratio --set ood.baseline_of=fashion_advprior \
  --set ood.reverse_of=fashion_advprior --both

# 7. SVHN counterpart on the 50k flagship schedule (recorded op point)
apv train --preset cifar_advprior_resnet --set name=svhn_advprior_resnet \
  --set data.dataset=svhn --set train.steps=50000

# 8. CIFAR-pair OOD both directions + model_ratio
apv ood --preset ood_suite --set ood.reverse_of=svhn_advprior_resnet --both
apv ood --preset ood_suite --set name=ood_cifar_model_ratio \
  --set ood.score=model_ratio --set ood.baseline_of=svhn_advprior_resnet \
  --set ood.reverse_of=svhn_advprior_resnet --both

echo "evidence refresh complete"
