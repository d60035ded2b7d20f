"""Model networks (SURVEY.md §1 L3, §2.3).

* ``ConvVAE`` — MNIST-scale conv encoder/decoder, Bernoulli likelihood.
* ``ResNetVAE`` — CIFAR-scale residual encoder/decoder, discretized-logistic
  likelihood.
* ``LatentDiscriminator`` — the adversarial-prior MLP D(z).

All modules compute in bfloat16 (MXU-friendly) with float32 parameters and
float32 distribution-parameter heads (likelihoods are accuracy-critical).
"""

from apv_tpu.models.conv_vae import ConvVAE  # noqa: F401
from apv_tpu.models.resnet_vae import ResNetVAE  # noqa: F401
from apv_tpu.models.discriminator import (  # noqa: F401
    LatentDiscriminator, PixelDiscriminator, SNDense, d_apply_fn,
    latent_d_params, make_latent_d)
from apv_tpu.models.registry import build_model  # noqa: F401
