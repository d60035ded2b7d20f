"""Latent-space discriminator D(z) (SURVEY.md §2.3 row 4).

An MLP on z producing one real/fake logit, separating aggregate-posterior
samples q(z) from prior samples p(z) (SURVEY.md §0.1). LeakyReLU (standard
GAN practice — keeps gradient signal on the 'fake' side), f32 throughout
(z_dim is small; MXU gains nothing from bf16 here and D's logit feeds a
density-ratio estimate that wants precision).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def d_apply_fn(disc):
    """Stable ``f(d_params, x) -> logits`` for a given discriminator config
    (works for both LatentDiscriminator and PixelDiscriminator).

    Callers that close over ``disc.apply`` ad hoc create a fresh function
    object per call, which defeats downstream jit caches keyed on function
    identity (sampling/run._sample_fn) — one retrace per invocation. The
    module is a frozen dataclass, so caching on it gives one function per
    architecture."""
    def f(d_params, z):
        return disc.apply({"params": d_params}, z)
    return f


class LatentDiscriminator(nn.Module):
    widths: Sequence[int] = (256, 256)
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, z):
        h = z.astype(jnp.float32)
        for w in self.widths:
            h = nn.Dense(w)(h)
            h = nn.leaky_relu(h, self.negative_slope)
        return nn.Dense(1)(h)[..., 0]       # [B] logits


class PixelDiscriminator(nn.Module):
    """Pixel-space discriminator D_x(x) for the 'biadversarial' variant
    (SURVEY.md §8 item 3's two-discriminator candidate): strided-conv
    LeakyReLU stack → one real/fake logit. No normalization (standard for
    small GAN critics — batch statistics leak the real/fake split), bf16
    conv compute (this IS MXU work, unlike the z-space MLP), f32 head.
    Inputs are images in the target space ([0,1] levels / binary pixels)."""
    widths: Sequence[int] = (32, 64, 128)
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (4, 4), strides=(2, 2), dtype=self.dtype)(h)
            h = nn.leaky_relu(h, self.negative_slope)
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        return nn.Dense(1, dtype=jnp.float32)(h)[..., 0]   # [B] logits


def latent_d_params(variant: str, d_params):
    """The latent D's subtree of a checkpoint's ``d_params``.

    The biadversarial variant stores BOTH discriminators under d_params
    ({'latent': ..., 'pixel': ...} — no new TrainState fields, so the
    checkpoint format stays config-determined); every eval-side consumer
    (prior-ratio scoring, SIR sampling, serving export, log-partition MC)
    wants only the latent density-ratio D and must route through here."""
    if (variant == "biadversarial" and isinstance(d_params, dict)
            and "latent" in d_params):
        return d_params["latent"]
    return d_params
