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
def d_apply_fn(disc: "LatentDiscriminator"):
    """Stable ``f(d_params, z) -> logits`` for a given discriminator config.

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
