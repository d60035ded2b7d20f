"""Fused Pallas TPU kernels for the four hot probabilistic ops
(SURVEY.md §2.2 "the Pallas-kernel tier").

Placeholder tier for now: delegates to the jnp implementations. Real fused
kernels land here behind the same signatures (reparam, kl, bernoulli,
disc_logistic) — dispatch.py routes to this module whenever the backend is
'pallas'.
"""

from __future__ import annotations

from apv_tpu.ops import dispatch as _d


def reparam(key, mean, logvar):
    return _d._reparam_jnp(key, mean, logvar)


def kl(mean, logvar):
    return _d._kl_jnp(mean, logvar)


def bernoulli(x, logits):
    return _d._bernoulli_jnp(x, logits)


def disc_logistic(x, mean, log_scale, bin_size):
    return _d._disc_logistic_jnp(x, mean, log_scale, bin_size)
