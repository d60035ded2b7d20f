"""Backend dispatch for the fused probabilistic ops.

All ops take arrays whose axis 0 is the batch axis; event dims (everything
after axis 0) are reduced to one value per sample where the op is a
likelihood/divergence. The jnp tier delegates to ``apv_tpu.core`` and lets
XLA fuse; the pallas tier (``apv_tpu.ops.kernels``) hand-fuses the
elementwise math with its reduction in VMEM.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from apv_tpu.core import distributions as D

_BACKEND: str | None = None          # resolved lazily


def _default_backend() -> str:
    env = os.environ.get("APV_OPS_BACKEND")
    if env:
        return env
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def set_backend(name: str) -> None:
    if name not in ("jnp", "pallas"):
        raise ValueError(f"backend must be 'jnp' or 'pallas', got {name!r}")
    global _BACKEND
    _BACKEND = name


def get_backend() -> str:
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = _default_backend()
    return _BACKEND


@contextlib.contextmanager
def backend(name: str):
    """Temporarily pin the ops backend for the enclosed trace.

    The one production use is portable export (serving.py): on a TPU host
    the default 'pallas' tier would bake Mosaic pallas_calls into the
    traced graph, which cannot lower for the 'cpu' entry of a
    multi-platform StableHLO export — the artifact must trace the jnp
    tier regardless of the host backend."""
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


def _flat(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# jnp tier
# ---------------------------------------------------------------------------

def _reparam_jnp(key, mean, logvar):
    return D.gaussian_sample(key, mean, logvar)


def _kl_jnp(mean, logvar):
    return jnp.sum(_flat(D.gaussian_kl_standard(mean, logvar)), axis=-1)


def _bernoulli_jnp(x, logits):
    return jnp.sum(_flat(D.bernoulli_logpmf(x, logits)), axis=-1)


def _disc_logistic_jnp(x, mean, log_scale, bin_size):
    return jnp.sum(_flat(D.discretized_logistic_logpmf(
        x, mean, log_scale, bin_size=bin_size)), axis=-1)


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------

def _impl(name: str):
    if get_backend() == "pallas":
        from apv_tpu.ops import kernels
        return getattr(kernels, name)
    return {"reparam": _reparam_jnp, "kl": _kl_jnp,
            "bernoulli": _bernoulli_jnp,
            "disc_logistic": _disc_logistic_jnp}[name]


def reparam_sample(key: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mean + exp(logvar/2)·eps, differentiable w.r.t. mean/logvar."""
    return _impl("reparam")(key, mean, logvar)


def kl_standard(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Per-sample KL(q||N(0,I)), summed over event dims → [B]."""
    return _impl("kl")(mean, logvar)


def bernoulli_recon_ll(x: jax.Array, logits: jax.Array) -> jax.Array:
    """Per-sample Bernoulli log-likelihood, summed over pixels → [B]."""
    return _impl("bernoulli")(x, logits)


def disc_logistic_recon_ll(x: jax.Array, mean: jax.Array, log_scale: jax.Array,
                           *, bin_size: float = 1.0 / 255.0) -> jax.Array:
    """Per-sample discretized-logistic log-likelihood → [B]."""
    return _impl("disc_logistic")(x, mean, log_scale, bin_size)


def disc_logistic_mix_recon_ll(x: jax.Array, means: jax.Array,
                               log_scales: jax.Array, mix_logits: jax.Array,
                               *, bin_size: float = 1.0 / 255.0) -> jax.Array:
    """Per-sample mixture-of-discretized-logistics log-likelihood → [B].

    jnp tier on every backend by design: the fused Pallas likelihoods are
    0.2% of the measured flagship step (RESULTS.md op table) — a hand
    kernel for the mixture would buy nothing XLA's fusion doesn't already;
    the logsumexp over K fuses with the elementwise CDF math.
    """
    ll = D.discretized_logistic_mixture_logpmf(x, means, log_scales,
                                               mix_logits, bin_size=bin_size)
    return jnp.sum(_flat(ll), axis=-1)
