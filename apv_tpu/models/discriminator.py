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
import jax
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


class SNDense(nn.Module):
    """Dense with stateless spectral normalization (SN-GAN lineage,
    arXiv 1802.05957, adapted): applies W/σ(W), with σ estimated by
    ``n_iter`` power iterations from a FIXED deterministic start vector.

    The canonical SN carries the power-iteration vector u as mutable
    state across steps; a mutable flax collection would leak into every
    d_params consumer (train step, serving export, SIR sampling, OOD
    scoring) and into the checkpoint format. The latent D is a tiny MLP,
    so re-running a short power iteration per forward costs a few
    [z,w]-sized matvecs — noise next to the conv stacks — and keeps D a
    pure function of its params. Gradient flows through W in
    σ = uᵀWv with u, v stop-gradiented, as in the paper."""
    features: int
    n_iter: int = 5

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        d_in = kernel.shape[0]
        # Fixed RANDOM start vector (deterministic in the layer shape): a
        # structured start like all-ones is exactly orthogonal to the top
        # singular vector for any kernel whose columns sum to zero —
        # power iteration then returns sigma=0 and kernel/sigma NaNs the
        # forward (round-3 review finding). A fixed Gaussian start is
        # almost-surely non-orthogonal for every kernel the optimizer can
        # reach, and keeps the layer a pure function of its params.
        v = jax.random.normal(jax.random.PRNGKey(d_in * 31 + self.features),
                              (d_in,), kernel.dtype)
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = kernel.T @ v
        for _ in range(self.n_iter):
            u = u / (jnp.linalg.norm(u) + 1e-12)
            v = kernel @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = kernel.T @ v
        u = jax.lax.stop_gradient(u / (jnp.linalg.norm(u) + 1e-12))
        v = jax.lax.stop_gradient(v)
        # max guard: sigma=0 only for the zero kernel, where W/sigma must
        # degrade to the zero map, not 0/0.
        sigma = jnp.maximum(v @ kernel @ u, 1e-12)
        return x @ (kernel / sigma) + bias


class LatentDiscriminator(nn.Module):
    widths: Sequence[int] = (256, 256)
    negative_slope: float = 0.2
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, z):
        dense = SNDense if self.spectral_norm else nn.Dense
        h = z.astype(jnp.float32)
        for w in self.widths:
            h = dense(w)(h)
            h = nn.leaky_relu(h, self.negative_slope)
        return dense(1)(h)[..., 0]          # [B] logits


def make_latent_d(adv_cfg) -> LatentDiscriminator:
    """The latent D for an AdversarialConfig — single construction point
    so architecture knobs (widths, spectral norm) reach every consumer
    (train step, eval scoring, SIR sampling, serving export) in lockstep."""
    return LatentDiscriminator(tuple(adv_cfg.d_widths),
                               spectral_norm=adv_cfg.d_spectral_norm)


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
