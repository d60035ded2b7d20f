"""``sample`` entry: batched XLA decode + image grids (SURVEY.md §2.5, §3.4).

Prior sampling under the adversarial prior uses SIR (sampling-importance-
resampling): draw a pool from N(0,I), weight by e^{D(z)} (the density-ratio
correction), resample — giving approximate draws from p*(z) ∝ p0(z)·e^{D(z)}
without MCMC, as one jitted pass.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from apv_tpu.training.losses import decoder_output_to_likelihood_params


def sample_prior(key: jax.Array, n: int, z_dim: int, *, d_apply=None,
                 d_params=None, pool_factor: int = 16) -> jax.Array:
    """n draws from the prior; with d_apply, SIR from the shaped prior."""
    if d_apply is None:
        return jax.random.normal(key, (n, z_dim), jnp.float32)
    k_pool, k_sel = jax.random.split(key)
    pool = jax.random.normal(k_pool, (n * pool_factor, z_dim), jnp.float32)
    logw = d_apply(d_params, pool)
    idx = jax.random.categorical(k_sel, logw, shape=(n,))
    return pool[idx]


def decoder_pixels(out: jax.Array, key: jax.Array, likelihood: str,
                   image_channels: int, mode: str = "mean") -> jax.Array:
    """Decoder output → images in [0,1] ('mean' of the pixel likelihood,
    or 'sample' to draw from it)."""
    lik = decoder_output_to_likelihood_params(out, likelihood,
                                              image_channels)
    if likelihood == "bernoulli":
        probs = jax.nn.sigmoid(lik[0])
        if mode == "mean":
            return probs
        return jax.random.bernoulli(key, probs).astype(jnp.float32)
    if likelihood == "disc_logistic_mix":
        from apv_tpu.core.distributions import (
            discretized_logistic_mixture_mean,
            discretized_logistic_mixture_sample)
        means, log_scales, logits = lik
        if mode == "mean":
            return jnp.clip(
                discretized_logistic_mixture_mean(means, logits), 0.0, 1.0)
        return discretized_logistic_mixture_sample(key, means, log_scales,
                                                   logits)
    mean, log_scale = lik
    if mode == "mean":
        return jnp.clip(mean, 0.0, 1.0)
    from apv_tpu.core.distributions import discretized_logistic_sample
    return discretized_logistic_sample(key, mean, log_scale)


@functools.lru_cache(maxsize=32)
def _sample_fn(model, n: int, z_dim: int, likelihood: str,
               image_channels: int, mode: str, d_apply):
    """Cached jitted decode pass: without the cache every generate_samples
    call builds a fresh closure, so jit re-traces (and reloads from the
    persistent compile cache) per call — ~475 ms of pure overhead on the
    flagship decoder vs ~22 ms of compute (RESULTS.md sampling row)."""

    @jax.jit
    def _run(params, d_params, key):
        k_z, k_x = jax.random.split(key)
        z = sample_prior(k_z, n, z_dim, d_apply=d_apply, d_params=d_params)
        out = model.apply({"params": params}, z, method="decode")
        return decoder_pixels(out, k_x, likelihood, image_channels, mode)

    return _run


def generate_samples(model, params, key: jax.Array, n: int, z_dim: int,
                     likelihood: str, image_channels: int, *,
                     d_apply=None, d_params=None,
                     mode: str = "mean") -> jax.Array:
    """Decode n prior samples → images in [0,1], one jitted batched pass."""
    fn = _sample_fn(model, n, z_dim, likelihood, image_channels, mode,
                    d_apply)
    return fn(params, d_params, key)


def reconstruct_images(model, params, x_in: jax.Array, key: jax.Array,
                       likelihood: str, image_channels: int, *,
                       mode: str = "mean") -> jax.Array:
    """x → q(z|x) sample → decode, one jitted pass (visualization parity:
    the reference lineage's reconstruction plots — SURVEY.md §1 L6)."""

    @jax.jit
    def _run(params, x, key):
        k_z, k_x = jax.random.split(key)
        mean, logvar = model.apply({"params": params}, x, method="encode")
        from apv_tpu import ops
        z = ops.reparam_sample(k_z, mean, logvar)
        out = model.apply({"params": params}, z, method="decode")
        return decoder_pixels(out, k_x, likelihood, image_channels, mode)

    return _run(params, x_in, key)


def latent_interpolate(model, params, x_a: jax.Array, x_b: jax.Array,
                       steps: int, likelihood: str, image_channels: int, *,
                       kind: str = "slerp") -> jax.Array:
    """Decode a latent path between two image batches: encode both to
    posterior means, interpolate in z ('slerp' walks the great circle —
    the natural path under a Gaussian prior, where interpolants keep
    typical norm — or 'lerp'), decode every step in one batched pass.

    Returns [P, steps, H, W, C] for P pairs.
    """

    @jax.jit
    def _run(params, x_a, x_b):
        z_a, _ = model.apply({"params": params}, x_a, method="encode")
        z_b, _ = model.apply({"params": params}, x_b, method="encode")
        t = jnp.linspace(0.0, 1.0, steps)[None, :, None]      # [1,S,1]
        za, zb = z_a[:, None, :], z_b[:, None, :]              # [P,1,Z]
        if kind == "slerp":
            na = jnp.linalg.norm(za, axis=-1, keepdims=True)
            nb = jnp.linalg.norm(zb, axis=-1, keepdims=True)
            cos = jnp.sum(za * zb, -1, keepdims=True) / (na * nb + 1e-9)
            omega = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))
            so = jnp.sin(omega)
            z = (jnp.sin((1 - t) * omega) / so * za
                 + jnp.sin(t * omega) / so * zb)
        elif kind == "lerp":
            z = (1 - t) * za + t * zb
        else:
            raise ValueError(f"unknown interpolation kind {kind!r}")
        p, s, zd = z.shape
        out = model.apply({"params": params}, z.reshape(p * s, zd),
                          method="decode")
        img = decoder_pixels(out, jax.random.PRNGKey(0), likelihood,
                             image_channels, "mean")
        return img.reshape((p, s) + img.shape[1:])

    return _run(params, x_a, x_b)


def save_image_grid(images, path: str | Path, *, cols: int = 8,
                    pad: int = 2) -> Path:
    """[N,H,W,C] floats in [0,1] → one PNG grid (Pillow)."""
    from PIL import Image

    arr = np.asarray(jax.device_get(images))
    n, h, w, c = arr.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    grid = np.ones((rows * (h + pad) - pad, cols * (w + pad) - pad, c),
                   np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * (h + pad):r * (h + pad) + h,
             col * (w + pad):col * (w + pad) + w] = arr[i]
    img = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if c == 1:
        img = img[..., 0]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(path)
    return path
