"""``sample`` entry: batched XLA decode + image grids (SURVEY.md §2.5, §3.4).

Prior sampling under the adversarial prior uses SIR (sampling-importance-
resampling): draw a pool from N(0,I), weight by e^{D(z)} (the density-ratio
correction), resample — giving approximate draws from p*(z) ∝ p0(z)·e^{D(z)}
without MCMC, as one jitted pass.
"""

from __future__ import annotations

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


def generate_samples(model, params, key: jax.Array, n: int, z_dim: int,
                     likelihood: str, image_channels: int, *,
                     d_apply=None, d_params=None,
                     mode: str = "mean") -> jax.Array:
    """Decode n prior samples → images in [0,1], one jitted batched pass."""

    @jax.jit
    def _run(params, d_params, key):
        k_z, k_x = jax.random.split(key)
        z = sample_prior(k_z, n, z_dim, d_apply=d_apply, d_params=d_params)
        out = model.apply({"params": params}, z, method="decode")
        lik = decoder_output_to_likelihood_params(out, likelihood,
                                                  image_channels)
        if likelihood == "bernoulli":
            probs = jax.nn.sigmoid(lik[0])
            if mode == "mean":
                return probs
            return jax.random.bernoulli(k_x, probs).astype(jnp.float32)
        mean, log_scale = lik
        if mode == "mean":
            return jnp.clip(mean, 0.0, 1.0)
        from apv_tpu.core.distributions import discretized_logistic_sample
        return discretized_logistic_sample(k_x, mean, log_scale)

    return _run(params, d_params, key)


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
