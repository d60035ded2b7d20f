"""Preprocessing: static binarization and uniform dequantization.

Capability parity: the reference's input stage (SURVEY.md §0.1 north star:
"MNIST static binarization, CIFAR-10 uniform dequantize + normalize").

Host-side, numpy, applied once (binarization) or per-batch on device
(dequantization — it needs fresh noise each epoch, so it lives in the jitted
train step where it fuses into the encoder's first conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def static_binarize(images_u8: np.ndarray, seed: int = 0) -> np.ndarray:
    """Static Bernoulli binarization: sample b ~ Bernoulli(pixel/255) ONCE.

    "Static" = the binarization is fixed for the whole run (not resampled
    per epoch), matching the reference's MNIST setup (SURVEY.md §2.1).
    Returns float32 in {0, 1}.
    """
    rng = np.random.default_rng(seed)
    p = images_u8.astype(np.float32) / 255.0
    return (rng.random(p.shape, dtype=np.float32) < p).astype(np.float32)


def to_unit_interval(images_u8: np.ndarray) -> np.ndarray:
    """uint8 levels -> bin centers i/255 in [0,1] (discretized-logistic grid)."""
    return images_u8.astype(np.float32) / 255.0


def uniform_dequantize(key: jax.Array, images_u8: jax.Array) -> jax.Array:
    """On-device uniform dequantization: (x + u)/256, u ~ U[0,1).

    Output lies in [0, 1). Runs inside the jitted step so XLA fuses the
    noise-add into the first conv's input (SURVEY.md §2.1).
    """
    u = jax.random.uniform(key, images_u8.shape, dtype=jnp.float32)
    return (images_u8.astype(jnp.float32) + u) / 256.0


def normalize_center(x: jax.Array) -> jax.Array:
    """[0,1] -> [-1,1]; conv stacks prefer zero-centered inputs."""
    return x * 2.0 - 1.0
