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


def _splitmix64_uniform(n: int, seed: int) -> np.ndarray:
    """Vectorized splitmix64 → f32 uniforms in [0,1).

    Bit-identical to the native C++ implementation in
    data/_native/batcher.cpp (apv_binarize_u8), so the binarized dataset is
    the same whether the native library built or not.
    """
    golden = np.uint64(0x9E3779B97F4A7C15)
    state0 = np.uint64(seed) ^ np.uint64(0xD1B54A32D192ED03)
    with np.errstate(over="ignore"):
        s = state0 + (np.arange(1, n + 1, dtype=np.uint64)) * golden
        z = (s ^ (s >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    r = (z >> np.uint64(40)).astype(np.float32)       # 24 high bits
    return r * np.float32(1.0 / 16777216.0)


def static_binarize(images_u8: np.ndarray, seed: int = 0) -> np.ndarray:
    """Static Bernoulli binarization: sample b ~ Bernoulli(pixel/255) ONCE.

    "Static" = the binarization is fixed for the whole run (not resampled
    per epoch), matching the reference's MNIST setup (SURVEY.md §2.1).
    Returns uint8 in {0, 1}: the host→HBM payload is 4x smaller than
    float32 (the relay link is bandwidth-bound — RESULTS.md dispatch
    probe) and the jitted step casts on device. Runs through the native
    C++ kernel when available; the numpy path reproduces the identical
    bit stream.
    """
    from apv_tpu.data import _native
    out = _native.binarize_u8(images_u8, seed)
    if out is not None:
        return out.astype(np.uint8)
    u = _splitmix64_uniform(images_u8.size, seed).reshape(images_u8.shape)
    return (u * np.float32(255.0)
            < images_u8.astype(np.float32)).astype(np.uint8)


def pack_bits(images01: np.ndarray) -> np.ndarray:
    """{0,1} images [N, H, W, C] → bit-packed [N, ceil(H·W·C/8)] uint8.

    8 pixels per byte, little-endian within each byte (bit i of byte j is
    pixel 8j+i) — the exact inverse of ``unpack_bits``. The host→HBM link
    is the measured bottleneck for the MNIST configs (~50 MB/s relay,
    RESULTS.md dispatch table); binarized pixels carry 1 bit of information,
    so shipping uint8 {0,1} wastes 8× the binding resource. Packing is
    lossless: packed and unpacked training are bit-identical
    (tests/test_data.py)."""
    n = images01.shape[0]
    flat = np.ascontiguousarray(images01.reshape(n, -1)).astype(np.uint8)
    return np.packbits(flat, axis=1, bitorder="little")


def unpack_bits(packed: jax.Array,
                image_shape: tuple[int, int, int]) -> jax.Array:
    """Device-side inverse of ``pack_bits``: [..., nbytes] uint8 →
    [..., H, W, C] float32 {0,1}. Runs inside the jitted step, so the
    bit-expand fuses with the cast feeding the first conv."""
    h, w, c = image_shape
    p = h * w * c
    bits = (packed[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    flat = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return (flat[..., :p]
            .reshape(packed.shape[:-1] + (h, w, c))
            .astype(jnp.float32))


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
