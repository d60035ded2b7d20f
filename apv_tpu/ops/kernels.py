"""Fused Pallas TPU kernels for the four hot probabilistic ops
(SURVEY.md §2.2 "the Pallas-kernel tier"; north star: "fused Pallas kernels
for reparameterized sampling, KL, and Bernoulli / discretized-logistic
reconstruction likelihoods").

Design
------
* Likelihood/KL ops are per-sample *reductions*: [B, E] inputs → [B] output.
  Each kernel fuses the elementwise log-prob math with its event-dim
  reduction in VMEM — one HBM read per operand, one [B]-sized write, no
  [B, E] intermediate ever hitting HBM.
* The grid tiles the batch axis; wrappers pad B to the tile and strip after.
  The event axis stays whole inside the block (max E = 3072 ≈ 12 KB/row f32,
  so a 128-row tile is ≤ 4.7 MB for three operands — comfortably in VMEM).
* Reparameterized sampling uses the TPU hardware PRNG (pltpu.prng_random_bits
  + Box-Muller) — much cheaper than threefry — and is wrapped in a
  custom_vjp so gradients flow per the reparam trick (dz/dmean = 1,
  dz/dlogvar = (z - mean)/2). Backward passes are plain jnp: they are
  elementwise broadcasts that XLA fuses into the surrounding backward graph;
  the fusion win lives in the forward reductions and the RNG.
* Computation is float32 inside the kernels regardless of input dtype
  (likelihoods are accuracy-critical); inputs are cast on load.

Every op is parity-tested (value and gradient) against the pure-jnp oracle
in apv_tpu.core — see tests/test_kernels.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
_INTERPRET = jax.default_backend() != "tpu"   # CPU fallback: interpreter mode


# ---------------------------------------------------------------------------
# tiling helpers
# ---------------------------------------------------------------------------

def _tile_rows(n_rows: int, event: int, n_operands: int,
               vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest multiple-of-8 row tile whose operand blocks fit the budget."""
    per_row = max(event, 1) * 4 * n_operands
    tb = max(8, min(512, vmem_budget // per_row))
    tb = (tb // 8) * 8
    return max(8, min(tb, _round_up(n_rows, 8)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _flat2d(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def _pad_flat(x: jax.Array, cols: int) -> jax.Array:
    """Flatten to 1-D, zero-pad to a multiple of cols, view as [rows, cols]."""
    flat = x.reshape(-1)
    n = _round_up(flat.size, cols)
    if n != flat.size:
        flat = jnp.pad(flat, (0, n - flat.size))
    return flat.reshape(n // cols, cols)


def _reduce_call(kernel, n_in: int, rows: int, event: int, tile: int, *args):
    """Common pallas_call shape for [rows, event]^n_in -> [rows, 1]."""
    grid = rows // tile
    in_spec = pl.BlockSpec((tile, event), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        grid=(grid,),
        in_specs=[in_spec] * n_in,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# KL(q || N(0,I)) reduction
# ---------------------------------------------------------------------------

def _kl_kernel(mean_ref, logvar_ref, out_ref):
    mu = mean_ref[:].astype(jnp.float32)
    lv = logvar_ref[:].astype(jnp.float32)
    elem = 0.5 * (mu * mu + jnp.exp(lv) - 1.0 - lv)
    out_ref[:] = jnp.sum(elem, axis=1, keepdims=True)


@jax.custom_vjp
def kl(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    return _kl_fwd(mean, logvar)[0]


def _kl_fwd(mean, logvar):
    mu2, lv2 = _flat2d(mean), _flat2d(logvar)
    b, e = mu2.shape
    tile = _tile_rows(b, e, 2)
    rows = _round_up(b, tile)
    out = _reduce_call(_kl_kernel, 2, rows, e, tile,
                       _pad_rows(mu2, rows), _pad_rows(lv2, rows))
    return out[:b, 0], (mean, logvar)


def _kl_bwd(res, g):
    mean, logvar = res
    mu = mean.astype(jnp.float32)
    lv = logvar.astype(jnp.float32)
    gb = g.reshape((g.shape[0],) + (1,) * (mean.ndim - 1))
    return (gb * mu).astype(mean.dtype), \
           (gb * 0.5 * (jnp.exp(lv) - 1.0)).astype(logvar.dtype)


kl.defvjp(_kl_fwd, _kl_bwd)


# ---------------------------------------------------------------------------
# Bernoulli reconstruction log-likelihood reduction
# ---------------------------------------------------------------------------

def _bernoulli_kernel(x_ref, logits_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    l = logits_ref[:].astype(jnp.float32)
    elem = x * l - jax.nn.softplus(l)
    out_ref[:] = jnp.sum(elem, axis=1, keepdims=True)


@jax.custom_vjp
def bernoulli(x: jax.Array, logits: jax.Array) -> jax.Array:
    return _bernoulli_fwd(x, logits)[0]


def _bernoulli_fwd(x, logits):
    x2, l2 = _flat2d(x), _flat2d(logits)
    b, e = x2.shape
    tile = _tile_rows(b, e, 2)
    rows = _round_up(b, tile)
    out = _reduce_call(_bernoulli_kernel, 2, rows, e, tile,
                       _pad_rows(x2, rows), _pad_rows(l2, rows))
    return out[:b, 0], (x, logits)


def _bernoulli_bwd(res, g):
    x, logits = res
    l = logits.astype(jnp.float32)
    gb = g.reshape((g.shape[0],) + (1,) * (x.ndim - 1))
    dx = (gb * l).astype(x.dtype)                       # d/dx = logits
    dl = (gb * (x.astype(jnp.float32)
                - jax.nn.sigmoid(l))).astype(logits.dtype)
    return dx, dl


bernoulli.defvjp(_bernoulli_fwd, _bernoulli_bwd)


# ---------------------------------------------------------------------------
# Discretized-logistic reconstruction log-likelihood reduction
# ---------------------------------------------------------------------------

def _disc_logistic_elem(x, mu, ls, bin_size, low=0.0, high=1.0):
    """Elementwise stable log pmf — mirrors core.distributions (the oracle)."""
    inv_s = jnp.exp(-ls)
    half = 0.5 * bin_size
    a = (x - mu + half) * inv_s
    b = (x - mu - half) * inv_s
    t = bin_size * inv_s
    t_big = jnp.maximum(t, 1e-3)
    t_small = jnp.clip(t, 1e-20, 1e-3)
    log_expm1_t = jnp.where(t > 1e-3,
                            t_big + jnp.log1p(-jnp.exp(-t_big)),
                            jnp.log(t_small) + jnp.log1p(0.5 * t_small))
    log_interior = b + log_expm1_t - jax.nn.softplus(a) - jax.nn.softplus(b)
    log_cdf_low = -jax.nn.softplus(-a)
    log_sf_high = -jax.nn.softplus(b)
    is_low = x <= low + half
    is_high = x >= high - half
    return jnp.where(is_low, log_cdf_low,
                     jnp.where(is_high, log_sf_high, log_interior))


def _disc_logistic_kernel(bin_size, x_ref, mean_ref, ls_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    mu = mean_ref[:].astype(jnp.float32)
    ls = ls_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.sum(_disc_logistic_elem(x, mu, ls, bin_size),
                         axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def disc_logistic(x: jax.Array, mean: jax.Array, log_scale: jax.Array,
                  bin_size: float) -> jax.Array:
    return _disc_logistic_fwd(x, mean, log_scale, bin_size)[0]


def _disc_logistic_fwd(x, mean, log_scale, bin_size):
    x2, m2, s2 = _flat2d(x), _flat2d(mean), _flat2d(log_scale)
    b, e = x2.shape
    tile = _tile_rows(b, e, 3)
    rows = _round_up(b, tile)
    out = _reduce_call(
        functools.partial(_disc_logistic_kernel, float(bin_size)), 3,
        rows, e, tile, _pad_rows(x2, rows), _pad_rows(m2, rows),
        _pad_rows(s2, rows))
    return out[:b, 0], (x, mean, log_scale)


def _disc_logistic_bwd(bin_size, res, g):
    """Hand-derived gradients of the stable log-pmf (see module docstring).

    With a=(x-mu+h)/s, b=(x-mu-h)/s, t=bin/s:
      interior: dL/dmu = -(1 - sig(b) - sig(a))/s
                dL/dls = a·sig(a) - b·(1-sig(b)) + t/(e^t - 1)·t' where the
                t-term is -t·dlogexpm1/dt = -t/(1-e^{-t})
      low edge (L = log sig(a)):   dL/dmu = -sig(-a)/s, dL/dls = -a·sig(-a)
      high edge (L = log sig(-b)): dL/dmu =  sig(b)/s,  dL/dls =  b·sig(b)
      dL/dx = -dL/dmu everywhere.
    """
    x, mean, log_scale = res
    xf = x.astype(jnp.float32)
    mu = mean.astype(jnp.float32)
    ls = log_scale.astype(jnp.float32)
    inv_s = jnp.exp(-ls)
    half = 0.5 * bin_size
    a = (xf - mu + half) * inv_s
    b = (xf - mu - half) * inv_s
    t = bin_size * inv_s
    sig_a, sig_b = jax.nn.sigmoid(a), jax.nn.sigmoid(b)

    # interior
    dmu_int = -inv_s * (1.0 - sig_b - sig_a)
    # d/dls of log(expm1(t)) term: t -> t·e^{-ls}' ... dt/dls = -t, and
    # dlogexpm1/dt = 1/(1 - e^{-t}); guard tiny t where the ratio -> 1.
    t_term = jnp.where(t > 1e-4, t / -jnp.expm1(-jnp.maximum(t, 1e-4)),
                       1.0 + 0.5 * t)
    dls_int = a * sig_a - b * (1.0 - sig_b) - t_term
    # low edge
    dmu_low = -inv_s * jax.nn.sigmoid(-a)
    dls_low = -a * jax.nn.sigmoid(-a)
    # high edge
    dmu_high = inv_s * sig_b
    dls_high = b * sig_b

    is_low = xf <= 0.0 + half
    is_high = xf >= 1.0 - half
    dmu = jnp.where(is_low, dmu_low, jnp.where(is_high, dmu_high, dmu_int))
    dls = jnp.where(is_low, dls_low, jnp.where(is_high, dls_high, dls_int))

    gb = g.reshape((g.shape[0],) + (1,) * (x.ndim - 1)).astype(jnp.float32)
    return ((-gb * dmu).astype(x.dtype), (gb * dmu).astype(mean.dtype),
            (gb * dls).astype(log_scale.dtype))


disc_logistic.defvjp(_disc_logistic_fwd, _disc_logistic_bwd)


# ---------------------------------------------------------------------------
# Fused reparameterized sampling (hardware PRNG + Box-Muller + affine)
# ---------------------------------------------------------------------------

def _reparam_kernel(seed_ref, mean_ref, logvar_ref, out_ref):
    # Decorrelate grid programs by folding program_id into the seed words
    # (Mosaic accepts at most two seed values).
    pid = pl.program_id(0)
    s0 = seed_ref[0] + pid * jnp.int32(-1640531527)   # golden-ratio constant
    s1 = seed_ref[1] ^ (pid + jnp.int32(0x1234567))
    pltpu.prng_seed(s0, s1)
    mu = mean_ref[:].astype(jnp.float32)
    lv = logvar_ref[:].astype(jnp.float32)

    def uniform01(shape):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # top 23 bits -> mantissa of [1,2), subtract 1 -> [0,1)
        f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
        return f - 1.0

    u1 = uniform01(mu.shape)
    u2 = uniform01(mu.shape)
    # Box-Muller; clamp u1 away from 0 (log) — loses nothing at f32 eps.
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    eps = r * jnp.cos(2.0 * math.pi * u2)
    out_ref[:] = mu + jnp.exp(0.5 * lv) * eps


@jax.custom_vjp
def reparam(key: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    return _reparam_fwd(key, mean, logvar)[0]


def _reparam_fwd(key, mean, logvar):
    mean_b, logvar_b = jnp.broadcast_arrays(mean, logvar)
    if _INTERPRET:
        # pltpu.prng_seed has no CPU lowering (even interpreted); off-TPU the
        # forward falls back to threefry. The custom bwd below applies either
        # way, so gradient semantics are identical across backends.
        eps = jax.random.normal(key, mean_b.shape, jnp.float32)
        z = mean_b.astype(jnp.float32) + jnp.exp(
            0.5 * logvar_b.astype(jnp.float32)) * eps
        return z, (z, mean_b, logvar_b, mean.shape, logvar.shape)
    # Sampling is elementwise, so layout is free: flatten to a lane-aligned
    # [rows, 1024] view regardless of the logical shape (z_dim is rarely a
    # multiple of 128; a (B, z_dim) block would waste most of each lane).
    n = mean_b.size
    cols = 1024
    m2 = _pad_flat(mean_b, cols)
    l2 = _pad_flat(logvar_b, cols)
    b, e = m2.shape
    tile = _tile_rows(b, e, 2)
    rows = _round_up(b, tile)
    raw = (jax.random.key_data(key)
           if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
    seed = raw.astype(jnp.int32).reshape(-1)[:2]

    grid = rows // tile
    # index_map under PrefetchScalarGridSpec also receives the scalar ref
    spec = pl.BlockSpec((tile, e), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    z = pl.pallas_call(
        _reparam_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, e), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec, spec],
            out_specs=spec,
        ),
        interpret=_INTERPRET,
    )(seed, _pad_rows(m2, rows), _pad_rows(l2, rows))
    z = z.reshape(-1)[:n].reshape(mean_b.shape)
    return z, (z, mean_b, logvar_b, mean.shape, logvar.shape)


def _reparam_bwd(res, g):
    z, mean_b, logvar_b, mean_shape, logvar_shape = res
    # z = mu + sigma·eps  =>  dz/dmu = 1, dz/dlogvar = 0.5·sigma·eps
    #                                               = 0.5·(z - mu)
    g = g.astype(jnp.float32)
    dmean = _unbroadcast(g, mean_shape)
    dlogvar = _unbroadcast(g * 0.5 * (z - mean_b.astype(jnp.float32)),
                           logvar_shape)
    return None, dmean, dlogvar


def _unbroadcast(g, shape):
    extra = g.ndim - len(shape)
    if extra > 0:
        g = jnp.sum(g, axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape)) if s == 1
                 and gs != 1)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g


reparam.defvjp(_reparam_fwd, _reparam_bwd)
