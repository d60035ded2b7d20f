"""Fused GroupNorm+GELU — experimental, NOT wired into the models.

Measured negative result (v5e, [256,32,32,64], fwd+bwd): this kernel runs
2.60 ms vs 1.06 ms for flax GN + gelu under plain XLA. GN+GELU chains cost
~27% of a ResBlock (0.51 ms of 1.88 ms), but XLA already fuses most of
that into the surrounding convs, and at C=64 the channel lane dim fills
only half of each 128-lane vector — the hand-written kernel cannot beat
the compiler here. Kept as tested groundwork: it solves two real Mosaic
problems a future fused-resblock kernel will need —
  * group statistics without reshaping the lane dim (one-hot membership
    matmuls on the MXU), and
  * staying inside the 16 MB scoped-vmem budget (two-pass HW-chunked
    streaming + an explicit vmem_limit_bytes raise).

Semantics match ``flax.linen.GroupNorm(num_groups)(x)`` followed by
``nn.gelu`` with float32 statistics, for NHWC inputs with C % groups == 0.
Parity (value + grad) vs the flax reference: tests/test_groupnorm.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = jax.default_backend() != "tpu"
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _gelu(x):
    # tanh approximation — matches jax.nn.gelu(approximate=True), flax default
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x ** 3)))


def _hw_chunk(hw: int, target: int = 256) -> int:
    """Largest divisor of hw that is <= target (static)."""
    best = 1
    for d in range(1, hw + 1):
        if hw % d == 0 and d <= target:
            best = d
    return best


def _gn_gelu_kernel(groups: int, eps: float, chunk: int,
                    x_ref, gamma_ref, beta_ref, out_ref, mean_ref, rstd_ref):
    """Two-pass chunked GN+GELU.

    Group stats via one-hot membership matmuls — Mosaic cannot reshape the
    lane (channel) dim into (G, C/G), but a [C,G] matmul aggregates groups
    without any reshape. Both passes stream HW in ``chunk``-sized slices so
    VMEM stack temporaries stay small (the whole-block formulation
    overflowed the 16 MB scoped vmem by exactly its f32 temps).
    """
    tb, hw, c = x_ref.shape
    cg = c // groups
    n_per_group = hw * cg
    n_chunks = hw // chunk

    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch_ids // cg == g_ids).astype(jnp.float32)      # [C, G]

    def pass1(i, carry):
        s, sq = carry
        xs = x_ref[:, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s + jnp.sum(xs, axis=1), sq + jnp.sum(xs * xs, axis=1)

    zero = jnp.zeros((tb, c), jnp.float32)
    sum_c, sumsq_c = jax.lax.fori_loop(0, n_chunks, pass1, (zero, zero))
    sum_g = jnp.dot(sum_c, member, preferred_element_type=jnp.float32)
    sumsq_g = jnp.dot(sumsq_c, member, preferred_element_type=jnp.float32)
    mean_g = sum_g / n_per_group                              # [TB, G]
    var_g = sumsq_g / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # broadcast back to channels: [TB, G] @ [G, C]
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, member.T, preferred_element_type=jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)

    def pass2(i, _):
        xs = x_ref[:, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        xhat = (xs - mean_c[:, None, :]) * rstd_c[:, None, :]
        out_ref[:, pl.ds(i * chunk, chunk), :] = _gelu(
            xhat * gamma + beta).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, pass2, 0)
    mean_ref[:] = mean_g
    rstd_ref[:] = rstd_g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def groupnorm_gelu(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                   groups: int = 8, eps: float = 1e-6) -> jax.Array:
    """y = GELU(GroupNorm(x)·gamma + beta) for NHWC x, fused on TPU."""
    return _fwd(x, gamma, beta, groups, eps)[0]


def _reference(x, gamma, beta, groups, eps):
    """Pure-jnp oracle (CPU fallback + parity target)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h * w, c)
    y = _gelu(xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    return y.reshape(b, h, w, c).astype(x.dtype)


def _fwd(x, gamma, beta, groups, eps):
    b, h, w, c = x.shape
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    if _INTERPRET:
        # interpreter-mode reshapes of (sublane, lane) tiles are fine, but
        # the jnp oracle is cheaper and identical — use it off-TPU.
        y = _reference(x, gamma, beta, groups, eps)
        xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
        mean = jnp.mean(xf, axis=(1, 3))
        var = jnp.mean((xf - mean[:, None, :, None]) ** 2, axis=(1, 3))
        rstd = jax.lax.rsqrt(var + eps)
        return y, (x, gamma, beta, mean, rstd)

    # 8 batch rows per program (Mosaic wants the stats block's sublane dim
    # divisible by 8); VMEM block = 8·HW·C, <= 2 MB f32 at flagship shapes.
    tb = 8
    b_pad = ((b + tb - 1) // tb) * tb
    x3 = x.reshape(b, h * w, c)
    if b_pad != b:
        x3 = jnp.pad(x3, ((0, b_pad - b), (0, 0), (0, 0)))
    y, mean, rstd = pl.pallas_call(
        functools.partial(_gn_gelu_kernel, groups, eps, _hw_chunk(h * w)),
        # f32 inputs land at 16.02 MB scoped vmem vs the 16.00 MB default
        # cap; v5e VMEM can cover slightly more for this double-buffered
        # block layout
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=(jax.ShapeDtypeStruct((b_pad, h * w, c), x.dtype),
                   jax.ShapeDtypeStruct((b_pad, groups), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, groups), jnp.float32)),
        grid=(b_pad // tb,),
        in_specs=[pl.BlockSpec((tb, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((tb, h * w, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, groups), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, groups), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=_INTERPRET,
    )(x3, gamma, beta)
    return (y[:b].reshape(b, h, w, c),
            (x, gamma, beta, mean[:b], rstd[:b]))


def _bwd(groups, eps, res, dy):
    """Hand-derived GN+GELU backward (jnp; XLA fuses it).

    With xhat the normalized input, y_pre = gamma·xhat + beta, y = gelu(y_pre):
      dy_pre  = dy · gelu'(y_pre)
      dgamma  = Σ_{b,hw} dy_pre · xhat ;  dbeta = Σ dy_pre
      dxhat   = dy_pre · gamma
      dx      = rstd · (dxhat − mean_g(dxhat) − xhat · mean_g(dxhat·xhat))
    where mean_g averages over each group's HW·C/G elements.
    """
    x, gamma, beta, mean, rstd = res
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    xhat = (xf - mean[:, None, :, None]) * rstd[:, None, :, None]
    xhat2 = xhat.reshape(b, h * w, c)
    y_pre = xhat2 * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    # gelu'(t) for the tanh approximation
    t = _SQRT_2_OVER_PI * (y_pre + 0.044715 * y_pre ** 3)
    th = jnp.tanh(t)
    dgelu = 0.5 * (1.0 + th) + 0.5 * y_pre * (1.0 - th ** 2) \
        * _SQRT_2_OVER_PI * (1.0 + 3 * 0.044715 * y_pre ** 2)

    dyf = dy.astype(jnp.float32).reshape(b, h * w, c)
    dy_pre = dyf * dgelu
    dgamma = jnp.sum(dy_pre * xhat2, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(dy_pre, axis=(0, 1)).astype(beta.dtype)

    dxhat = (dy_pre * gamma.astype(jnp.float32)).reshape(b, h * w, groups, cg)
    m1 = jnp.mean(dxhat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(1, 3), keepdims=True)
    dx = rstd[:, None, :, None] * (dxhat - m1 - xhat * m2)
    return (dx.reshape(b, h, w, c).astype(x.dtype), dgamma, dbeta)


groupnorm_gelu.defvjp(_fwd, _bwd)
