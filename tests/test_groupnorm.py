"""Fused GroupNorm+GELU parity vs flax (value and gradients)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apv_tpu.ops.groupnorm import groupnorm_gelu, _reference


def _flax_gn_gelu(x, gamma, beta, groups):
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                      use_bias=True, use_scale=True)
    variables = {"params": {"scale": gamma, "bias": beta}}
    return nn.gelu(gn.apply(variables, x))


@pytest.mark.parametrize("shape,groups", [((4, 8, 8, 32), 8),
                                          ((2, 16, 16, 64), 8),
                                          ((3, 4, 4, 16), 4)])
def test_value_parity_vs_flax(rng, shape, groups):
    x = rng.normal(size=shape).astype(np.float32) * 2
    c = shape[-1]
    gamma = rng.normal(size=(c,)).astype(np.float32) * 0.5 + 1.0
    beta = rng.normal(size=(c,)).astype(np.float32) * 0.1
    got = np.asarray(groupnorm_gelu(x, gamma, beta, groups))
    want = np.asarray(_flax_gn_gelu(x, gamma, beta, groups))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grad_parity_vs_flax(rng):
    shape, groups = (4, 8, 8, 32), 8
    x = rng.normal(size=shape).astype(np.float32)
    gamma = (rng.normal(size=(32,)) * 0.3 + 1.0).astype(np.float32)
    beta = (rng.normal(size=(32,)) * 0.1).astype(np.float32)
    wsum = jnp.linspace(0.5, 1.5, int(np.prod(shape))).reshape(shape)

    def f_fused(x, g, b):
        return jnp.sum(groupnorm_gelu(x, g, b, groups) * wsum)

    def f_flax(x, g, b):
        return jnp.sum(_flax_gn_gelu(x, g, b, groups) * wsum)

    gk = jax.grad(f_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gj = jax.grad(f_flax, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, name in zip(gk, gj, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_bf16_inputs(rng):
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    gamma = np.ones(32, np.float32)
    beta = np.zeros(32, np.float32)
    y16 = groupnorm_gelu(jnp.asarray(x, jnp.bfloat16), gamma, beta, 8)
    y32 = groupnorm_gelu(x, gamma, beta, 8)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), atol=0.03)


def test_rejects_bad_groups(rng):
    x = rng.normal(size=(2, 4, 4, 30)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        groupnorm_gelu(x, np.ones(30, np.float32),
                       np.zeros(30, np.float32), 8)
