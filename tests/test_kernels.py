"""Pallas-vs-jnp parity tests (SURVEY.md §4 "Pallas-vs-XLA parity").

On CPU the kernels run in pallas interpreter mode — same kernel code path,
so these tests validate kernel logic; the TPU-compiled path is exercised by
bench/production runs on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apv_tpu.core import distributions as D
from apv_tpu.ops import dispatch
from apv_tpu.ops import kernels as K


@pytest.mark.parametrize("shape", [(16, 40), (32, 7, 7, 3), (8, 3072)])
def test_kl_parity(rng, shape):
    mean = rng.normal(size=shape).astype(np.float32)
    logvar = rng.normal(size=shape).astype(np.float32)
    got = np.asarray(K.kl(mean, logvar))
    want = np.asarray(dispatch._kl_jnp(mean, logvar))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_kl_grad_parity(rng):
    mean = rng.normal(size=(8, 16)).astype(np.float32)
    logvar = rng.normal(size=(8, 16)).astype(np.float32)
    f_k = lambda m, lv: jnp.sum(K.kl(m, lv) * jnp.arange(1.0, 9.0))
    f_j = lambda m, lv: jnp.sum(dispatch._kl_jnp(m, lv) * jnp.arange(1.0, 9.0))
    gk = jax.grad(f_k, argnums=(0, 1))(mean, logvar)
    gj = jax.grad(f_j, argnums=(0, 1))(mean, logvar)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


@pytest.mark.parametrize("shape", [(16, 784), (12, 28, 28, 1)])
def test_bernoulli_parity(rng, shape):
    logits = (rng.normal(size=shape) * 5).astype(np.float32)
    x = (rng.random(shape) < 0.5).astype(np.float32)
    got = np.asarray(K.bernoulli(x, logits))
    want = np.asarray(dispatch._bernoulli_jnp(x, logits))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_bernoulli_grad_parity(rng):
    logits = (rng.normal(size=(8, 64)) * 3).astype(np.float32)
    x = (rng.random((8, 64)) < 0.5).astype(np.float32)
    w = jnp.linspace(0.5, 2.0, 8)
    gk = jax.grad(lambda l: jnp.sum(K.bernoulli(x, l) * w))(logits)
    gj = jax.grad(lambda l: jnp.sum(dispatch._bernoulli_jnp(x, l) * w))(logits)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gj), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 3072), (6, 32, 32, 3)])
def test_disc_logistic_parity(rng, shape):
    x = (rng.integers(0, 256, size=shape) / 255.0).astype(np.float32)
    mean = rng.uniform(-0.2, 1.2, size=shape).astype(np.float32)
    ls = rng.uniform(-7, 0, size=shape).astype(np.float32)
    got = np.asarray(K.disc_logistic(x, mean, ls, 1 / 255.0))
    want = np.asarray(dispatch._disc_logistic_jnp(x, mean, ls, 1 / 255.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_disc_logistic_grad_parity(rng):
    """Hand-derived backward vs jnp autodiff of the oracle, incl. edges."""
    shape = (8, 128)
    x = (rng.integers(0, 256, size=shape) / 255.0).astype(np.float32)
    x[0, :4] = 0.0   # force edge bins
    x[1, :4] = 1.0
    mean = rng.uniform(-0.2, 1.2, size=shape).astype(np.float32)
    ls = rng.uniform(-7, -0.5, size=shape).astype(np.float32)
    w = jnp.linspace(0.5, 2.0, 8)

    gk = jax.grad(lambda m, s: jnp.sum(K.disc_logistic(x, m, s, 1 / 255.) * w),
                  argnums=(0, 1))(mean, ls)
    gj = jax.grad(
        lambda m, s: jnp.sum(dispatch._disc_logistic_jnp(x, m, s, 1 / 255.) * w),
        argnums=(0, 1))(mean, ls)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_disc_logistic_grad_extreme_scales():
    x = jnp.full((8, 16), 100 / 255.0)
    mean = jnp.full((8, 16), 0.9)
    for ls_val in (-10.0, -14.0):
        ls = jnp.full((8, 16), ls_val)
        g = jax.grad(lambda m, s: jnp.sum(K.disc_logistic(x, m, s, 1 / 255.)),
                     argnums=(0, 1))(mean, ls)
        assert all(np.all(np.isfinite(np.asarray(gi))) for gi in g)


# -- reparam ----------------------------------------------------------------

def test_reparam_moments():
    mean = jnp.broadcast_to(jnp.array([1.5, -2.0]), (100_000, 2))
    logvar = jnp.broadcast_to(jnp.array([0.5, -1.0]), (100_000, 2))
    z = K.reparam(jax.random.PRNGKey(3), mean, logvar)
    assert z.shape == (100_000, 2)
    np.testing.assert_allclose(np.asarray(z.mean(0)), [1.5, -2.0], atol=0.02)
    np.testing.assert_allclose(np.asarray(z.var(0)),
                               np.exp([0.5, -1.0]), rtol=0.03)
    # normality: fraction within 1 sigma ~ 0.6827
    fr = float(((jnp.abs(z[:, 0] - 1.5) < np.exp(0.25))).mean())
    np.testing.assert_allclose(fr, 0.6827, atol=0.01)


def test_reparam_deterministic_in_key():
    mean = jnp.zeros((64, 8))
    logvar = jnp.zeros((64, 8))
    z1 = K.reparam(jax.random.PRNGKey(7), mean, logvar)
    z2 = K.reparam(jax.random.PRNGKey(7), mean, logvar)
    z3 = K.reparam(jax.random.PRNGKey(8), mean, logvar)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.array_equal(np.asarray(z1), np.asarray(z3))


def test_reparam_gradients():
    mean = jnp.array([[0.3, -0.7]] * 4)
    logvar = jnp.array([[0.1, -0.5]] * 4)
    key = jax.random.PRNGKey(0)
    z = K.reparam(key, mean, logvar)
    # sum(z): dmean = 1, dlogvar = 0.5*(z - mean)
    g = jax.grad(lambda m, lv: jnp.sum(K.reparam(key, m, lv)),
                 argnums=(0, 1))(mean, logvar)
    np.testing.assert_allclose(np.asarray(g[0]), np.ones_like(mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g[1]),
                               np.asarray(0.5 * (z - mean)), rtol=1e-5,
                               atol=1e-6)


def test_dispatch_backend_switch(rng):
    mean = rng.normal(size=(8, 16)).astype(np.float32)
    logvar = rng.normal(size=(8, 16)).astype(np.float32)
    try:
        dispatch.set_backend("pallas")
        a = np.asarray(dispatch.kl_standard(mean, logvar))
    finally:
        dispatch.set_backend("jnp")
    b = np.asarray(dispatch.kl_standard(mean, logvar))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    with pytest.raises(ValueError):
        dispatch.set_backend("cuda")


def test_odd_batch_sizes(rng):
    """Padding path: batch sizes not multiples of the tile."""
    for b in (1, 3, 7, 13):
        mean = rng.normal(size=(b, 40)).astype(np.float32)
        logvar = rng.normal(size=(b, 40)).astype(np.float32)
        got = np.asarray(K.kl(mean, logvar))
        want = np.asarray(dispatch._kl_jnp(mean, logvar))
        assert got.shape == (b,)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
