"""IWAE estimator tests (SURVEY.md §4 "Estimator tests")."""

import jax
import jax.numpy as jnp
import numpy as np

from apv_tpu.core import distributions as D
from apv_tpu.core.iwae import (iwae_log_likelihood, streaming_logsumexp,
                               streaming_logsumexp_init,
                               streaming_logsumexp_update,
                               streaming_logsumexp_finalize)


def test_streaming_logsumexp_matches_dense(rng):
    logw = rng.normal(size=(8, 25, 4)).astype(np.float32) * 5
    got = np.asarray(streaming_logsumexp(jnp.asarray(logw)))
    dense = jax.scipy.special.logsumexp(logw.reshape(200, 4), axis=0) - np.log(200)
    np.testing.assert_allclose(got, np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_streaming_chunking_invariance(rng):
    # k=1000 chunked three different ways gives the same answer
    logw = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    outs = []
    for chunk in (10, 100, 1000):
        outs.append(np.asarray(
            streaming_logsumexp(jnp.asarray(logw.reshape(1000 // chunk, chunk, 3)))))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)


def test_streaming_handles_inf_gap(rng):
    # One chunk vastly dominating must not produce nan
    logw = np.concatenate([np.full((500, 2), -1e30, np.float32),
                           np.zeros((500, 2), np.float32)])
    got = np.asarray(streaming_logsumexp(jnp.asarray(logw.reshape(10, 100, 2))))
    np.testing.assert_allclose(got, np.log(500 / 1000), rtol=1e-5)


def _make_gaussian_problem():
    """1-D conjugate problem with closed-form log p(x).

    p(z) = N(0,1), p(x|z) = N(z, sigma_x^2)  =>  p(x) = N(0, 1 + sigma_x^2).
    Proposal q(z|x) is a deliberately-off Gaussian so IWAE has real work.
    """
    sigma_x = 0.6

    def logw_fn_factory(x, q_mean, q_logvar, chunk):
        def logw_fn(key):
            z = D.gaussian_sample(key, q_mean, q_logvar, sample_shape=(chunk,))
            logp = (D.standard_gaussian_logpdf(z)
                    + D.gaussian_logpdf(x[None], z,
                                        jnp.full_like(z, 2 * np.log(sigma_x))))
            logq = D.gaussian_logpdf(z, q_mean, q_logvar)
            return logp - logq
        return logw_fn

    return sigma_x, logw_fn_factory


def test_iwae_converges_to_true_marginal():
    sigma_x, factory = _make_gaussian_problem()
    x = jnp.array([0.7, -1.2])
    q_mean = x * 0.5          # off-posterior proposal
    q_logvar = jnp.zeros_like(x)
    ll = iwae_log_likelihood(factory(x, q_mean, q_logvar, chunk=500),
                             jax.random.PRNGKey(0), k=20_000, chunk_size=500,
                             out_shape=(2,))
    import scipy.stats as sps
    want = sps.norm.logpdf(np.asarray(x), scale=np.sqrt(1 + sigma_x ** 2))
    np.testing.assert_allclose(np.asarray(ll), want, atol=0.02)


def test_iwae_k1_equals_single_sample_elbo():
    sigma_x, factory = _make_gaussian_problem()
    x = jnp.array([0.3])
    q_mean, q_logvar = x * 0.5, jnp.zeros_like(x)
    key = jax.random.PRNGKey(7)
    ll = iwae_log_likelihood(factory(x, q_mean, q_logvar, chunk=1),
                             key, k=1, chunk_size=1, out_shape=(1,))
    # With the same key sequence, k=1 IWAE is exactly one ELBO sample
    (chunk_key,) = jax.random.split(key, 1)
    elbo = factory(x, q_mean, q_logvar, chunk=1)(chunk_key)[0, 0]
    np.testing.assert_allclose(float(ll[0]), float(elbo), rtol=1e-6)


def test_iwae_monotone_in_k():
    # E[IWAE_k] is nondecreasing in k (IWAE paper thm 1); check with many seeds
    sigma_x, factory = _make_gaussian_problem()
    x = jnp.array([1.0])
    q_mean, q_logvar = x * 0.5, jnp.zeros_like(x) + 0.5
    means = {}
    seeds = jnp.arange(200)
    for k in (1, 10, 100):
        est = jax.jit(jax.vmap(lambda seed: iwae_log_likelihood(
            factory(x, q_mean, q_logvar, chunk=k), jax.random.PRNGKey(seed),
            k=k, chunk_size=k, out_shape=(1,))[0]))
        means[k] = float(jnp.mean(est(seeds)))
    m1, m10, m100 = (means[k] for k in (1, 10, 100))
    assert m1 <= m10 + 1e-3 and m10 <= m100 + 1e-3, (m1, m10, m100)


def test_iwae_rejects_bad_chunking():
    import pytest
    with pytest.raises(ValueError):
        iwae_log_likelihood(lambda k: jnp.zeros((3, 1)), jax.random.PRNGKey(0),
                            k=10, chunk_size=3, out_shape=(1,))


def test_bits_per_dim():
    from apv_tpu.core.metrics import nats_to_bits_per_dim
    # 3072-dim CIFAR image at NLL 3.5 bits/dim
    nll = 3.5 * 3072 * np.log(2)
    np.testing.assert_allclose(
        float(nats_to_bits_per_dim(nll, 3072)), 3.5, rtol=1e-6)
