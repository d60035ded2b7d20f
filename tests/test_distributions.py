"""Golden tests for the pure-jnp probabilistic core vs scipy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from apv_tpu.core import distributions as D


def test_gaussian_logpdf_matches_scipy(rng):
    z = rng.normal(size=(64,)).astype(np.float32) * 3
    mean = rng.normal(size=(64,)).astype(np.float32)
    logvar = rng.normal(size=(64,)).astype(np.float32)
    got = np.asarray(D.gaussian_logpdf(z, mean, logvar))
    want = sps.norm.logpdf(z, loc=mean, scale=np.exp(0.5 * logvar))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_standard_gaussian_logpdf(rng):
    z = rng.normal(size=(32,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(D.standard_gaussian_logpdf(z)), sps.norm.logpdf(z),
        rtol=1e-5, atol=1e-5)


def test_gaussian_kl_standard_analytic_vs_mc():
    mean = jnp.array([0.5, -1.0, 0.0])
    logvar = jnp.array([0.3, -0.7, 0.0])
    analytic = D.gaussian_kl_standard(mean, logvar)
    # KL(N(0,1)||N(0,1)) = 0 exactly
    np.testing.assert_allclose(float(analytic[2]), 0.0, atol=1e-7)
    # Monte-Carlo check
    key = jax.random.PRNGKey(0)
    z = D.gaussian_sample(key, mean, logvar, sample_shape=(200_000,))
    mc = jnp.mean(D.gaussian_logpdf(z, mean, logvar)
                  - D.standard_gaussian_logpdf(z), axis=0)
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(mc),
                               rtol=0.05, atol=0.01)


def test_gaussian_kl_general_reduces_to_standard(rng):
    mean = rng.normal(size=(16,)).astype(np.float32)
    logvar = rng.normal(size=(16,)).astype(np.float32)
    got = D.gaussian_kl(mean, logvar, np.zeros(16, np.float32),
                        np.zeros(16, np.float32))
    want = D.gaussian_kl_standard(mean, logvar)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_reparam_sample_statistics():
    key = jax.random.PRNGKey(42)
    mean = jnp.array([1.5, -2.0])
    logvar = jnp.array([0.5, -1.0])
    z = D.gaussian_sample(key, mean, logvar, sample_shape=(400_000,))
    np.testing.assert_allclose(np.asarray(jnp.mean(z, 0)), np.asarray(mean),
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(jnp.var(z, 0)),
                               np.exp(np.asarray(logvar)), rtol=0.02)


def test_reparam_gradient_flows():
    # d/d mean E[z] = 1, d/d logvar E[z^2] at mean=0 is sigma^2
    def f(mean, logvar):
        z = D.gaussian_sample(jax.random.PRNGKey(1), mean, logvar,
                              sample_shape=(100_000,))
        return jnp.mean(z)
    g = jax.grad(f)(jnp.array(0.3), jnp.array(-0.2))
    np.testing.assert_allclose(float(g), 1.0, atol=1e-4)


def test_bernoulli_logpmf_matches_scipy(rng):
    logits = rng.normal(size=(64,)).astype(np.float32) * 8
    x = (rng.random(64) < 0.5).astype(np.float32)
    got = np.asarray(D.bernoulli_logpmf(x, logits))
    p = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    want = sps.bernoulli.logpmf(x.astype(int), p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bernoulli_extreme_logits_finite():
    logits = jnp.array([-500.0, 500.0, 0.0])
    x = jnp.array([0.0, 1.0, 1.0])
    out = D.bernoulli_logpmf(x, logits)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(float(out[2]), np.log(0.5), rtol=1e-5)


# ---------------------------------------------------------------------------
# Discretized logistic — the numerically hard one (SURVEY.md §7 "Hard parts")
# ---------------------------------------------------------------------------

def _scipy_disc_logistic(x, mean, log_scale, bin_size=1 / 255., low=0., high=1.):
    """Direct CDF-difference in float64 as the golden reference."""
    s = np.exp(log_scale.astype(np.float64))
    mean = mean.astype(np.float64)
    half = bin_size / 2
    cdf_plus = sps.logistic.cdf(x + half, loc=mean, scale=s)
    cdf_minus = sps.logistic.cdf(x - half, loc=mean, scale=s)
    # For x above the mean the CDFs both saturate at 1.0 in f64; the survival
    # function keeps precision there: cdf_plus - cdf_minus = sf_minus - sf_plus.
    sf_diff = (sps.logistic.sf(x - half, loc=mean, scale=s)
               - sps.logistic.sf(x + half, loc=mean, scale=s))
    interior = np.where(x > mean, sf_diff, cdf_plus - cdf_minus)
    p = np.where(x <= low + half, cdf_plus,
                 np.where(x >= high - half,
                          sps.logistic.sf(x - half, loc=mean, scale=s),
                          interior))
    return np.log(p)


def test_disc_logistic_matches_scipy_interior(rng):
    levels = rng.integers(1, 255, size=256)
    x = (levels / 255.0).astype(np.float32)
    mean = rng.uniform(0, 1, size=256).astype(np.float32)
    log_scale = rng.uniform(-5, 0, size=256).astype(np.float32)
    got = np.asarray(D.discretized_logistic_logpmf(x, mean, log_scale))
    want = _scipy_disc_logistic(x, mean, log_scale)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_disc_logistic_edge_bins(rng):
    # pixel values 0 and 255 must integrate the tails
    x = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    mean = np.array([0.1, 0.9, 0.9, 0.1], np.float32)
    log_scale = np.array([-2.0, -2.0, -3.0, -3.0], np.float32)
    got = np.asarray(D.discretized_logistic_logpmf(x, mean, log_scale))
    want = _scipy_disc_logistic(x, mean, log_scale)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_disc_logistic_tiny_scale_far_tail_finite():
    # The classic underflow case: tiny scale, x far from the mean.
    x = jnp.array([100 / 255.0, 5 / 255.0, 250 / 255.0])
    mean = jnp.array([0.9, 0.1, 0.2])
    log_scale = jnp.array([-10.0, -12.0, -14.0])
    out = np.asarray(D.discretized_logistic_logpmf(x, mean, log_scale))
    assert np.all(np.isfinite(out))
    # f64 log-space golden via scipy's stable logcdf: for interior bins
    # log(cdf_plus - cdf_minus) = logcdf_plus + log1p(-exp(logcdf_minus -
    # logcdf_plus)) — an independent formulation from the expm1 identity.
    s = np.exp(np.asarray(log_scale, np.float64))
    xa, ma = np.asarray(x, np.float64), np.asarray(mean, np.float64)
    half = 1 / 510.0
    lc_p = sps.logistic.logcdf(xa + half, loc=ma, scale=s)
    lc_m = sps.logistic.logcdf(xa - half, loc=ma, scale=s)
    lsf_p = sps.logistic.logsf(xa + half, loc=ma, scale=s)
    lsf_m = sps.logistic.logsf(xa - half, loc=ma, scale=s)
    # Below the mean work with CDFs, above with SFs — whichever side keeps
    # the log magnitudes representable.
    want = np.where(xa <= ma,
                    lc_p + np.log1p(-np.exp(lc_m - lc_p)),
                    lsf_m + np.log1p(-np.exp(lsf_p - lsf_m)))
    np.testing.assert_allclose(out, want, rtol=1e-3)


def test_disc_logistic_sums_to_one():
    # Sum of pmf over all 256 bins must be ~1 for several (mean, scale).
    levels = np.arange(256, dtype=np.float32) / 255.0
    for mu, ls in [(0.5, -2.0), (0.0, -4.0), (1.0, -1.0), (0.3, -6.0)]:
        lp = np.asarray(D.discretized_logistic_logpmf(
            levels, np.full(256, mu, np.float32), np.full(256, ls, np.float32)))
        total = np.exp(lp).sum()
        np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_disc_logistic_grads_finite():
    def loss(mean, log_scale):
        x = jnp.arange(256, dtype=jnp.float32) / 255.0
        return -jnp.sum(D.discretized_logistic_logpmf(
            x, jnp.broadcast_to(mean, x.shape),
            jnp.broadcast_to(log_scale, x.shape)))
    for ls in (-1.0, -7.0, -12.0):
        g = jax.grad(loss, argnums=(0, 1))(jnp.array(0.4), jnp.array(ls))
        assert all(np.isfinite(float(gi)) for gi in g), f"nan grad at ls={ls}"


def test_disc_logistic_sample_in_range():
    key = jax.random.PRNGKey(0)
    s = D.discretized_logistic_sample(
        key, jnp.full((1000,), 0.5), jnp.full((1000,), -2.0))
    arr = np.asarray(s)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # quantized to the 1/255 grid
    np.testing.assert_allclose(arr * 255, np.round(arr * 255), atol=1e-4)


# ---------------------------------------------------------------------------
# Mixture of discretized logistics (model.likelihood=disc_logistic_mix)
# ---------------------------------------------------------------------------

def test_disc_logistic_mix_matches_numpy_golden(rng):
    """Mixture logpmf vs an explicit f64 logsumexp over the scipy-golden
    per-component pmfs."""
    n, k = 128, 4
    levels = rng.integers(0, 256, size=n)
    x = (levels / 255.0).astype(np.float32)
    means = rng.uniform(-0.2, 1.2, size=(n, k)).astype(np.float32)
    log_scales = rng.uniform(-6, 0, size=(n, k)).astype(np.float32)
    logits = rng.normal(size=(n, k)).astype(np.float32)
    got = np.asarray(D.discretized_logistic_mixture_logpmf(
        x, means, log_scales, logits))
    comp = np.stack([_scipy_disc_logistic(x, means[:, j], log_scales[:, j])
                     for j in range(k)], axis=-1)
    from scipy.special import logsumexp
    lw = logits.astype(np.float64)
    lw = lw - logsumexp(lw, axis=-1, keepdims=True)
    want = logsumexp(lw + comp, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_disc_logistic_mix_k1_reduces_to_single(rng):
    """K=1 with any logit is exactly the single discretized logistic."""
    x = (rng.integers(0, 256, size=64) / 255.0).astype(np.float32)
    mean = rng.uniform(0, 1, size=64).astype(np.float32)
    log_scale = rng.uniform(-6, 0, size=64).astype(np.float32)
    got = np.asarray(D.discretized_logistic_mixture_logpmf(
        x, mean[:, None], log_scale[:, None],
        np.full((64, 1), 3.7, np.float32)))
    want = np.asarray(D.discretized_logistic_logpmf(x, mean, log_scale))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_disc_logistic_mix_sums_to_one():
    levels = np.arange(256, dtype=np.float32) / 255.0
    k = 3
    means = np.broadcast_to(
        np.array([0.2, 0.5, 0.9], np.float32), (256, k))
    log_scales = np.broadcast_to(
        np.array([-2.0, -5.0, -3.0], np.float32), (256, k))
    logits = np.broadcast_to(
        np.array([0.5, -1.0, 1.5], np.float32), (256, k))
    lp = np.asarray(D.discretized_logistic_mixture_logpmf(
        levels, means, log_scales, logits))
    np.testing.assert_allclose(np.exp(lp).sum(), 1.0, rtol=1e-4)


def test_disc_logistic_mix_grads_finite():
    x = jnp.arange(256, dtype=jnp.float32) / 255.0

    def loss(means, log_scales, logits):
        return -jnp.sum(D.discretized_logistic_mixture_logpmf(
            x, jnp.broadcast_to(means, (256, 3)),
            jnp.broadcast_to(log_scales, (256, 3)),
            jnp.broadcast_to(logits, (256, 3))))

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array([0.1, 0.5, 0.9]), jnp.array([-1.0, -7.0, -12.0]),
        jnp.array([0.0, 2.0, -2.0]))
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))


def test_disc_logistic_mix_sample_and_mean():
    key = jax.random.PRNGKey(0)
    n, k = 4000, 2
    # two well-separated sharp components with known weights
    means = jnp.broadcast_to(jnp.array([0.2, 0.8]), (n, k))
    log_scales = jnp.full((n, k), -6.0)
    logits = jnp.broadcast_to(jnp.array([0.0, jnp.log(3.0)]), (n, k))
    s = np.asarray(D.discretized_logistic_mixture_sample(
        key, means, log_scales, logits))
    assert s.min() >= 0.0 and s.max() <= 1.0
    np.testing.assert_allclose(s * 255, np.round(s * 255), atol=1e-4)
    # weights are softmax([0, log3]) = (0.25, 0.75): fraction near 0.8
    frac_hi = float((s > 0.5).mean())
    assert 0.70 < frac_hi < 0.80, frac_hi
    # mixture mean = 0.25*0.2 + 0.75*0.8 = 0.65
    m = np.asarray(D.discretized_logistic_mixture_mean(means, logits))
    np.testing.assert_allclose(m, 0.65, rtol=1e-5)
