"""Distributions and likelihoods, pure jnp (SURVEY.md §2.2).

Capability parity: the reference's tfsnippet-tier ``Normal`` / ``Bernoulli`` /
``DiscretizedLogistic`` distributions (SURVEY.md §1 L2, §2.2). All functions
are elementwise over arbitrary batch shapes; reductions over event dims are
the caller's job (the fused kernels in ``apv_tpu.ops`` do reduce).

Numerics notes
--------------
* Everything is formulated in log space; computations happen in float32 even
  if inputs arrive in bfloat16 (likelihoods are accuracy-critical).
* The discretized logistic uses the exact log-space CDF-difference identity
      log(sigma(a) - sigma(b)) = b + log(expm1(a - b)) - softplus(a) - softplus(b)
  (a > b), which is stable for every interior bin without the usual
  "switch to a PDF approximation when the CDF difference underflows" hack.
  Edge bins (pixel value 0 / 255) integrate the full left/right tail.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------

def gaussian_sample(key: jax.Array, mean: jax.Array, logvar: jax.Array,
                    sample_shape: tuple[int, ...] = ()) -> jax.Array:
    """Reparameterized sample z = mean + exp(logvar/2) * eps, eps ~ N(0, I).

    ``sample_shape`` is prepended (IWAE draws k samples per datum).
    """
    shape = tuple(sample_shape) + jnp.broadcast_shapes(mean.shape, logvar.shape)
    eps = jax.random.normal(key, shape, dtype=jnp.float32)
    return mean + jnp.exp(0.5 * logvar.astype(jnp.float32)) * eps


def gaussian_logpdf(z: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Elementwise log N(z; mean, exp(logvar))."""
    z = z.astype(jnp.float32)
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * (_LOG_2PI + logvar + (z - mean) ** 2 * jnp.exp(-logvar))


def standard_gaussian_logpdf(z: jax.Array) -> jax.Array:
    """Elementwise log N(z; 0, I)."""
    z = z.astype(jnp.float32)
    return -0.5 * (_LOG_2PI + z * z)


def diag_gmm_logpdf(z: jax.Array, log_w: jax.Array, means: jax.Array,
                    variances: jax.Array) -> jax.Array:
    """log density of a diagonal-covariance Gaussian mixture over the last
    axis: ``z [..., Z]``, ``log_w [K]``, ``means/variances [K, Z]`` →
    ``[...]``. Exact (a logsumexp over K component log-densities) — the
    scorable counterpart of the ex-post GMM generation prior
    (sampling/run.fit_gmm_em): unlike the adversarially-shaped prior, no
    MC log-partition estimate is needed."""
    from jax.scipy.special import logsumexp

    z = z.astype(jnp.float32)[..., None, :]                  # [..., 1, Z]
    comp = -0.5 * jnp.sum((z - means) ** 2 / variances
                          + _LOG_2PI + jnp.log(variances), axis=-1)
    return logsumexp(log_w + comp, axis=-1)


def gaussian_kl_standard(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Elementwise analytic KL( N(mean, exp(logvar)) || N(0, 1) ).

    0.5 * (mu^2 + sigma^2 - 1 - log sigma^2); sum over event dims for the
    per-sample KL (SURVEY.md §2.2 "KL(q||p)").
    """
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return 0.5 * (mean * mean + jnp.exp(logvar) - 1.0 - logvar)


def gaussian_kl(mean_q: jax.Array, logvar_q: jax.Array,
                mean_p: jax.Array, logvar_p: jax.Array) -> jax.Array:
    """Elementwise analytic KL between two diagonal Gaussians."""
    mean_q, logvar_q, mean_p, logvar_p = (
        a.astype(jnp.float32) for a in (mean_q, logvar_q, mean_p, logvar_p))
    var_ratio = jnp.exp(logvar_q - logvar_p)
    t = (mean_q - mean_p) ** 2 * jnp.exp(-logvar_p)
    return 0.5 * (var_ratio + t - 1.0 - (logvar_q - logvar_p))


# ---------------------------------------------------------------------------
# Bernoulli (binarized MNIST pixel likelihood)
# ---------------------------------------------------------------------------

def bernoulli_logpmf(x: jax.Array, logits: jax.Array) -> jax.Array:
    """Elementwise log Bernoulli(x; sigma(logits)) for x in {0, 1}.

    x*log sigma(l) + (1-x)*log(1-sigma(l)) = x*l - softplus(l), stable for
    any logit magnitude (SURVEY.md §2.2 "Bernoulli reconstruction").
    """
    x = x.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    return x * logits - jax.nn.softplus(logits)


# ---------------------------------------------------------------------------
# Discretized logistic (CIFAR-10 pixel likelihood)
# ---------------------------------------------------------------------------

def discretized_logistic_logpmf(x: jax.Array, mean: jax.Array, log_scale: jax.Array,
                                *, bin_size: float = 1.0 / 255.0,
                                low: float = 0.0, high: float = 1.0) -> jax.Array:
    """Elementwise log P(pixel bin) under a discretized logistic.

    ``x`` holds bin centers in [low, high] on a grid of spacing ``bin_size``
    (CIFAR-10: 256 levels mapped to i/255, SURVEY.md §2.2 "Discretized-
    logistic reconstruction"). The probability mass of the bin is

        P = CDF(x + bin/2) - CDF(x - bin/2),  CDF(t) = sigma((t - mean)/s)

    with the lowest bin integrating the left tail (CDF(x + bin/2)) and the
    highest bin the right tail (1 - CDF(x - bin/2)).

    Interior bins use the exact identity
        log(sigma(a) - sigma(b)) = b + log(expm1(a - b)) - softplus(a) - softplus(b)
    where a - b = bin_size / s > 0, which stays finite in log space for
    arbitrarily small scales — no PDF-approximation branch needed.
    """
    x = x.astype(jnp.float32)
    mean = mean.astype(jnp.float32)
    log_scale = log_scale.astype(jnp.float32)

    inv_s = jnp.exp(-log_scale)
    half = 0.5 * bin_size
    a = (x - mean + half) * inv_s          # upper bin edge, standardized
    b = (x - mean - half) * inv_s          # lower bin edge, standardized
    # a - b computed directly (not a minus b) so it is exactly positive:
    t = bin_size * inv_s

    # log(sigma(a)): left tail mass, used for the lowest bin.
    log_cdf_low = -jax.nn.softplus(-a)
    # log(1 - sigma(b)): right tail mass, used for the highest bin.
    log_sf_high = -jax.nn.softplus(b)
    # Interior: exact log CDF-difference, with log(expm1(t)) evaluated
    # stably on both ends: t + log1p(-exp(-t)) for large t (expm1 would
    # overflow past ~88), log(t) + log1p(t/2) as t -> 0 (second-order).
    # Each branch clamps its own input so the *unselected* branch stays
    # finite too (the where-grad NaN pitfall).
    t_big = jnp.maximum(t, 1e-3)
    t_small = jnp.clip(t, 1e-20, 1e-3)
    log_expm1_t = jnp.where(
        t > 1e-3,
        t_big + jnp.log1p(-jnp.exp(-t_big)),
        jnp.log(t_small) + jnp.log1p(0.5 * t_small))
    log_interior = b + log_expm1_t - jax.nn.softplus(a) - jax.nn.softplus(b)

    is_low = x <= low + half
    is_high = x >= high - half
    return jnp.where(is_low, log_cdf_low,
                     jnp.where(is_high, log_sf_high, log_interior))


def discretized_logistic_sample(key: jax.Array, mean: jax.Array,
                                log_scale: jax.Array,
                                *, bin_size: float = 1.0 / 255.0,
                                low: float = 0.0, high: float = 1.0) -> jax.Array:
    """Sample a pixel: logistic noise + mean, quantized to the bin grid."""
    u = jax.random.uniform(key, jnp.broadcast_shapes(mean.shape, log_scale.shape),
                           minval=1e-5, maxval=1.0 - 1e-5)
    y = mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u))
    y = jnp.round(y / bin_size) * bin_size
    return jnp.clip(y, low, high)


# ---------------------------------------------------------------------------
# Mixture of discretized logistics (optional CIFAR-10 quality knob)
# ---------------------------------------------------------------------------
#
# The reference's likelihood is a SINGLE discretized logistic per pixel
# channel (SURVEY.md §2.2 [B]); the K-component mixture is the
# literature-standard upgrade (PixelCNN++ lineage) offered as a
# config-switchable extension (``model.likelihood=disc_logistic_mix``) —
# same 256-level grid, so bits/dim stay directly comparable. Components are
# independent per pixel channel (no PixelCNN++ channel coupling: this is a
# VAE decoder head, not an autoregressive model).

def discretized_logistic_mixture_logpmf(
        x: jax.Array, means: jax.Array, log_scales: jax.Array,
        mix_logits: jax.Array, *, bin_size: float = 1.0 / 255.0,
        low: float = 0.0, high: float = 1.0) -> jax.Array:
    """Elementwise log P(pixel bin) under a K-component mixture.

    ``x`` is [...]; ``means`` / ``log_scales`` / ``mix_logits`` are
    [..., K] (mixture axis last). Returns [...]:
        logsumexp_k[ log_softmax(mix_logits)_k + log P_k(bin) ]
    where each log P_k reuses the exact single-logistic identity above.
    """
    comp = discretized_logistic_logpmf(
        x[..., None], means, log_scales, bin_size=bin_size, low=low,
        high=high)
    log_w = jax.nn.log_softmax(mix_logits.astype(jnp.float32), axis=-1)
    return jax.scipy.special.logsumexp(log_w + comp, axis=-1)


def discretized_logistic_mixture_mean(means: jax.Array,
                                      mix_logits: jax.Array) -> jax.Array:
    """Mixture mean Σ_k softmax(mix_logits)_k · mean_k over the last axis."""
    w = jax.nn.softmax(mix_logits.astype(jnp.float32), axis=-1)
    return jnp.sum(w * means.astype(jnp.float32), axis=-1)


def discretized_logistic_mixture_sample(
        key: jax.Array, means: jax.Array, log_scales: jax.Array,
        mix_logits: jax.Array, *, bin_size: float = 1.0 / 255.0,
        low: float = 0.0, high: float = 1.0) -> jax.Array:
    """Sample: pick a component per element, then a logistic draw from it."""
    k_sel, k_pix = jax.random.split(key)
    idx = jax.random.categorical(k_sel, mix_logits.astype(jnp.float32),
                                 axis=-1)                       # [...]
    mean = jnp.take_along_axis(means, idx[..., None], axis=-1)[..., 0]
    log_scale = jnp.take_along_axis(log_scales, idx[..., None],
                                    axis=-1)[..., 0]
    return discretized_logistic_sample(k_pix, mean, log_scale,
                                       bin_size=bin_size, low=low, high=high)
