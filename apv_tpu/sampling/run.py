"""``sample`` entry: batched XLA decode + image grids (SURVEY.md §2.5, §3.4).

Prior sampling under the adversarial prior uses SIR (sampling-importance-
resampling): draw a pool from N(0,I), weight by e^{D(z)} (the density-ratio
correction), resample — giving approximate draws from p*(z) ∝ p0(z)·e^{D(z)}
without MCMC, as one jitted pass.

SIR is exact only as pool_factor → ∞: when the trained D's log-ratio is
sharp (the converged flagship's D saturates — RESULTS.md 400k row), the
importance weights concentrate on a few pool members, the effective sample
size collapses, and the "n draws" are near-duplicates of those few. For
that regime ``refine_steps > 0`` runs MALA (Metropolis-adjusted Langevin)
chains on log p*(z) = −‖z‖²/2 + D(z) from the SIR draws — a `lax.scan` of
fully batched gradient steps, so the whole refine stays one XLA program on
the MXU/VPU. Step size self-tunes toward the MALA-optimal acceptance rate
with a Robbins–Monro schedule (diminishing adaptation, so the chain's
stationary distribution is preserved asymptotically).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from apv_tpu.training.losses import decoder_output_to_likelihood_params


def shaped_prior_logp(z: jax.Array, d_apply, d_params,
                      base_logp=None) -> jax.Array:
    """log p*(z) up to the (unknown) log-partition constant:
    log p_base(z) + D(z), per sample. The base is N(0,I) by default;
    ``base_logp`` swaps in a trainable base's exact log-density
    (model.prior='gaussian'). The constant cancels in both the MALA
    accept ratio and the SIR weights, so it is omitted."""
    lp0 = (-0.5 * jnp.sum(z * z, axis=-1) if base_logp is None
           else base_logp(z))
    return lp0 + d_apply(d_params, z)


def sir_ess(logw: jax.Array) -> jax.Array:
    """Kish effective sample size of a set of log importance weights:
    (Σw)²/Σw² — equals len(logw) for uniform weights, 1 when one weight
    dominates. The SIR degeneracy diagnostic."""
    from jax.scipy.special import logsumexp
    return jnp.exp(2.0 * logsumexp(logw) - logsumexp(2.0 * logw))


def langevin_refine(key: jax.Array, z0: jax.Array, logp_fn, steps: int, *,
                    init_step: float = 0.1,
                    target_accept: float = 0.574):
    """Batched MALA on an unnormalized log-density.

    All n chains advance in lockstep inside one `lax.scan` — each step is
    two batched logp+grad evaluations plus elementwise work, so the
    refine compiles to a single XLA while-free program. The step size
    adapts toward ``target_accept`` (0.574 is MALA's optimal acceptance)
    with a 1/t Robbins–Monro gain.

    Returns (z, mean_accept_rate, final_step_size).
    """
    if steps < 1:
        raise ValueError(f"langevin_refine needs steps >= 1, got {steps} "
                         "(a 0-step scan would report a NaN acceptance "
                         "rate; skip the call instead)")

    def logp_and_grad(z):
        lp, vjp = jax.vjp(logp_fn, z)
        (g,) = vjp(jnp.ones_like(lp))
        return lp, g

    def body(carry, i):
        z, lp, g, log_eps, key = carry
        key, k_prop, k_acc = jax.random.split(key, 3)
        eps = jnp.exp(log_eps)
        noise = jax.random.normal(k_prop, z.shape, z.dtype)
        z_prop = z + eps * g + jnp.sqrt(2.0 * eps) * noise
        lp_p, g_p = logp_and_grad(z_prop)
        # Proposal densities q(z'|z), q(z|z') for the Metropolis correction
        fwd = -jnp.sum((z_prop - z - eps * g) ** 2, -1) / (4.0 * eps)
        rev = -jnp.sum((z - z_prop - eps * g_p) ** 2, -1) / (4.0 * eps)
        log_alpha = lp_p - lp + rev - fwd
        u = jnp.log(jax.random.uniform(k_acc, (z.shape[0],), z.dtype))
        accept = u < log_alpha
        z = jnp.where(accept[:, None], z_prop, z)
        lp = jnp.where(accept, lp_p, lp)
        g = jnp.where(accept[:, None], g_p, g)
        rate = jnp.mean(accept.astype(jnp.float32))
        log_eps = log_eps + (rate - target_accept) / (i + 10.0)
        return (z, lp, g, log_eps, key), rate

    lp0, g0 = logp_and_grad(z0)
    carry = (z0, lp0, g0, jnp.log(jnp.asarray(init_step, z0.dtype)), key)
    (z, _, _, log_eps, _), rates = jax.lax.scan(
        body, carry, jnp.arange(1.0, steps + 1.0, dtype=jnp.float32))
    return z, rates.mean(), jnp.exp(log_eps)


def sample_prior(key: jax.Array, n: int, z_dim: int, *, d_apply=None,
                 d_params=None, pool_factor: int = 16,
                 refine_steps: int = 0, init_step: float = 0.1,
                 return_diagnostics: bool = False,
                 base_from=None, base_logp=None):
    """n draws from the prior; with d_apply, SIR from the shaped prior,
    optionally MALA-refined (``refine_steps`` — see module docstring).

    ``base_from``/``base_logp`` swap the shaped prior's base from N(0,I)
    to a trainable base (model.prior='gaussian'): the SIR pool is drawn
    through ``base_from`` (u ~ N(0,I) → z) and the SIR weights stay
    e^{D(z)} (importance weight of p_base·e^D w.r.t. p_base); MALA
    targets base_logp + D. Pass both together.

    With ``return_diagnostics`` also returns a dict of scalar health
    metrics: the SIR pool's effective sample size and, when refining, the
    MALA acceptance rate and adapted step size.
    """
    if (base_from is None) != (base_logp is None):
        raise ValueError("base_from and base_logp come as a pair (the SIR "
                         "pool and the MALA target must use the same base)")
    if d_apply is None:
        if refine_steps > 0:
            # Loud, not silent: MALA refines the SHAPED prior; under the
            # plain N(0,I) prior the draw is already exact, and quietly
            # skipping the refinement would let an A/B protocol record
            # refined-vs-unrefined metrics that are the same protocol
            # (round-3 review finding).
            raise ValueError("refine_steps applies to the adversarially-"
                             "shaped prior; this model has no latent "
                             "discriminator — drop --refine")
        z = jax.random.normal(key, (n, z_dim), jnp.float32)
        if base_from is not None:
            z = base_from(z)        # the model's own (unshaped) base draw
        return (z, {}) if return_diagnostics else z
    k_pool, k_sel, k_mala = jax.random.split(key, 3)
    pool = jax.random.normal(k_pool, (n * pool_factor, z_dim), jnp.float32)
    if base_from is not None:
        pool = base_from(pool)
    logw = d_apply(d_params, pool)
    idx = jax.random.categorical(k_sel, logw, shape=(n,))
    z = pool[idx]
    diag = {"sir_ess": sir_ess(logw), "sir_pool": n * pool_factor}
    if refine_steps > 0:
        z, rate, eps = langevin_refine(
            k_mala, z, lambda zz: shaped_prior_logp(zz, d_apply, d_params,
                                                    base_logp),
            refine_steps, init_step=init_step)
        diag.update(mala_accept_rate=rate, mala_step_size=eps,
                    mala_steps=refine_steps)
    return (z, diag) if return_diagnostics else z


def decoder_pixels(out: jax.Array, key: jax.Array, likelihood: str,
                   image_channels: int, mode: str = "mean") -> jax.Array:
    """Decoder output → images in [0,1] ('mean' of the pixel likelihood,
    or 'sample' to draw from it)."""
    lik = decoder_output_to_likelihood_params(out, likelihood,
                                              image_channels)
    if likelihood == "bernoulli":
        probs = jax.nn.sigmoid(lik[0])
        if mode == "mean":
            return probs
        return jax.random.bernoulli(key, probs).astype(jnp.float32)
    if likelihood == "disc_logistic_mix":
        from apv_tpu.core.distributions import (
            discretized_logistic_mixture_mean,
            discretized_logistic_mixture_sample)
        means, log_scales, logits = lik
        if mode == "mean":
            return jnp.clip(
                discretized_logistic_mixture_mean(means, logits), 0.0, 1.0)
        return discretized_logistic_mixture_sample(key, means, log_scales,
                                                   logits)
    mean, log_scale = lik
    if mode == "mean":
        return jnp.clip(mean, 0.0, 1.0)
    from apv_tpu.core.distributions import discretized_logistic_sample
    return discretized_logistic_sample(key, mean, log_scale)


def expost_prior_moments(model, params, x_in: jax.Array):
    """Aggregate-posterior moments for the ex-post generation prior.

    Fits a diagonal Gaussian to q(z) = E_x[q(z|x)] by the law of total
    variance: mean = E_x[μ(x)], var = Var_x(μ(x)) + E_x[σ²(x)]. Standard
    ex-post density estimation (RAE lineage, arXiv 1903.12436 §4): when
    the trained prior under-disperses relative to q(z) — directly
    visible in `--visualize latent`, and measured on the converged
    flagship (RESULTS.md 800k MALA A/B) — decoding from a fit to q(z)
    is the established remedy. Returns ([Z], [Z]) device arrays.
    """
    @jax.jit
    def _moments(params, x):
        mean, logvar = model.apply({"params": params}, x, method="encode")
        agg_mean = jnp.mean(mean, axis=0)
        agg_var = (jnp.var(mean, axis=0)
                   + jnp.mean(jnp.exp(logvar), axis=0))
        return agg_mean, agg_var

    return _moments(params, x_in)


def fit_gmm_em(key: jax.Array, z: jax.Array, k: int, *,
               iters: int = 75, var_floor: float = 1e-6):
    """Diagonal-covariance GMM fit by EM, one XLA program.

    The E-step's [N,K] Gaussian log-densities are expanded into three
    matmuls (‖z‖²·(1/v)ᵀ − 2z·(μ/v)ᵀ + const_k) so the inner loop rides
    the MXU instead of materializing a [N,K,Z] broadcast; the ``iters``
    EM sweeps run under one ``lax.scan``. Means initialize greedily at
    farthest points (k-means++-style: random first point, then argmax of
    the min-distance-so-far) — a random-points init drops two seeds into
    one cluster often enough to merge components; variances start at the
    global diagonal variance, weights uniform.

    Returns ``(log_weights [K], means [K,Z], variances [K,Z])``.
    """
    z = jnp.asarray(z, jnp.float32)
    n, dim = z.shape
    if k > n:
        raise ValueError(f"cannot fit k={k} components to {n} points")
    first = z[jax.random.randint(key, (), 0, n)]

    def pick(carry, _):
        d2 = carry
        nxt = z[jnp.argmax(d2)]
        return jnp.minimum(d2, jnp.sum((z - nxt) ** 2, axis=1)), nxt

    d2 = jnp.sum((z - first) ** 2, axis=1)
    _, rest = jax.lax.scan(pick, d2, None, length=k - 1)
    means = jnp.concatenate([first[None], rest], axis=0)
    variances = jnp.broadcast_to(jnp.var(z, axis=0) + 1e-4, (k, dim))
    log_w = jnp.full((k,), -jnp.log(float(k)), jnp.float32)
    z_sq = z * z                                           # [N,Z], reused

    def em_sweep(carry, _):
        log_w, means, variances = carry
        inv_v = 1.0 / variances                            # [K,Z]
        # log N(z_i; μ_k, v_k) = −½ (Σ_d z²/v − 2 Σ_d zμ/v + c_k)
        c = jnp.sum(means * means * inv_v
                    + jnp.log(2.0 * jnp.pi * variances), axis=1)   # [K]
        quad = z_sq @ inv_v.T - 2.0 * (z @ (means * inv_v).T)      # [N,K]
        log_r = log_w[None, :] - 0.5 * (quad + c[None, :])
        from jax.scipy.special import logsumexp
        log_r = log_r - logsumexp(log_r, axis=1, keepdims=True)
        r = jnp.exp(log_r)                                 # [N,K]
        nk = jnp.sum(r, axis=0) + 1e-6                     # [K]
        means = (r.T @ z) / nk[:, None]
        ex2 = (r.T @ z_sq) / nk[:, None]
        variances = jnp.maximum(ex2 - means * means, var_floor)
        log_w = jnp.log(nk / n)
        return (log_w, means, variances), None

    (log_w, means, variances), _ = jax.lax.scan(
        em_sweep, (log_w, means, variances), None, length=iters)
    return log_w, means, variances


def posterior_draws(model, params, x_in: jax.Array, key: jax.Array,
                    draws_per_x: int = 2) -> jax.Array:
    """[N·draws_per_x, Z] samples of the aggregate posterior q(z) =
    E_x[q(z|x)] — the fit target shared by the ex-post GMM and flow
    priors. ``draws_per_x`` posterior samples per datum keep a fit from
    mistaking per-x posterior spread for between-x structure."""
    from apv_tpu import ops

    @jax.jit
    def _draw(params, x, key):
        mean, logvar = model.apply({"params": params}, x, method="encode")
        ks = jax.random.split(key, draws_per_x)
        zs = jnp.stack([ops.reparam_sample(kk, mean, logvar) for kk in ks])
        return zs.reshape(-1, zs.shape[-1])

    return _draw(params, x_in, key)


def expost_prior_gmm(model, params, x_in: jax.Array, key: jax.Array, *,
                     k: int = 10, iters: int = 75, draws_per_x: int = 2):
    """K-component ex-post prior: EM-fit a diagonal GMM to samples of the
    aggregate posterior q(z) = E_x[q(z|x)].

    The diagonal-Gaussian ex-post fit (:func:`expost_prior_moments`)
    measurably under-carries q's heavy tails on converged checkpoints
    (RESULTS.md 800k A/B: its residual gap is exactly the tails a single
    diagonal Gaussian cannot hold); the RAE lineage's remedy is this
    K-component fit (arXiv 1903.12436 §4 fits a 10-component GMM ex
    post).

    Returns ``(log_weights [K], means [K,Z], variances [K,Z])``.
    """
    k_draw, k_fit = jax.random.split(key)
    z = posterior_draws(model, params, x_in, k_draw, draws_per_x)
    return jax.jit(fit_gmm_em, static_argnames=("k", "iters"))(
        k_fit, z, k=k, iters=iters)


def expost_prior_flow(model, params, x_in: jax.Array, key: jax.Array, *,
                      n_layers: int = 6, hidden: int = 64,
                      steps: int = 2000, draws_per_x: int = 4):
    """Flow ex-post prior: RealNVP MLE-fit to aggregate-posterior samples
    (core/flow.py — the heavy-tail rung above the diagonal/GMM fits).

    Returns the fitted flow params dict — the third ``prior_moments``
    form next to the (mean, var) and (log_w, means, vars) tuples; the
    draw/density owners below dispatch on the dict. Prints nothing;
    callers can inspect convergence via the returned fit trace in
    ``flow_nll`` (final mean train NLL, nats) stashed on the dict.
    """
    from apv_tpu.core.flow import fit_flow

    k_draw, k_fit = jax.random.split(key)
    z = posterior_draws(model, params, x_in, k_draw, draws_per_x)
    flow, nll_trace = fit_flow(k_fit, z, n_layers=n_layers, hidden=hidden,
                               steps=steps)
    # Final-window NLL rides along for observability; tree_map'd consumers
    # (device_get, export baking) treat it as one more leaf.
    flow["flow_nll"] = jnp.mean(nll_trace[-50:])
    return flow


def expost_prior_sample(key: jax.Array, prior_moments, n: int,
                        z_dim: int) -> jax.Array:
    """Draw n latents from a fitted ex-post prior: a ``(mean, var)``
    diagonal Gaussian, a ``(log_w, means, vars)`` diagonal GMM, or a
    flow params dict (core/flow.py) — the single draw-side owner of the
    prior_moments structure convention."""
    if isinstance(prior_moments, dict):
        from apv_tpu.core.flow import flow_inverse
        u = jax.random.normal(key, (n, z_dim), jnp.float32)
        return flow_inverse(prior_moments, u)
    if len(prior_moments) == 2:
        agg_mean, agg_var = prior_moments
        eps = jax.random.normal(key, (n, z_dim), jnp.float32)
        return agg_mean + jnp.sqrt(agg_var) * eps
    log_w, means, variances = prior_moments
    k_c, k_e = jax.random.split(key)
    ids = jax.random.categorical(k_c, log_w, shape=(n,))
    eps = jax.random.normal(k_e, (n, z_dim), jnp.float32)
    return means[ids] + jnp.sqrt(variances[ids]) * eps


def expost_prior_logpdf(prior_moments):
    """``z [..., Z] → log p(z) [...]`` for a fitted ex-post prior — the
    density counterpart of :func:`expost_prior_sample` (same structure
    convention). All three forms are exact closed-form densities, so an
    ex-post NLL needs no MC log-partition estimate."""
    from apv_tpu.core.distributions import (diag_gmm_logpdf,
                                            gaussian_logpdf)

    if isinstance(prior_moments, dict):
        from apv_tpu.core.flow import flow_logpdf
        return lambda z: flow_logpdf(prior_moments, z)
    if len(prior_moments) == 2:
        agg_mean, agg_var = prior_moments

        def logpdf(z):
            return jnp.sum(gaussian_logpdf(z, agg_mean, jnp.log(agg_var)),
                           axis=-1)

        return logpdf
    log_w, means, variances = prior_moments
    return lambda z: diag_gmm_logpdf(z, log_w, means, variances)


@functools.lru_cache(maxsize=32)
def _sample_fn(model, n: int, z_dim: int, likelihood: str,
               image_channels: int, mode: str, d_apply,
               refine_steps: int, expost: bool, model_prior: bool,
               model_base: bool = False, temperature: float = 1.0):
    """Cached jitted decode pass: without the cache every generate_samples
    call builds a fresh closure, so jit re-traces (and reloads from the
    persistent compile cache) per call — ~475 ms of pure overhead on the
    flagship decoder vs ~22 ms of compute (RESULTS.md sampling row)."""

    @jax.jit
    def _run(params, d_params, key, prior_moments):
        k_z, k_x = jax.random.split(key)
        if expost:
            z = expost_prior_sample(k_z, prior_moments, n, z_dim)
            diag = {}
        elif model_prior:
            # the model's own trained (flow) prior: exact inverse pass.
            # temperature < 1 truncates the base draw (u ~ N(0, T^2 I) -
            # the standard flow sampling knob, Glow/Kingma & Dhariwal
            # 2018 app. D): the flow's inverse amplifies base tails into
            # far z outliers (measured: cifar_flow_100k scatter spans
            # +-500 where q spans +-150, blowing up the Frechet), and
            # tempering trades that tail mass for sample typicality.
            u = temperature * jax.random.normal(k_z, (n, z_dim),
                                                jnp.float32)
            z = model.apply({"params": params}, u,
                            method="prior_sample_from")
            diag = {}
        else:
            base_from = base_logp = None
            if model_base:
                # shaped prior over the model's trainable base
                # (model.prior='gaussian'): pool + MALA target ride
                # N(μ,σ) instead of N(0,I). temperature < 1 tempers the
                # base draw (z = μ + T·σ·u — the gaussian counterpart of
                # the flow's truncated-base knob): the SIR pool and the
                # MALA target both ride the tempered base N(μ, T²σ²) so
                # the two stay the same distribution.
                def base_from(u):
                    return model.apply({"params": params},
                                       temperature * u,
                                       method="prior_sample_from")

                def base_logp(zz):
                    if temperature != 1.0:
                        # log N(z; μ, T²σ²) = log N(μ + (z−μ)/T; μ, σ²)
                        # + const — MALA only needs ∇, so the additive
                        # −Z·log T normalizer is dropped. μ is recovered
                        # as prior_sample_from(0).
                        mu = model.apply({"params": params},
                                         jnp.zeros_like(zz),
                                         method="prior_sample_from")
                        zz = mu + (zz - mu) / temperature
                    return model.apply({"params": params}, zz,
                                       method="prior_logpdf")
            z, diag = sample_prior(k_z, n, z_dim, d_apply=d_apply,
                                   d_params=d_params,
                                   refine_steps=refine_steps,
                                   return_diagnostics=True,
                                   base_from=base_from,
                                   base_logp=base_logp)
        out = model.apply({"params": params}, z, method="decode")
        return decoder_pixels(out, k_x, likelihood, image_channels,
                              mode), diag

    return _run


def generate_samples(model, params, key: jax.Array, n: int, z_dim: int,
                     likelihood: str, image_channels: int, *,
                     d_apply=None, d_params=None, mode: str = "mean",
                     refine_steps: int = 0, prior_moments=None,
                     model_prior: bool = False, model_base: bool = False,
                     temperature: float = 1.0,
                     return_diagnostics: bool = False):
    """Decode n prior samples → images in [0,1], one jitted batched pass
    (SIR + optional MALA refine + decode compile together).

    ``prior_moments`` (from :func:`expost_prior_moments`) switches the
    latent draw to the ex-post aggregate-posterior Gaussian instead of
    the model's own (shaped) prior. ``model_prior`` draws from the
    model's own TRAINED prior instead (the flow prior,
    model.prior='flow' — exact, no SIR/D machinery). ``model_base``
    keeps the SIR/D machinery but rides the model's trainable base
    (model.prior='gaussian' composed with the adversarial D)."""
    if prior_moments is not None and refine_steps > 0:
        raise ValueError("refine_steps applies to the adversarially-shaped "
                         "prior; the ex-post prior is sampled exactly — "
                         "use one or the other")
    if model_prior and (prior_moments is not None or d_apply is not None
                        or refine_steps > 0):
        raise ValueError("model_prior (the trained flow prior) is drawn "
                         "exactly from the model's params — it excludes "
                         "ex-post moments, a latent D, and refinement")
    if model_base and (model_prior or prior_moments is not None):
        raise ValueError("model_base (shaped prior over the trainable "
                         "gaussian base) excludes model_prior and ex-post "
                         "moments")
    if temperature != 1.0 and not (model_prior or model_base):
        raise ValueError("temperature applies to the model's own trained "
                         "prior (model.prior='flow'/'gaussian' drawn via "
                         "prior_sample_from) - other priors are drawn at "
                         "their fitted scale")
    fn = _sample_fn(model, n, z_dim, likelihood, image_channels, mode,
                    d_apply, refine_steps, prior_moments is not None,
                    model_prior, model_base, float(temperature))
    images, diag = fn(params, d_params, key, prior_moments)
    if return_diagnostics:
        return images, {k: (float(v) if hasattr(v, "shape") else v)
                        for k, v in diag.items()}
    return images


def reconstruct_images(model, params, x_in: jax.Array, key: jax.Array,
                       likelihood: str, image_channels: int, *,
                       mode: str = "mean") -> jax.Array:
    """x → q(z|x) sample → decode, one jitted pass (visualization parity:
    the reference lineage's reconstruction plots — SURVEY.md §1 L6)."""

    @jax.jit
    def _run(params, x, key):
        k_z, k_x = jax.random.split(key)
        mean, logvar = model.apply({"params": params}, x, method="encode")
        from apv_tpu import ops
        z = ops.reparam_sample(k_z, mean, logvar)
        out = model.apply({"params": params}, z, method="decode")
        return decoder_pixels(out, k_x, likelihood, image_channels, mode)

    return _run(params, x_in, key)


def latent_interpolate(model, params, x_a: jax.Array, x_b: jax.Array,
                       steps: int, likelihood: str, image_channels: int, *,
                       kind: str = "slerp") -> jax.Array:
    """Decode a latent path between two image batches: encode both to
    posterior means, interpolate in z ('slerp' walks the great circle —
    the natural path under a Gaussian prior, where interpolants keep
    typical norm — or 'lerp'), decode every step in one batched pass.

    Returns [P, steps, H, W, C] for P pairs.
    """

    @jax.jit
    def _run(params, x_a, x_b):
        z_a, _ = model.apply({"params": params}, x_a, method="encode")
        z_b, _ = model.apply({"params": params}, x_b, method="encode")
        t = jnp.linspace(0.0, 1.0, steps)[None, :, None]      # [1,S,1]
        za, zb = z_a[:, None, :], z_b[:, None, :]              # [P,1,Z]
        if kind == "slerp":
            na = jnp.linalg.norm(za, axis=-1, keepdims=True)
            nb = jnp.linalg.norm(zb, axis=-1, keepdims=True)
            cos = jnp.sum(za * zb, -1, keepdims=True) / (na * nb + 1e-9)
            omega = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))
            so = jnp.sin(omega)
            z = (jnp.sin((1 - t) * omega) / so * za
                 + jnp.sin(t * omega) / so * zb)
        elif kind == "lerp":
            z = (1 - t) * za + t * zb
        else:
            raise ValueError(f"unknown interpolation kind {kind!r}")
        p, s, zd = z.shape
        out = model.apply({"params": params}, z.reshape(p * s, zd),
                          method="decode")
        img = decoder_pixels(out, jax.random.PRNGKey(0), likelihood,
                             image_channels, "mean")
        return img.reshape((p, s) + img.shape[1:])

    return _run(params, x_a, x_b)


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
