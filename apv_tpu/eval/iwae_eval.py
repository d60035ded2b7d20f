"""IWAE-k evaluation at scale (SURVEY.md §3.3 — the compute hot path).

Per test batch: one encoder pass, then the k=1000 importance samples stream
through a ``lax.scan`` in chunks (fresh z + decoder forward per chunk,
running streaming-logsumexp state — peak memory is ONE chunk of decoder
activations). The batch axis is sharded over the mesh's data axis, so chips
split the test set while each streams its own k axis; with
``k_devices > 1`` (``shard_k=True``) the k axis itself is sharded and merged
with a final cross-chip logsumexp — the workload's analogue of
long-axis/sequence parallelism (SURVEY.md §5).

With the adversarial learned prior, log p*(z) = log p0(z) + D(z) - log Z;
``estimate_log_partition`` MC-estimates log Z = log E_{p0}[e^{D(z)}].
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from apv_tpu import ops
from apv_tpu.core import distributions as D
from apv_tpu.core.iwae import iwae_log_likelihood
from apv_tpu.training.losses import recon_log_likelihood


def sample_posterior_chunk(chunk_key, mean, logvar, chunk: int):
    """Draw [chunk, B, Z] posterior samples through the ops dispatch —
    the Pallas HW-PRNG reparam kernel on TPU, threefry on CPU (where the
    broadcasted shapes make the stream identical to the old
    ``gaussian_sample(sample_shape=(chunk,))`` call)."""
    mean_k = jnp.broadcast_to(mean[None], (chunk,) + mean.shape)
    logvar_k = jnp.broadcast_to(logvar[None], (chunk,) + logvar.shape)
    return ops.reparam_sample(chunk_key, mean_k, logvar_k)


def make_logw_chunk_fn(decode: Callable, likelihood: str, chunk: int,
                       d_apply: Callable | None = None,
                       prior_logpdf: Callable | None = None,
                       prior_logpdf_p: Callable | None = None) -> Callable:
    """One-chunk log importance weights [chunk, B] — the ONE place the
    IWAE estimator math lives. Shared by the unsharded scan
    (``make_iwae_fn``) and the k-sharded shard_map (``eval/sharded.py``)
    so a likelihood/prior-correction change cannot silently diverge the
    two paths.

    ``prior_logpdf`` (``z [..., Z] → [...]``, exact closed form) replaces
    the standard-Gaussian prior term entirely — the ex-post fitted priors
    (sampling/run.expost_prior_logpdf). ``prior_logpdf_p``
    (``(params, z) → [...]``) does the same for a prior whose parameters
    live inside the MODEL's params — the trained flow or gaussian prior
    (model.prior='flow'/'gaussian'). The ex-post prior excludes the other
    two (it deliberately REPLACES the model's prior). ``d_apply``
    composes with ``prior_logpdf_p``: the shaped prior is a correction on
    top of whatever base the model carries — p*(z) ∝ p_base(z)·e^{D(z)}
    (N(0,I) by default, the trainable N(μ,σ) for model.prior='gaussian';
    pass the log Z estimated under the SAME base)."""
    if prior_logpdf is not None and (d_apply is not None
                                     or prior_logpdf_p is not None):
        raise ValueError("prior_logpdf (ex-post prior) replaces the "
                         "model's prior entirely — it excludes d_apply "
                         "(shaped correction) and prior_logpdf_p (trained "
                         "model prior)")

    def logw_chunk(params, d_params, mean, logvar, x_target, chunk_key,
                   log_z):
        b = mean.shape[0]
        z = sample_posterior_chunk(chunk_key, mean, logvar, chunk)
        zf = z.reshape(chunk * b, -1)
        out = decode(params, zf)
        xt = jnp.broadcast_to(x_target[None], (chunk,) + x_target.shape)
        recon = recon_log_likelihood(
            xt.reshape((chunk * b,) + x_target.shape[1:]), out,
            likelihood).reshape(chunk, b)
        if prior_logpdf is not None:
            logp0 = prior_logpdf(z)
        elif prior_logpdf_p is not None:
            logp0 = prior_logpdf_p(params, z)
        else:
            logp0 = jnp.sum(D.standard_gaussian_logpdf(z), axis=-1)
        logq = jnp.sum(D.gaussian_logpdf(z, mean, logvar), axis=-1)
        logw = recon + logp0 - logq
        if d_apply is not None:
            logw = logw + d_apply(d_params, zf).reshape(chunk, b) - log_z
        return logw

    return logw_chunk


def make_iwae_fn(model, likelihood: str, k: int, chunk: int,
                 d_apply: Callable | None = None,
                 prior_logpdf: Callable | None = None,
                 prior_logpdf_p: Callable | None = None) -> Callable:
    """Build ``fn(params, d_params, x_in, x_target, key, log_z) -> [B]``.

    ``d_apply`` non-None switches the prior to the adversarially-shaped
    p*(z) ∝ p0(z)·e^{D(z)} (pass the matching ``log_z``; 0.0 gives scores
    up to the constant — fine for ratios/AUROC). ``prior_logpdf`` swaps
    in an exact ex-post prior instead (make_logw_chunk_fn).
    """

    def encode(params, x):
        return model.apply({"params": params}, x, method="encode")

    def decode(params, z):
        return model.apply({"params": params}, z, method="decode")

    logw_chunk = make_logw_chunk_fn(decode, likelihood, chunk, d_apply,
                                    prior_logpdf, prior_logpdf_p)

    def iwae_fn(params, d_params, x_in, x_target, key, log_z=0.0):
        mean, logvar = encode(params, x_in)          # [B, Z], once
        b = mean.shape[0]

        def logw_fn(chunk_key):
            return logw_chunk(params, d_params, mean, logvar, x_target,
                              chunk_key, log_z)

        return iwae_log_likelihood(logw_fn, key, k=k, chunk_size=chunk,
                                   out_shape=(b,))

    return iwae_fn


def estimate_log_partition(d_apply: Callable, d_params: Any, z_dim: int,
                           key: jax.Array, n: int = 100_000,
                           batch: int = 5_000, with_se: bool = False,
                           base_from: Callable | None = None):
    """log Z = log E_{z~base}[e^{D(z)}], streamed logsumexp over n draws.

    ``base_from`` (``u [B,Z] ~ N(0,I) → z [B,Z]``) transforms the MC draws
    to the shaped prior's BASE distribution — identity (default) for the
    standard N(0,I) base, the learned μ+σ·u map for model.prior='gaussian'
    (the log Z must be estimated under the same base the weights use).

    ``with_se=True`` additionally returns a delete-one-chunk jackknife
    standard error over the n/batch MC chunks (VERDICT r2 weak-6: a point
    estimate of log Z gives the learned-prior NLL no error bar — nobody can
    tell whether a 0.002 bits/dim gap is signal or log-Z noise).
    """
    if n % batch != 0:
        raise ValueError(f"n={n} must be divisible by batch={batch}")
    keys = jax.random.split(key, n // batch)

    def body(_, k):
        u = jax.random.normal(k, (batch, z_dim))
        z = u if base_from is None else base_from(u)
        logits = d_apply(d_params, z)
        return None, jax.scipy.special.logsumexp(logits)

    _, chunk_lse = jax.lax.scan(body, None, keys)     # [B] per-chunk lse
    total = jax.scipy.special.logsumexp(chunk_lse)
    log_z = total - jnp.log(float(n))
    if not with_se:
        return log_z
    # Jackknife: log Z with chunk i deleted. Computed as a masked logsumexp
    # over the REMAINING chunks, not log(e^total - e^{L_i}) — the
    # subtraction form yields -inf/NaN whenever one chunk dominates the
    # total within float precision (heavy-tailed e^{D(z)}), and a NaN SE
    # would poison eval.json.
    nb = chunk_lse.shape[0]
    if nb < 2:
        raise ValueError(
            f"jackknife SE needs >= 2 MC chunks; n={n}, batch={batch} "
            f"gives {nb} — lower batch or skip with_se")
    keep = ~jnp.eye(nb, dtype=bool)                   # [nb, nb] leave-one-out
    loo = jax.vmap(lambda m: jax.scipy.special.logsumexp(
        jnp.where(m, chunk_lse, -jnp.inf)))(keep)
    logz_loo = loo - jnp.log(float(n - batch))
    se = jnp.sqrt((nb - 1) / nb
                  * jnp.sum((logz_loo - jnp.mean(logz_loo)) ** 2))
    return log_z, se
