"""Loss functions: ELBO and both adversarial-prior variants
(SURVEY.md §2.4, §3.2).

Discriminator convention: ``D(z)`` is the logit that z came from the
*aggregate posterior* q(z) (class 1) rather than the prior p0(z) (class 0).
At the BCE optimum, D(z) = log q(z) - log p0(z) — exactly the density ratio
the 'learned_prior' variant adds to the ELBO:

    log p*(z) = log p0(z) + D(z) - log Z     (p* ∝ p0 · e^D ≈ q)

Variants (the reference's exact choice is [I]-level — SURVEY.md §2.4 — so
both are first-class and config-switchable):
  * 'learned_prior': G maximizes recon - β·KL(q||p0) + λ·E_q[D(z)]; the
    prior itself is adversarially shaped.
  * 'aae': G maximizes recon - β·KL + λ·(-softplus(D(z))): posterior
    samples are pushed to fool D, prior stays N(0,I) (AAE-style, with β=0
    recovering the pure AAE objective).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

from apv_tpu import ops
from apv_tpu.core import distributions as D


def decoder_output_to_likelihood_params(out: jax.Array, likelihood: str,
                                        image_channels: int):
    """Split the decoder's channel-stacked output into likelihood params.

    Bernoulli: out [B,H,W,C] are logits. Discretized logistic: out
    [B,H,W,2C] → (mean, log_scale); mean is unconstrained (edge-bin handling
    absorbs out-of-range means), log_scale is floored at -7 (PixelCNN++
    convention — keeps the per-bin mass from collapsing below fp precision).
    Mixture ('disc_logistic_mix'): out [B,H,W,3·K·C] → per-channel K-tuples
    (means, log_scales, mix_logits), each [B,H,W,C,K]; K is inferred from
    the channel count so callers need no extra plumbing.
    """
    if likelihood == "bernoulli":
        return (out,)
    if likelihood == "discretized_logistic":
        mean, log_scale = jnp.split(out, 2, axis=-1)
        return mean, jnp.maximum(log_scale, -7.0)
    if likelihood == "disc_logistic_mix":
        c = image_channels
        k3 = out.shape[-1] // c
        if out.shape[-1] != c * k3 or k3 % 3 != 0:
            raise ValueError(
                f"disc_logistic_mix head must be 3·K·C channels; got "
                f"{out.shape[-1]} for C={c}")
        p = out.reshape(out.shape[:-1] + (c, k3))
        means, log_scales, logits = jnp.split(p, 3, axis=-1)
        return means, jnp.maximum(log_scales, -7.0), logits
    raise ValueError(f"unknown likelihood {likelihood!r}")


def recon_log_likelihood(x_target: jax.Array, out: jax.Array,
                         likelihood: str) -> jax.Array:
    """Per-sample reconstruction log-likelihood [B] via the ops tier."""
    params = decoder_output_to_likelihood_params(out, likelihood,
                                                 x_target.shape[-1])
    if likelihood == "bernoulli":
        return ops.bernoulli_recon_ll(x_target, params[0])
    if likelihood == "disc_logistic_mix":
        return ops.disc_logistic_mix_recon_ll(x_target, *params)
    return ops.disc_logistic_recon_ll(x_target, params[0], params[1])


def likelihood_pixel_mean(out: jax.Array, likelihood: str,
                          image_channels: int) -> jax.Array:
    """Decoder output → the pixel likelihood's mean image in [0,1].

    Differentiable (sigmoid / clip / mixture-mean) — this is the x̂ the
    biadversarial pixel discriminator sees, and the generator's pixel-space
    adversarial gradient flows through it into the decoder. Shared with
    sampling's mode='mean' path so 'what D_x judges' and 'what sample()
    renders' are the same image.
    """
    params = decoder_output_to_likelihood_params(out, likelihood,
                                                 image_channels)
    if likelihood == "bernoulli":
        return jax.nn.sigmoid(params[0])
    if likelihood == "disc_logistic_mix":
        from apv_tpu.core.distributions import (
            discretized_logistic_mixture_mean)
        means, _, logits = params
        return jnp.clip(discretized_logistic_mixture_mean(means, logits),
                        0.0, 1.0)
    return jnp.clip(params[0], 0.0, 1.0)


def elbo_terms(encode: Callable, decode: Callable, params: Any,
               x_in: jax.Array, x_target: jax.Array, key: jax.Array,
               likelihood: str):
    """One forward pass: returns (recon [B], kl [B], z [B,Z])."""
    mean, logvar = encode(params, x_in)
    z = ops.reparam_sample(key, mean, logvar)
    out = decode(params, z)
    recon = recon_log_likelihood(x_target, out, likelihood)
    kl = ops.kl_standard(mean, logvar)
    return recon, kl, z


def generator_adv_term(d_logits_q: jax.Array, variant: str) -> jax.Array:
    """Per-sample LATENT-space term ADDED to the ELBO (higher = better
    for G). 'biadversarial' keeps learned_prior's density-ratio-shaped
    prior in z; its second (pixel-space) term is pixel_g_term below."""
    if variant in ("learned_prior", "biadversarial"):
        return d_logits_q                       # +E_q[D(z)]
    if variant == "aae":
        return -jax.nn.softplus(d_logits_q)     # log(1 - sigma(D)): fool D
    raise ValueError(f"unknown adversarial variant {variant!r}")


def pixel_g_term(dx_logits: jax.Array) -> jax.Array:
    """Per-sample pixel-space generator term (biadversarial, higher =
    better for G): the non-saturating GAN loss log σ(D_x(x̂)) — gradients
    stay alive while D_x confidently rejects reconstructions, unlike the
    saturating log(1−σ) form."""
    return -jax.nn.softplus(-dx_logits)


def r1_penalty(d_fn: Callable, x_real: jax.Array) -> jax.Array:
    """R1 zero-centered gradient penalty ½·E[‖∇_x D(x)‖²] on real samples
    (Mescheder et al. 2018, arXiv 1801.04406 eq. 9) — penalizes D for
    sharp decision surfaces at the data, the standard saturation fix.
    Differentiable in D's params (the caller takes a second grad through
    the per-sample input gradients). ``x_real`` may be [B, D] (latent D)
    or [B, H, W, C] (pixel D); the norm reduces all non-batch axes.

    ∇_x Σ_b D(x_b) IS the stack of per-sample gradients because neither
    discriminator couples samples across the batch (no batch norm — a
    deliberate design choice documented on PixelDiscriminator), so one
    backward replaces a vmap-of-grad."""
    g = jax.grad(lambda x: jnp.sum(d_fn(x)))(x_real)
    sq = jnp.sum(g.reshape(g.shape[0], -1).astype(jnp.float32) ** 2, axis=-1)
    return 0.5 * jnp.mean(sq)


def d_loss_floor(label_smoothing: float) -> float:
    """The analytic minimum of discriminator_loss below.

    With smoothing s the per-side optimum is at σ(t) = 1−s, where the
    side's loss equals the binary entropy H(s) = −[s·ln s + (1−s)·ln(1−s)];
    the two sides sum to 2·H(s) (s=0.1 → 0.6502, exactly the measured
    plateau of the saturated CIFAR runs — RESULTS.md scaling rows). s=0
    gives 0 (no floor). The chance plateau (t=0) is 2·ln 2 ≈ 1.386."""
    s = float(label_smoothing)
    if s <= 0.0:
        return 0.0
    return -2.0 * (s * math.log(s) + (1.0 - s) * math.log(1.0 - s))


def discriminator_loss(d_logits_q: jax.Array, d_logits_p: jax.Array,
                       label_smoothing: float = 0.0):
    """BCE: posterior samples → class 1, prior samples → class 0.

    Returns (loss, accuracy). With label smoothing s, targets become
    (1-s, s) — standard GAN stabilization.
    """
    s = label_smoothing
    # -[(1-s)·log sigma(Dq) + s·log(1-sigma(Dq))]
    loss_q = (1 - s) * jax.nn.softplus(-d_logits_q) + s * jax.nn.softplus(d_logits_q)
    loss_p = (1 - s) * jax.nn.softplus(d_logits_p) + s * jax.nn.softplus(-d_logits_p)
    loss = jnp.mean(loss_q) + jnp.mean(loss_p)
    acc = 0.5 * (jnp.mean((d_logits_q > 0).astype(jnp.float32))
                 + jnp.mean((d_logits_p <= 0).astype(jnp.float32)))
    return loss, acc


def kl_per_dim(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Per-dimension KL(q||N(0,I)) in f32 → same shape as ``mean``.

    The unreduced form of ``ops.kl_standard`` — needed by the free-bits
    objective, which floors the KL per latent dimension BEFORE summing.
    """
    m = mean.astype(jnp.float32)
    lv = logvar.astype(jnp.float32)
    return 0.5 * (jnp.square(m) + jnp.exp(lv) - 1.0 - lv)


def free_bits_kl(mean: jax.Array, logvar: jax.Array,
                 free_bits: float) -> jax.Array:
    """Free-bits KL objective (Kingma et al., IAF appendix C.8): the
    minibatch-mean per-dimension KL is floored at ``free_bits`` nats before
    summing — Σ_j max(λ, E_B[KL_j]). Dimensions whose batch-mean KL sits
    below the floor contribute a constant, so the KL pull (the pressure to
    prune the unit) vanishes there while the reconstruction gradient keeps
    flowing. Returns a scalar; training-objective only — reported metrics
    and IWAE evaluation always use the true KL.
    """
    kd = jnp.mean(kl_per_dim(mean, logvar), axis=0)        # [Z]
    return jnp.sum(jnp.maximum(kd, free_bits))


def free_bits_kl_gaussian_base(mean: jax.Array, logvar: jax.Array,
                               mu_p: jax.Array, logvar_p: jax.Array,
                               free_bits: float) -> jax.Array:
    """Per-dim free bits against the trainable Gaussian base
    (model.prior='gaussian'): identical semantics to :func:`free_bits_kl`
    but with the exact per-dim KL(q‖N(μ_p, σ_p²)) — the base's analytic
    KL decomposes per dimension, so the standard floor applies with no
    approximation. For a floored dim BOTH gradients vanish: the encoder
    stops pruning it AND the base's moment match stops chasing its
    collapsed statistics (the base should not learn to reproduce a
    collapse the floor exists to prevent)."""
    from apv_tpu.core.distributions import gaussian_kl
    kd = jnp.mean(gaussian_kl(mean, logvar, mu_p, logvar_p), axis=0)  # [Z]
    return jnp.sum(jnp.maximum(kd, free_bits))


def free_information_kl(kl_mc: jax.Array, z_dim: int,
                        free_bits: float) -> jax.Array:
    """Total-KL floor for priors with NO per-dim KL decomposition
    (model.prior='flow': the MC KL log q(z|x) − log p_θ(z) is a joint
    quantity — the flow's marginals are intractable). Floors the
    batch-mean TOTAL KL at z_dim·λ ("free information", Lossy-VAE
    lineage arXiv 1611.02731 §3.3 / soft free bits): below the floor the
    whole KL pull (encoder shrinkage AND the flow's MLE chase of the
    collapsed aggregate posterior) vanishes, leaving only reconstruction
    gradients to re-inflate q. Coarser than the per-dim floor — the
    budget can concentrate in few dims — but it is the exact-density
    analogue available without marginalizing the flow."""
    return jnp.maximum(jnp.mean(kl_mc), z_dim * free_bits)


def iwae_objective(encode: Callable, decode: Callable, params: Any,
                   x_in: jax.Array, x_target: jax.Array, key: jax.Array,
                   likelihood: str, k: int, beta: jax.Array,
                   grad_estimator: str = "dreg",
                   prior_logpdf_p: Callable | None = None,
                   d_apply: Callable | None = None,
                   adv_variant: str | None = None,
                   adv_weight: float = 0.0,
                   px_apply: Callable | None = None,
                   px_weight: float = 0.0):
    """IWAE-k multi-sample training objective (IWAE paper, arXiv 1509.00519
    — the same bound the k=1000 evaluator estimates, here with small k as
    the TRAINING objective; SURVEY.md §0.1 paper lineage).

        L_k = E_B[ logsumexp_i(log w_i) - log k ],
        log w_i = recon(z_i) + β·(log p*(z_i) - log q(z_i|x))

    The k samples are folded into the decoder's batch axis (ONE [k·B]
    decoder call — large MXU matmuls, no vmap of the Pallas reparam kernel)
    and drawn through ``ops.reparam_sample`` exactly like the evaluator's
    ``sample_posterior_chunk``. β scales the prior/posterior mismatch term
    so β-warmup behaves like the ELBO path's (β=1 recovers the true bound;
    k=1 recovers the single-sample MC ELBO — tested).

    ``prior_logpdf_p`` (``(params, z [k,B,Z]) → [k,B]``) replaces the
    standard-Gaussian prior term with the model's own trained prior
    (the flow prior, model.prior='flow'). Its parameters are θ-side:
    under DReG they get the same w̃-weighted path as the decoder
    (β·w̃·∂log p_θ(z)/∂θ, z stopped), while the φ path reaches the prior
    only through z in log w (params stopped) — the exact flow-prior
    analogue of Tucker et al.'s decoder treatment.

    With the adversarial prior: 'learned_prior' (and 'biadversarial''s
    latent half) puts adv_weight·D(z_i) inside log w_i (it IS part of
    log p*(z), so it rides β like the KL — mirroring g_phase's elbo path);
    'aae' keeps the bound on the N(0,I) prior and adds its
    fool-the-discriminator regularizer OUTSIDE the bound, MC-averaged over
    the k samples. 'biadversarial''s pixel term (px_apply/px_weight) is
    likewise an outside-the-bound regularizer, MC-averaged over the k
    decodes; under DReG it is computed on the θ-path decode (z stopped), so
    the pixel-space adversarial gradient reaches the decoder but not the
    encoder — D_x judges images, not inference.

    ``grad_estimator``:
      * 'reparam' — plain autodiff through the bound (the IWAE paper's
        estimator). Unbiased, but the inference-net gradient's SNR decays
        as 1/√k (Rainforth et al. 2018).
      * 'dreg' — doubly-reparameterized (Tucker et al. 2018): the encoder
        path is reweighted by normalized-w² with the score term removed;
        the decoder path keeps the standard w̃ weighting (for decoder
        params the two estimators coincide — tested exactly). Same bound
        VALUE as 'reparam' (value+surrogate trick), better φ gradients.

    Returns ``(objective, aux, z_q)``: scalar objective (higher = better,
    caller negates/scales), metric dict, and [B,Z] posterior samples
    (sample 0, stop-gradiented) for discriminator reuse.
    """
    if grad_estimator not in ("reparam", "dreg"):
        raise ValueError(
            f"unknown iwae grad estimator {grad_estimator!r} (reparam|dreg)")
    mean, logvar = encode(params, x_in)
    b = x_in.shape[0]
    mean_k = jnp.broadcast_to(mean[None], (k,) + mean.shape)
    logvar_k = jnp.broadcast_to(logvar[None], (k,) + logvar.shape)
    z = ops.reparam_sample(key, mean_k, logvar_k)          # [k, B, Z]
    zf = z.reshape(k * b, -1)
    xt = jnp.broadcast_to(x_target[None], (k,) + x_target.shape)
    xt = xt.reshape((k * b,) + x_target.shape[1:])

    def decode_recon(p, z_flat):
        out = decode(p, z_flat)
        return out, recon_log_likelihood(xt, out, likelihood).reshape(k, b)

    def recon_fn(p, z_flat):
        return decode_recon(p, z_flat)[1]

    def log_p0_fn(p, zz):
        if prior_logpdf_p is not None:
            return prior_logpdf_p(p, zz)                            # [k, B]
        return jnp.sum(D.standard_gaussian_logpdf(zz), axis=-1)

    def log_q_fn(m, lv):
        return jnp.sum(D.gaussian_logpdf(z, m, lv), axis=-1)        # [k, B]

    d_logits = None
    if d_apply is not None:
        d_logits = d_apply(zf).reshape(k, b)
    learned_prior = d_apply is not None and adv_variant in (
        "learned_prior", "biadversarial")

    def log_w_from(recon, log_p0, log_q):
        logw = recon + beta * (log_p0 - log_q)
        if learned_prior:
            # D(z) is part of log p*(z): same β·weight scaling as g_phase.
            logw = logw + beta * adv_weight * d_logits
        return logw

    sg = jax.lax.stop_gradient
    if grad_estimator == "reparam":
        out_g, recon = decode_recon(params, zf)
        log_p0 = log_p0_fn(params, z)
        log_w = log_w_from(recon, log_p0, log_q_fn(mean, logvar))
        objective = jnp.mean(
            jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(k)))
    else:
        # DReG: φ reaches log w ONLY through z (score term cut by
        # stop-gradient on q's direct params), weighted w̃²; θ reaches it
        # only through recon (z stopped), weighted w̃. The two decode calls
        # share one primal (XLA CSEs the forward); only the backward splits.
        recon_z = recon_fn(sg(params), zf)                 # φ path via z
        out_g, recon_th = decode_recon(params, sg(zf))     # θ path
        log_p0 = log_p0_fn(sg(params), z)                  # φ path via z
        log_w_z = log_w_from(recon_z, log_p0,
                             log_q_fn(sg(mean), sg(logvar)))
        w_tilde = sg(jax.nn.softmax(log_w_z, axis=0))      # [k, B]
        theta_path = recon_th
        if prior_logpdf_p is not None:
            # trained-prior params are θ-side: w̃-weighted, z stopped
            # (see docstring); β matches log w's prior-term scaling.
            theta_path = theta_path + beta * prior_logpdf_p(params, sg(z))
        surrogate = jnp.mean(jnp.sum(
            w_tilde * theta_path + jnp.square(w_tilde) * log_w_z, axis=0))
        bound = sg(jnp.mean(
            jax.scipy.special.logsumexp(log_w_z, axis=0) - jnp.log(float(k))))
        objective = bound + surrogate - sg(surrogate)      # value=bound,
        recon = recon_z                                    # grad=surrogate
        log_w = log_w_z

    aux = {
        "iwae_bound": sg(jnp.mean(
            jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(k)))),
        "recon": sg(jnp.mean(recon)),
        # MC KL estimate over the k samples (no analytic KL in the bound).
        "kl": sg(jnp.mean(log_q_fn(mean, logvar) - log_p0)),
    }
    if d_apply is not None:
        adv_term = generator_adv_term(d_logits, adv_variant)
        aux["g_adv"] = sg(jnp.mean(adv_term))
        if adv_variant == "aae":
            # AAE's term regularizes q, it is NOT part of the prior: add its
            # MC estimate outside the bound (plain reparam gradient through
            # z is unbiased for an E_q[g(z)] regularizer — no DReG needed).
            objective = objective + adv_weight * jnp.mean(adv_term)
    if px_apply is not None and px_weight > 0.0:
        # Biadversarial pixel term: outside-the-bound regularizer on the k
        # decoded means (see docstring for the DReG gradient-path choice).
        x_hat = likelihood_pixel_mean(out_g, likelihood, x_target.shape[-1])
        px_term = pixel_g_term(px_apply(x_hat))
        aux["g_px"] = sg(jnp.mean(px_term))
        # First-sample x̂ for discriminator reuse (mirrors the z_q return).
        aux["x_hat"] = sg(x_hat.reshape((k, b) + x_hat.shape[1:])[0])
        objective = objective + px_weight * jnp.mean(px_term)
    return objective, aux, sg(z[0])


def mc_prior_ratio(z: jax.Array, mean: jax.Array, logvar: jax.Array):
    """Single-sample MC estimate of log p0(z) - log q(z|x), per sample [B]."""
    lp = jnp.sum(D.standard_gaussian_logpdf(z).reshape(z.shape[0], -1), -1)
    lq = jnp.sum(D.gaussian_logpdf(z, mean, logvar).reshape(z.shape[0], -1), -1)
    return lp - lq
