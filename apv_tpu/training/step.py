"""The train step: ELBO + adversarial alternating updates in ONE compiled
function (SURVEY.md §3.2 "the critical stack").

TPU mapping of the reference's per-iteration ``sess.run(opt_D)×n ;
sess.run(opt_G)`` host loop: both phases live inside one jitted step —
n_critic discriminator updates (fresh posterior/prior samples each) followed
by one generator/VAE update. With the batch sharded over the mesh's data
axis and params replicated, XLA inserts the per-phase gradient all-reduce
over ICI (SURVEY.md §2.6 "Distributed communication backend"); there are no
hand-written collectives to get wrong.

``stop_gradient`` discipline: the D phase differentiates only d_params
(posterior samples enter stop-gradiented); the G phase differentiates only
the VAE params (D's params are closed over as constants).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from apv_tpu import ops
from apv_tpu.data.preprocess import (normalize_center, uniform_dequantize,
                                     unpack_bits)
from apv_tpu.models import (PixelDiscriminator, make_latent_d,
                            build_model)
from apv_tpu.training import losses as L
from apv_tpu.training.state import TrainState
from apv_tpu.utils.config import Config


class TrainFns(NamedTuple):
    init_fn: Callable[[jax.Array], TrainState]
    train_step: Callable[[TrainState, dict], tuple[TrainState, dict]]
    # k steps per dispatch: lax.scan of train_step over a k-stacked batch
    # (cfg.train.steps_per_call); metrics come back with a leading k axis.
    multi_step: Callable[[TrainState, dict], tuple[TrainState, dict]]
    eval_step: Callable[[TrainState, dict], dict]
    model: Any
    discriminator: Any


def _accum(cfg: Config, tx: optax.GradientTransformation):
    """Gradient accumulation: average grads over k micro-steps, apply the
    inner update on the k-th (optax.MultiSteps). The inner schedules tick
    once per real update, so _make_optimizer divides its step counts by k
    to keep the same decay profile over cfg.train.steps micro-steps."""
    k = cfg.train.grad_accum
    return optax.MultiSteps(tx, every_k_schedule=k) if k > 1 else tx


def _make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # Schedules count optimizer updates = micro-steps / grad_accum.
    updates_total = max(1, cfg.train.steps // cfg.train.grad_accum)
    # decay_steps includes the warmup leg; keep warmup under half the run so
    # short smoke runs (steps << lr_warmup_steps) still get a valid schedule.
    warmup = max(1, min(cfg.train.lr_warmup_steps // cfg.train.grad_accum,
                        updates_total // 2))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.train.lr,
        warmup_steps=warmup,
        decay_steps=max(updates_total, warmup + 1),
        end_value=cfg.train.lr_end_value)
    return _accum(cfg, optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(schedule),
    ))


def _make_d_optimizer(cfg: Config) -> optax.GradientTransformation:
    a = cfg.adversarial
    lr: Any = a.d_lr
    if a.d_lr_schedule == "cosine":
        # The D optimizer ticks once per critic iteration (n_critic per
        # train step), so the decay horizon counts D updates, not steps.
        d_updates = (max(1, cfg.train.steps // cfg.train.grad_accum)
                     * max(1, a.n_critic))
        lr = optax.cosine_decay_schedule(
            init_value=a.d_lr, decay_steps=d_updates,
            alpha=a.d_lr_end / a.d_lr)
    elif a.d_lr_schedule not in ("constant", "floor_adaptive"):
        # 'floor_adaptive' keeps a constant base LR here; the throttle is a
        # state-dependent update scale applied in d_phase (it cannot be an
        # optax schedule — it depends on the current batch's d_loss).
        raise ValueError(
            f"adversarial.d_lr_schedule must be 'constant', 'cosine', or "
            f"'floor_adaptive', got {a.d_lr_schedule!r}")
    return _accum(cfg, optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(lr, b1=0.5),   # b1=0.5: GAN convention
    ))


def prepare_batch(cfg: Config, batch: dict, key: jax.Array):
    """In-step input stage: returns (x_in, x_target).

    * bit-packed binarized MNIST: ``image_packed`` is uint8 bitfield rows
      (8 px/byte, data.bit_pack); unpacked to float {0,1} on device.
    * binarized MNIST: image is float {0,1}; input == target.
    * CIFAR: image is uint8; input = centered uniform-dequantized levels,
      target = bin centers i/255 (the discrete pmf's support).
    """
    if "image_packed" in batch:
        x = unpack_bits(batch["image_packed"], cfg.model.image_shape)
        return x, x
    image = batch["image"]
    if cfg.data.dequantize:
        x_in = normalize_center(uniform_dequantize(key, image))
        x_target = image.astype(jnp.float32) / 255.0
        return x_in, x_target
    x = image.astype(jnp.float32)
    return x, x


def _beta(cfg: Config, step: jax.Array) -> jax.Array:
    beta = jnp.asarray(cfg.train.beta, jnp.float32)
    if cfg.train.beta_warmup_steps > 0:
        frac = jnp.minimum(step.astype(jnp.float32)
                           / cfg.train.beta_warmup_steps, 1.0)
        beta = beta * frac
    return beta


def make_train_fns(cfg: Config) -> TrainFns:
    model = build_model(cfg.model)
    adv = cfg.adversarial.enabled
    model_prior = getattr(cfg.model, "prior", "standard")
    flow_prior = model_prior == "flow"
    gauss_prior = model_prior == "gaussian"
    trainable_prior = flow_prior or gauss_prior
    if flow_prior and adv:
        raise ValueError(
            "model.prior='flow' and adversarial.enabled are mutually "
            "exclusive — each is a complete reading of log p(z) (the "
            "flow IS the prior; the adversarial D shapes N(0,I)). "
            "model.prior='gaussian' is the trainable base that DOES "
            "compose with the adversarial D.")
    # train.free_bits composes with every prior family (round-5: the
    # round-4 blanket ban starved MNIST-flow of the standard collapse
    # counter — VERDICT r4 item 5): standard prior → per-dim floor vs
    # N(0,I); gaussian → exact per-dim floor vs the trainable base;
    # flow → total-KL "free information" floor (per-dim KL intractable
    # through the flow; losses.free_information_kl).
    if cfg.train.flow_dispersion_penalty > 0.0 and (
            not flow_prior or cfg.train.objective != "elbo"):
        # Loud, not silent: the penalty regularizes the trained flow's
        # inverse and lives in the elbo g_phase — on any other config it
        # would be a no-op knob recording a phantom arm.
        raise ValueError(
            "train.flow_dispersion_penalty requires model.prior='flow' "
            "and train.objective='elbo'")
    # biadversarial = learned_prior's z-space D PLUS a pixel-space conv D
    # on decoded reconstructions; both live under d_params ({'latent':…,
    # 'pixel':…}) and share ONE optimizer/n_critic schedule, so the
    # checkpoint tree stays config-determined (models.latent_d_params is
    # the eval-side accessor).
    biadv = adv and cfg.adversarial.variant == "biadversarial"
    disc = make_latent_d(cfg.adversarial) if adv else None
    pxd = (PixelDiscriminator(tuple(cfg.adversarial.pixel_d_widths))
           if biadv else None)
    tx = _make_optimizer(cfg)
    d_tx = _make_d_optimizer(cfg) if adv else None

    def encode(params, x):
        return model.apply({"params": params}, x, method="encode")

    def decode(params, z):
        return model.apply({"params": params}, z, method="decode")

    def d_apply(d_params, z):
        return disc.apply({"params": d_params}, z)

    def prior_lp(params, z):
        """log p(z) under the model's own prior — the trained flow when
        model.prior='flow' (its params live INSIDE `params`, so the same
        value_and_grad trains it; the ELBO's −β·E_q[log q − log p_θ] term
        is, for the flow leaves, maximum likelihood on posterior
        samples)."""
        return model.apply({"params": params}, z, method="prior_logpdf")

    def px_apply(px_params, x):
        return pxd.apply({"params": px_params}, x)

    def d_lat(d_params):
        return d_params["latent"] if biadv else d_params

    # -- init ---------------------------------------------------------------

    def init_fn(rng: jax.Array) -> TrainState:
        # The pixel D's key is folded from k_disc rather than widening the
        # split: split(rng, 4) would shift EVERY variant's init streams and
        # silently de-reproduce all recorded seeded runs.
        k_model, k_disc, k_state = jax.random.split(rng, 3)
        k_px = jax.random.fold_in(k_disc, 1)
        h, w, c = cfg.model.image_shape
        x_dummy = jnp.zeros((2, h, w, c), jnp.float32)
        z_dummy = jnp.zeros((2, cfg.model.z_dim), jnp.float32)
        params = model.init(k_model, x_dummy, z_dummy)["params"]
        if adv:
            d_params = disc.init(k_disc, z_dummy)["params"]
            if biadv:
                d_params = {"latent": d_params,
                            "pixel": pxd.init(k_px, x_dummy)["params"]}
            d_opt_state = d_tx.init(d_params)
        else:
            d_params, d_opt_state = {}, ()
        ema = (jax.tree.map(jnp.copy, params)
               if cfg.train.ema_decay > 0.0 else {})
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), d_params=d_params,
                          d_opt_state=d_opt_state, rng=k_state,
                          ema_params=ema)

    # -- phases -------------------------------------------------------------

    h_, w_, c_ = cfg.model.image_shape
    # mean_per_dim: scale the scalar objective by 1/pixels so grad norms
    # are O(1) and the global-norm clip only fires on genuine spikes
    # (with 'sum', CIFAR grad norms are ~1e6 and the clip is always
    # active — see TrainConfig.loss_reduction). Adam makes the update
    # otherwise identical; reported metrics stay in nats.
    if cfg.train.loss_reduction == "mean_per_dim":
        loss_scale = 1.0 / float(h_ * w_ * c_)
    elif cfg.train.loss_reduction == "sum":
        loss_scale = 1.0
    else:
        raise ValueError(
            f"unknown loss_reduction {cfg.train.loss_reduction!r} "
            "(sum|mean_per_dim)")

    if cfg.train.objective not in ("elbo", "iwae"):
        raise ValueError(
            f"unknown train.objective {cfg.train.objective!r} (elbo|iwae)")
    if cfg.train.objective == "iwae" and cfg.train.free_bits > 0.0:
        raise ValueError(
            "train.free_bits applies to the elbo objective only: the IWAE "
            "bound has no per-dimension KL term to floor")

    def g_phase_iwae(state: TrainState, x_in, x_target, key, beta):
        """G update on the IWAE-k bound (train.objective=iwae): the
        multi-sample importance-weighted objective with the configured
        gradient estimator; adversarial coupling mirrors the elbo path
        (see losses.iwae_objective)."""
        d_fn = px_fn = None
        if adv:
            d_params = jax.lax.stop_gradient(state.d_params)
            d_fn = lambda z: d_apply(d_lat(d_params), z)
            if biadv:
                px_fn = lambda x: px_apply(d_params["pixel"], x)

        def loss_fn(params):
            objective, aux, z_q = L.iwae_objective(
                encode, decode, params, x_in, x_target, key,
                cfg.model.likelihood, cfg.train.iwae_k, beta,
                cfg.train.iwae_grad,
                prior_logpdf_p=prior_lp if trainable_prior else None,
                d_apply=d_fn,
                adv_variant=cfg.adversarial.variant if adv else None,
                adv_weight=cfg.adversarial.weight, px_apply=px_fn,
                px_weight=cfg.adversarial.pixel_weight if biadv else 0.0)
            aux["elbo"] = aux["recon"] - aux["kl"]   # MC-ELBO for reporting
            if adv:
                aux["z_q"] = z_q
            return -objective * loss_scale, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        z_q = aux.pop("z_q", None)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return state.replace(params=params, opt_state=opt_state), aux, z_q

    def g_phase(state: TrainState, x_in, x_target, key, beta):
        def loss_fn(params):
            mean, logvar = encode(params, x_in)
            z = ops.reparam_sample(key, mean, logvar)
            out = decode(params, z)
            recon = L.recon_log_likelihood(x_target, out,
                                           cfg.model.likelihood)
            if flow_prior:
                # Single-sample MC KL(q‖p_θ) = log q(z|x) − log p_θ(z):
                # no closed form against a flow; the reparam gradient
                # reaches the encoder through both terms and the flow
                # through log p_θ.
                from apv_tpu.core import distributions as D
                lq = jnp.sum(D.gaussian_logpdf(z, mean, logvar), axis=-1)
                kl = lq - prior_lp(params, z)
            elif gauss_prior:
                # Analytic KL against the trainable base N(μ, σ²): the
                # (μ, log σ) gradient of −β·KL is moment matching to the
                # aggregate posterior — the ex-post diagonal fit, learned
                # continuously (models/gaussian_prior.py).
                from apv_tpu.core import distributions as D
                gp = params["gaussian_prior"]
                kl = jnp.sum(D.gaussian_kl(mean, logvar, gp["mu"],
                                           2.0 * gp["log_sigma"]), axis=-1)
            else:
                kl = ops.kl_standard(mean, logvar)
            aux = {"recon": jnp.mean(recon), "kl": jnp.mean(kl)}
            per_sample = recon                   # non-KL objective terms [B]
            if adv:
                sg_d = jax.lax.stop_gradient(state.d_params)
                d_logits = d_apply(d_lat(sg_d), z)
                adv_term = L.generator_adv_term(d_logits,
                                                cfg.adversarial.variant)
                # learned_prior: D(z) is part of log p*(z), so it carries
                # the same β as the KL (log p*(z) = log p0(z) + D(z) - logZ
                # enters the ELBO's prior term); unscaled it overwhelms the
                # objective during β warmup (observed: D saturates, g_adv
                # grows unchecked). AAE's regularizer is independent of β.
                adv_w = cfg.adversarial.weight
                if cfg.adversarial.variant in ("learned_prior",
                                               "biadversarial"):
                    adv_w = adv_w * beta
                per_sample = per_sample + adv_w * adv_term
                aux["g_adv"] = jnp.mean(adv_term)
                aux["z_q"] = jax.lax.stop_gradient(z)
                if biadv:
                    # Pixel-space adversarial term on the decoded mean:
                    # β-independent (a data-space regularizer, not part of
                    # the prior); gradient reaches the decoder through x̂.
                    x_hat = L.likelihood_pixel_mean(
                        out, cfg.model.likelihood, x_target.shape[-1])
                    px_term = L.pixel_g_term(px_apply(sg_d["pixel"], x_hat))
                    per_sample = per_sample + (cfg.adversarial.pixel_weight
                                               * px_term)
                    aux["g_px"] = jnp.mean(px_term)
                    aux["x_hat"] = jax.lax.stop_gradient(x_hat)
            # KL objective term: plain batch-mean KL, or the free-bits
            # floored version (gradient-only change; metrics stay true KL).
            # The floor is prior-family-aware (see the note at the top of
            # make_train_fns).
            if cfg.train.free_bits > 0.0:
                if gauss_prior:
                    gp = params["gaussian_prior"]
                    kl_obj = L.free_bits_kl_gaussian_base(
                        mean, logvar, gp["mu"], 2.0 * gp["log_sigma"],
                        cfg.train.free_bits)
                elif flow_prior:
                    kl_obj = L.free_information_kl(kl, cfg.model.z_dim,
                                                   cfg.train.free_bits)
                else:
                    kl_obj = L.free_bits_kl(mean, logvar,
                                            cfg.train.free_bits)
            else:
                kl_obj = jnp.mean(kl)
            objective = jnp.mean(per_sample) - beta * kl_obj
            if flow_prior and cfg.train.flow_dispersion_penalty > 0.0:
                # Inverse-dispersion penalty (TrainConfig docstring): one
                # extra inverse pass per step on a fresh base batch —
                # 2·n_layers tiny matmuls, negligible next to the conv
                # decoder. fold_in (not a wider split) keeps every
                # existing config's RNG streams bit-identical.
                u = jax.random.normal(jax.random.fold_in(key, 1),
                                      z.shape, jnp.float32)
                z_s = model.apply({"params": params}, u,
                                  method="prior_sample_from")
                m_s = jnp.mean(jnp.sum(jnp.square(z_s), axis=-1))
                m_q = jax.lax.stop_gradient(
                    jnp.mean(jnp.sum(jnp.square(z), axis=-1)))
                excess = jnp.maximum(m_s / m_q - 1.0, 0.0)
                objective = objective - (cfg.train.flow_dispersion_penalty
                                         * jnp.square(excess))
                aux["flow_dispersion"] = m_s / m_q
            loss = -objective * loss_scale
            aux["elbo"] = jnp.mean(recon - kl)   # plain ELBO for reporting
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        z_q = aux.pop("z_q", None)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return state.replace(params=params, opt_state=opt_state), aux, z_q

    def d_phase(state: TrainState, x_in, x_target, key, z_q=None,
                x_hat=None):
        """One discriminator update; ``z_q``/``x_hat`` reuse the G forward's
        posterior samples / decoded means (saves a full encoder — and for
        biadversarial a decoder — pass; see train_step). Biadversarial
        updates BOTH discriminators jointly: latent BCE on {z_q vs z_p} +
        pixel BCE on {x_target (real) vs x̂ (fake)}."""
        k_post, k_prior = jax.random.split(key)
        if z_q is None:
            # Posterior samples with NO gradient into the VAE.
            mean, logvar = encode(jax.lax.stop_gradient(state.params), x_in)
            z_q = ops.reparam_sample(k_post, mean, logvar)
            z_q = jax.lax.stop_gradient(z_q)
        z_p = jax.random.normal(k_prior, z_q.shape, jnp.float32)
        if gauss_prior:
            # The D separates q(z) from the model's own base N(μ,σ), so
            # the shaped prior is p*(z) ∝ N(μ,σ)·e^{D(z)}. The base is
            # stop-gradiented: the D phase updates only d_params (the base
            # trains in the G phase through the analytic KL).
            z_p = model.apply(
                {"params": jax.lax.stop_gradient(state.params)}, z_p,
                method="prior_sample_from")
        if biadv and x_hat is None:
            out = decode(jax.lax.stop_gradient(state.params), z_q)
            x_hat = jax.lax.stop_gradient(L.likelihood_pixel_mean(
                out, cfg.model.likelihood, x_target.shape[-1]))

        def loss_fn(d_params):
            dl = d_lat(d_params)
            d_loss, d_acc = L.discriminator_loss(
                d_apply(dl, z_q), d_apply(dl, z_p),
                cfg.adversarial.label_smoothing)
            aux = {"d_loss": d_loss, "d_acc": d_acc}
            total = d_loss
            gamma = cfg.adversarial.r1_gamma
            if gamma > 0.0:
                # R1 zero-centered gradient penalty on the REAL side
                # (class 1 = posterior samples; Mescheder et al. 2018,
                # arXiv 1801.04406 eq. 9): γ/2·E_q‖∇_z D(z)‖² — the
                # standard fix for D saturation (observed: d_acc pins at
                # 1.0 on the CIFAR runs). Nested grad: the penalty is a
                # function of d_params through ∇_z, so autodiff carries
                # d(r1)/d(d_params) through a second backward.
                r1 = L.r1_penalty(lambda z: d_apply(dl, z), z_q)
                aux["d_r1"] = r1
                total = total + gamma * r1
            if biadv:
                # Real images → class 1, decoded means → class 0 (same
                # convention as the latent D's posterior-vs-prior split).
                px_loss, px_acc = L.discriminator_loss(
                    px_apply(d_params["pixel"], x_target),
                    px_apply(d_params["pixel"], x_hat),
                    cfg.adversarial.label_smoothing)
                aux.update(px_d_loss=px_loss, px_d_acc=px_acc)
                total = total + px_loss
                if gamma > 0.0:
                    # Same regularizer on the image D (StyleGAN-style R1
                    # on real images).
                    px_r1 = L.r1_penalty(
                        lambda x: px_apply(d_params["pixel"], x), x_target)
                    aux["px_d_r1"] = px_r1
                    total = total + gamma * px_r1
            return total, aux

        (_, d_metrics), d_grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params)
        updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
        if cfg.adversarial.d_lr_schedule == "floor_adaptive":
            # Floor-tracking D throttle: scale this update by how far the
            # LATENT D's loss sits above its analytic optimum (2·H(s) with
            # label smoothing s; 0.650 at s=0.1 — the exact plateau the
            # saturated CIFAR runs pin at). At the floor D stops
            # strengthening (factor→0); if G then moves and d_loss rises
            # back toward the chance plateau (2·ln2), the factor recovers —
            # a self-correcting equilibrium brake, unlike the open-loop
            # cosine decay. Adam's moments still accumulate full gradients,
            # so re-engagement is immediate.
            floor = L.d_loss_floor(cfg.adversarial.label_smoothing)
            chance = 2.0 * jnp.log(2.0)

            def _throttle(loss):
                return jnp.clip((loss - floor) / (chance - floor), 0.0, 1.0)

            factor = _throttle(d_metrics["d_loss"])
            if biadv:
                # Each D gets its OWN factor from its OWN loss (both BCEs
                # share the smoothing floor): a saturated latent D must
                # not freeze the pixel D's updates, and vice versa
                # (round-4 advisor finding).
                px_factor = _throttle(d_metrics["px_d_loss"])
                updates = {
                    "latent": jax.tree.map(lambda u: u * factor,
                                           updates["latent"]),
                    "pixel": jax.tree.map(lambda u: u * px_factor,
                                          updates["pixel"]),
                }
                d_metrics = dict(d_metrics, d_lr_factor=factor,
                                 px_d_lr_factor=px_factor)
            else:
                updates = jax.tree.map(lambda u: u * factor, updates)
                d_metrics = dict(d_metrics, d_lr_factor=factor)
        d_params = optax.apply_updates(state.d_params, updates)
        return (state.replace(d_params=d_params, d_opt_state=d_opt_state),
                d_metrics)

    # -- validation step (periodic Evaluator.run() parity, SURVEY.md §3.1) --

    def eval_step(state: TrainState, batch: dict):
        """Single-sample ELBO on a batch; deterministic in (rng, batch)."""
        key = jax.random.fold_in(state.rng, 0x7FFFFFFF)
        k_deq, k_z = jax.random.split(key)
        x_in, x_target = prepare_batch(cfg, batch, k_deq)
        if trainable_prior:
            # Single-sample MC KL against the model's own trained prior
            # (exact enough for the validation metric; the gaussian
            # training path uses the analytic form).
            from apv_tpu.core import distributions as D
            mean, logvar = encode(state.params, x_in)
            z = ops.reparam_sample(k_z, mean, logvar)
            out = decode(state.params, z)
            recon = L.recon_log_likelihood(x_target, out,
                                           cfg.model.likelihood)
            kl = (jnp.sum(D.gaussian_logpdf(z, mean, logvar), axis=-1)
                  - prior_lp(state.params, z))
        else:
            recon, kl, _ = L.elbo_terms(encode, decode, state.params, x_in,
                                        x_target, k_z, cfg.model.likelihood)
        return {"valid_elbo": jnp.mean(recon - kl),
                "valid_recon": jnp.mean(recon), "valid_kl": jnp.mean(kl)}

    # -- the step -----------------------------------------------------------

    def train_step(state: TrainState, batch: dict):
        step_key = jax.random.fold_in(state.rng, state.step)
        k_deq, k_g, *k_ds = jax.random.split(
            step_key, 2 + max(cfg.adversarial.n_critic, 1))
        x_in, x_target = prepare_batch(cfg, batch, k_deq)
        beta = _beta(cfg, state.step)

        metrics = {}

        def run_d_phases(state, z_q=None, x_hat=None):
            # n_critic D updates; metrics are the MEAN over critic steps
            # (n_critic=0 is a valid knob: skip D entirely, report nothing).
            d_ms = []
            for i in range(cfg.adversarial.n_critic):
                state, dm = d_phase(state, x_in, x_target, k_ds[i],
                                    z_q=z_q, x_hat=x_hat)
                d_ms.append(dm)
            if d_ms:
                metrics.update({k: jnp.mean(jnp.stack([m[k] for m in d_ms]))
                                for k in d_ms[0]})
            return state

        if adv and not cfg.adversarial.d_reuse_posterior:
            # Reference order (SURVEY.md §3.2): D step(s), then G step,
            # with the D phase encoding its own posterior samples.
            state = run_d_phases(state)
        g_fn = g_phase_iwae if cfg.train.objective == "iwae" else g_phase
        state, g_metrics, z_q = g_fn(state, x_in, x_target, k_g, beta)
        x_hat = g_metrics.pop("x_hat", None)
        metrics.update(g_metrics)
        if adv and cfg.adversarial.d_reuse_posterior:
            # G-then-D variant: D reuses the G forward's posterior samples
            # (z_q drawn under pre-update params, exactly what a D-first
            # step would have seen) — saves one full encoder forward per
            # step. Fresh prior samples per critic step either way.
            state = run_d_phases(state, z_q=z_q, x_hat=x_hat)
        if cfg.train.ema_decay > 0.0:
            d = cfg.train.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, state.params))
        metrics["beta"] = beta
        state = state.replace(step=state.step + 1)
        return state, metrics

    def multi_step(state: TrainState, stacked_batch: dict):
        """Scan ``train_step`` over a batch stack [k, B, ...] in ONE XLA
        dispatch. The body is traced once (compile time is k-independent);
        per-step PRNG folding/β-anneal/schedules all key off state.step, so
        k steps here are bit-identical to k separate dispatches."""
        return jax.lax.scan(train_step, state, stacked_batch)

    return TrainFns(init_fn=init_fn, train_step=train_step,
                    multi_step=multi_step, eval_step=eval_step, model=model,
                    discriminator=disc)
