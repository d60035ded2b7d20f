"""model.prior='gaussian' — the trainable diagonal-Gaussian base that
composes with the adversarial D (p*(z) ∝ N(μ,σ)·e^{D(z)}).

Key invariant: zero-init (μ=0, log σ=0) makes every path EXACTLY the
prior='standard' model, so the standard numbers are reproduced until the
base moves (models/gaussian_prior.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from apv_tpu.training.step import make_train_fns


def _batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    h, w, c = cfg.model.image_shape
    return {"image": (rng.random((n, h, w, c)) < 0.3).astype(np.float32)}


def test_zero_init_matches_standard_prior():
    """At init the gaussian prior IS N(0,I): logpdf and sample_from match
    the standard prior exactly, and the encoder/decoder init streams are
    untouched by the extra prior params."""
    from apv_tpu.models import build_model

    cfg_g = tiny_config("mnist_advprior", **{"model.prior": "gaussian"})
    cfg_s = tiny_config("mnist_advprior")
    m_g, m_s = build_model(cfg_g.model), build_model(cfg_s.model)
    x = jnp.zeros((2, 28, 28, 1))
    z = jnp.zeros((2, cfg_g.model.z_dim))
    p_g = m_g.init(jax.random.PRNGKey(0), x, z)["params"]
    p_s = m_s.init(jax.random.PRNGKey(0), x, z)["params"]
    assert "gaussian_prior" in p_g
    # sibling modules' init streams unchanged (flax path-keyed RNGs)
    np.testing.assert_array_equal(
        p_g["encoder"]["gaussian_head"]["kernel"],
        p_s["encoder"]["gaussian_head"]["kernel"])

    zs = jax.random.normal(jax.random.PRNGKey(1), (64, cfg_g.model.z_dim))
    lp_g = m_g.apply({"params": p_g}, zs, method="prior_logpdf")
    lp_s = m_s.apply({"params": p_s}, zs, method="prior_logpdf")
    np.testing.assert_allclose(np.asarray(lp_g), np.asarray(lp_s),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(m_g.apply({"params": p_g}, zs,
                             method="prior_sample_from")), np.asarray(zs))


def test_gaussian_base_trains_to_aggregate_posterior():
    """The KL gradient moment-matches (μ, σ) to the aggregate posterior:
    after training on data whose posterior the encoder maps off-center,
    μ tracks the aggregate posterior mean."""
    cfg = tiny_config("mnist_advprior", **{"model.prior": "gaussian",
                                           "train.lr": "5e-3"})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    for _ in range(60):
        state, m = step(state, batch)
    mu = np.asarray(state.params["gaussian_prior"]["mu"])
    assert np.linalg.norm(mu) > 1e-2, "base never moved"
    # aggregate posterior mean after training
    enc = fns.model.apply({"params": state.params},
                          jnp.asarray(batch["image"]), method="encode")[0]
    agg = np.asarray(jnp.mean(enc, axis=0))
    cos = float(mu @ agg / (np.linalg.norm(mu) * np.linalg.norm(agg) + 1e-9))
    assert cos > 0.5, (cos, mu[:4], agg[:4])
    assert np.isfinite(float(m["loss"]))


def test_eval_composition_matches_standard_at_init():
    """evaluate_nll on a gaussian+adversarial checkpoint at init equals the
    standard+adversarial model with identical weights — the shaped-prior
    correction composes over the (identity) base, and log Z is estimated
    under the same base."""
    from apv_tpu.eval.run import evaluate_nll

    cfg_g = tiny_config("mnist_advprior", **{"model.prior": "gaussian"})
    cfg_s = tiny_config("mnist_advprior")
    fns_g, fns_s = make_train_fns(cfg_g), make_train_fns(cfg_s)
    st_g = fns_g.init_fn(jax.random.PRNGKey(0))
    st_s = fns_s.init_fn(jax.random.PRNGKey(0))
    r_g = evaluate_nll(cfg_g, st_g.params, st_g.d_params, k=20, chunk=10,
                       max_examples=32)
    r_s = evaluate_nll(cfg_s, st_s.params, st_s.d_params, k=20, chunk=10,
                       max_examples=32)
    assert abs(r_g["nll_nats"] - r_s["nll_nats"]) < 1e-3, (r_g, r_s)
    assert abs(r_g["log_partition"] - r_s["log_partition"]) < 1e-4


def test_log_partition_under_shifted_base():
    """log Z = log E_base[e^D]: with D(z) = a·z₁ and base N(μ, I),
    log Z = a·μ₁ + a²/2 (Gaussian MGF) — the base_from hook is exact."""
    from apv_tpu.eval.iwae_eval import estimate_log_partition

    a, mu1 = 0.7, 1.3

    def d_apply(dp, z):
        return a * z[:, 0]

    def base_from(u):
        return u.at[:, 0].add(mu1)

    log_z = float(estimate_log_partition(d_apply, None, 8,
                                         jax.random.PRNGKey(0),
                                         n=200_000, batch=10_000,
                                         base_from=base_from))
    want = a * mu1 + 0.5 * a * a
    assert abs(log_z - want) < 0.02, (log_z, want)


def test_sampling_rides_the_learned_base():
    """sample_prior with base_from/base_logp: the SIR pool lives on the
    base (shifted mean shows in the draws), and MALA accepts healthily on
    the composed target."""
    from apv_tpu.sampling.run import sample_prior

    shift = 3.0

    def base_from(u):
        return u + shift

    def base_logp(z):
        return -0.5 * jnp.sum((z - shift) ** 2, axis=-1)

    def d_apply(dp, z):
        return jnp.zeros(z.shape[:-1])     # neutral D: draws == base

    z, diag = sample_prior(jax.random.PRNGKey(0), 512, 8,
                           d_apply=d_apply, d_params=None,
                           refine_steps=5, return_diagnostics=True,
                           base_from=base_from, base_logp=base_logp)
    m = float(jnp.mean(z))
    assert abs(m - shift) < 0.2, m
    assert diag["mala_accept_rate"] > 0.3
    # pairing is enforced
    import pytest
    with pytest.raises(ValueError, match="pair"):
        sample_prior(jax.random.PRNGKey(0), 8, 4, base_from=base_from)


def test_temperature_tempers_the_gaussian_base():
    """--temperature on a gaussian-base checkpoint: z = μ + T·σ·u
    (round-4 weak-4 fix — the guard used to reject T≠1 on gb while the
    help text advertised it). T=1 reproduces the default path bit-exact,
    T<1 shrinks the draw dispersion around μ, and MALA refinement runs
    against the consistently-tempered base target."""
    from apv_tpu.models import d_apply_fn, make_latent_d
    from apv_tpu.sampling.run import generate_samples

    cfg = tiny_config("mnist_advprior", **{"model.prior": "gaussian"})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    # move the base off N(0,I) so tempering is observable in z-space
    params = state.params.copy()
    gp = dict(params["gaussian_prior"])
    gp["mu"] = jnp.full_like(gp["mu"], 2.0)
    gp["log_sigma"] = jnp.full_like(gp["log_sigma"], 0.5)
    params["gaussian_prior"] = gp
    kw = dict(likelihood=cfg.model.likelihood, image_channels=1,
              d_apply=d_apply_fn(make_latent_d(cfg.adversarial)),
              d_params=state.d_params, model_base=True, mode="mean")
    key = jax.random.PRNGKey(3)
    img_t1 = generate_samples(fns.model, params, key, 8, cfg.model.z_dim,
                              temperature=1.0, **kw)
    img_default = generate_samples(fns.model, params, key, 8,
                                   cfg.model.z_dim, **kw)
    img_t03 = generate_samples(fns.model, params, key, 8, cfg.model.z_dim,
                               temperature=0.3, **kw)
    np.testing.assert_array_equal(np.asarray(img_t1),
                                  np.asarray(img_default))
    assert not np.array_equal(np.asarray(img_t03), np.asarray(img_t1))
    # z-space check: tempered draws concentrate around μ=2, σ_eff = T·σ
    from apv_tpu.sampling.run import sample_prior
    T, sig = 0.3, float(jnp.exp(0.5))

    def base_from(u):
        return fns.model.apply({"params": params}, T * u,
                               method="prior_sample_from")

    z = sample_prior(jax.random.PRNGKey(5), 4096, cfg.model.z_dim,
                     base_from=base_from, base_logp=lambda zz: zz.sum(-1))
    assert abs(float(jnp.mean(z)) - 2.0) < 0.05
    assert abs(float(jnp.std(z)) - T * sig) < 0.05
    # refine path composes with tempering without error
    img_ref = generate_samples(fns.model, params, jax.random.PRNGKey(9), 4,
                               cfg.model.z_dim, refine_steps=2,
                               temperature=0.5, **kw)
    assert np.isfinite(np.asarray(img_ref)).all()


def test_train_eval_sample_e2e_smoke():
    """Gaussian+adversarial end to end: train a few steps, evaluate under
    the composed prior, draw samples through the model_base path."""
    from apv_tpu.eval.run import evaluate_nll
    from apv_tpu.models import d_apply_fn, make_latent_d
    from apv_tpu.sampling.run import generate_samples

    cfg = tiny_config("mnist_advprior", **{"model.prior": "gaussian"})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    for _ in range(10):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    r = evaluate_nll(cfg, state.params, state.d_params, k=10, chunk=5,
                     max_examples=32)
    assert np.isfinite(r["nll_nats"])
    imgs = generate_samples(
        fns.model, state.params, jax.random.PRNGKey(0), 8,
        cfg.model.z_dim, cfg.model.likelihood, 1,
        d_apply=d_apply_fn(make_latent_d(cfg.adversarial)),
        d_params=state.d_params, model_base=True)
    assert imgs.shape == (8, 28, 28, 1)
    assert np.isfinite(np.asarray(imgs)).all()
