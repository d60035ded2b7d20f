"""MALA-refined shaped-prior sampling (sampling/run.py).

The adversarially-shaped prior p*(z) ∝ N(z;0,I)·e^{D(z)} is sampled by SIR;
when D is sharp the finite pool degenerates (ESS collapse), and
``refine_steps`` runs batched MALA chains from the SIR draws. These tests
pin the sampler against analytically-known shaped priors: a quadratic
D(z) = −½(a−1)‖z‖² makes p*(z) exactly N(0, I/a).
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config


def _quadratic_d(a: float):
    """D whose shaped prior is exactly N(0, I/a)."""

    def d_apply(dp, z):
        return -0.5 * (a - 1.0) * jnp.sum(z * z, axis=-1)

    return d_apply


def test_sir_ess_bounds():
    from apv_tpu.sampling.run import sir_ess

    n = 512
    uniform = jnp.zeros((n,))
    np.testing.assert_allclose(float(sir_ess(uniform)), n, rtol=1e-5)
    one_hot = jnp.where(jnp.arange(n) == 3, 0.0, -1e4)
    np.testing.assert_allclose(float(sir_ess(one_hot)), 1.0, rtol=1e-5)


def test_refine_zero_is_plain_sir():
    """refine_steps=0 must leave the SIR draw untouched (bit-identical),
    so existing SIR consumers (serving export, OOD) are unaffected."""
    from apv_tpu.sampling.run import sample_prior

    d_apply = _quadratic_d(2.0)
    key = jax.random.PRNGKey(0)
    a = sample_prior(key, 64, 4, d_apply=d_apply, d_params=None)
    b, diag = sample_prior(key, 64, 4, d_apply=d_apply, d_params=None,
                           refine_steps=0, return_diagnostics=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "sir_ess" in diag and "mala_accept_rate" not in diag


def test_mala_targets_shaped_prior_moments():
    """A sharp SHIFTED quadratic D — D(z) = −½(a−1)‖z−m‖², shaped prior
    exactly N(((a−1)/a)·m, I/a) — is the SIR-degenerate regime this
    refinement exists for: the N(0,I) proposal almost never lands near
    the target mode, the pool's ESS collapses toward 1, and the SIR
    draws are biased toward the origin. MALA must recover the true
    moments and beat SIR's mean error."""
    from apv_tpu.sampling.run import sample_prior

    a, m = 4.0, 2.5

    def d_apply(dp, z):
        return -0.5 * (a - 1.0) * jnp.sum((z - m) ** 2, axis=-1)

    mean_target = (a - 1.0) / a * m          # 1.875
    var_target = 1.0 / a                     # 0.25
    key = jax.random.PRNGKey(42)
    kwargs = dict(d_apply=d_apply, d_params=None, pool_factor=4)
    z_sir = sample_prior(key, 1024, 8, **kwargs)
    z_ref, diag = sample_prior(key, 1024, 8, refine_steps=300,
                               return_diagnostics=True, **kwargs)
    err_sir = abs(float(jnp.mean(z_sir)) - mean_target)
    err_ref = abs(float(jnp.mean(z_ref)) - mean_target)
    assert float(diag["sir_ess"]) < 10.0, diag      # the degenerate regime
    assert err_ref < 0.1, (float(jnp.mean(z_ref)), mean_target)
    assert err_ref < err_sir, (err_ref, err_sir)
    var_ref = float(jnp.var(z_ref))
    assert abs(var_ref - var_target) < 0.15 * var_target, var_ref
    # the adaptive step must settle in a healthy Metropolis regime
    assert 0.3 < float(diag["mala_accept_rate"]) < 0.95, diag


def test_langevin_refine_pure_gaussian():
    """MALA on the plain N(0,I) log-density from a deliberately wrong
    initialization must recover unit variance — isolates the kernel from
    the SIR stage."""
    from apv_tpu.sampling.run import langevin_refine

    def logp(z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (512, 16))
    z, rate, eps = langevin_refine(jax.random.PRNGKey(1), z0, logp, 400)
    assert abs(float(jnp.var(z)) - 1.0) < 0.1
    assert 0.3 < float(rate) < 0.95
    assert float(eps) > 0.0


def test_refine_without_discriminator_raises():
    """Regression (round-3 review): silently skipping the refinement on a
    plain-prior model would let an A/B protocol record refined-vs-
    unrefined metrics that are the same protocol."""
    import pytest

    from apv_tpu.sampling.run import langevin_refine, sample_prior

    with pytest.raises(ValueError, match="no latent discriminator"):
        sample_prior(jax.random.PRNGKey(0), 8, 4, refine_steps=5)
    with pytest.raises(ValueError, match="steps >= 1"):
        langevin_refine(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                        lambda z: -jnp.sum(z * z, -1), 0)


def test_latent_scatter_data_adversarial():
    """The scatter data carries all three clouds as [N,2] PC projections,
    the posterior cloud is exactly centered (it defines the PCs), and the
    explained-variance fraction is a valid ratio."""
    from apv_tpu.models import (LatentDiscriminator, build_model,
                                d_apply_fn)
    from apv_tpu.sampling.latent_viz import latent_scatter_data
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_advprior")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    d_apply = d_apply_fn(
        LatentDiscriminator(tuple(cfg.adversarial.d_widths)))
    x = jnp.zeros((32,) + tuple(cfg.model.image_shape), jnp.float32)
    data = latent_scatter_data(model, state.params, x,
                               jax.random.PRNGKey(1), cfg.model.z_dim,
                               d_apply=d_apply, d_params=state.d_params,
                               refine_steps=3)
    for key in ("posterior", "prior", "shaped_prior", "expost_prior"):
        assert data[key].shape == (32, 2), (key, data[key].shape)
    np.testing.assert_allclose(data["posterior"].mean(0), 0.0, atol=1e-6)
    assert 0.0 <= data["explained"] <= 1.0

    plain = latent_scatter_data(model, state.params, x,
                                jax.random.PRNGKey(1), cfg.model.z_dim)
    assert "shaped_prior" not in plain


def test_visualize_latent_writes_png(tmp_path):
    import apv_tpu

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    data = apv_tpu.visualize(cfg, what="latent", n=16, refine=2)
    assert (tmp_path / cfg.name / "latent_scatter.png").exists()
    assert data["posterior"].shape[1] == 2


def test_expost_prior_moments_and_draws():
    """The ex-post prior moments must match the law-of-total-variance
    computation over the encoder's outputs, and draws from them must
    reproduce those moments."""
    from apv_tpu.models import build_model
    from apv_tpu.sampling.run import expost_prior_moments, generate_samples
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_vae")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (32,) + tuple(cfg.model.image_shape))

    agg_mean, agg_var = expost_prior_moments(model, state.params, x)
    mean, logvar = model.apply({"params": state.params}, x, method="encode")
    mean, logvar = np.asarray(mean), np.asarray(logvar)
    # jitted vs eager encoder passes reorder bf16 fusions — tolerance is
    # for compute-path noise, not the estimator
    np.testing.assert_allclose(np.asarray(agg_mean), mean.mean(0),
                               rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(agg_var),
        mean.var(0) + np.exp(logvar).mean(0), rtol=2e-2, atol=1e-4)

    imgs = generate_samples(model, state.params, jax.random.PRNGKey(2),
                            16, cfg.model.z_dim, cfg.model.likelihood, 1,
                            prior_moments=(agg_mean, agg_var))
    assert imgs.shape == (16,) + tuple(cfg.model.image_shape)

    import pytest
    with pytest.raises(ValueError, match="ex-post prior is sampled"):
        generate_samples(model, state.params, jax.random.PRNGKey(2),
                         16, cfg.model.z_dim, cfg.model.likelihood, 1,
                         prior_moments=(agg_mean, agg_var), refine_steps=3)


def test_fit_gmm_em_recovers_mixture():
    """EM on samples from a known well-separated 3-component diagonal GMM
    recovers the weights, means, and variances (up to component
    permutation)."""
    from apv_tpu.sampling.run import fit_gmm_em

    true_w = np.array([0.5, 0.3, 0.2])
    true_mu = np.array([[-6.0, 0.0], [6.0, 6.0], [6.0, -6.0]])
    true_var = np.array([[0.5, 1.0], [1.0, 0.25], [0.25, 0.5]])
    rng = np.random.default_rng(0)
    n = 6000
    ids = rng.choice(3, n, p=true_w)
    z = true_mu[ids] + np.sqrt(true_var[ids]) * rng.standard_normal((n, 2))

    log_w, mu, var = fit_gmm_em(jax.random.PRNGKey(3),
                                jnp.asarray(z, jnp.float32), 3, iters=100)
    w, mu, var = np.exp(np.asarray(log_w)), np.asarray(mu), np.asarray(var)
    # match fitted components to true ones by nearest mean
    perm = [int(np.argmin(np.sum((mu - m) ** 2, axis=1))) for m in true_mu]
    assert sorted(perm) == [0, 1, 2], "components collapsed"
    np.testing.assert_allclose(w[perm], true_w, atol=0.03)
    np.testing.assert_allclose(mu[perm], true_mu, atol=0.15)
    np.testing.assert_allclose(var[perm], true_var, rtol=0.25)

    import pytest
    with pytest.raises(ValueError, match="cannot fit"):
        fit_gmm_em(jax.random.PRNGKey(0), jnp.zeros((4, 2)), 5)


def test_expost_prior_sample_arity():
    """The draw-side owner handles both ex-post representations: Gaussian
    moments reproduce (mean, var); GMM draws reproduce the mixture's
    analytic moments E[z] = Σ w μ, Var = Σ w (v + μ²) − E[z]²."""
    from apv_tpu.sampling.run import expost_prior_sample

    key = jax.random.PRNGKey(0)
    mean, var = jnp.asarray([1.0, -2.0]), jnp.asarray([4.0, 0.25])
    z = np.asarray(expost_prior_sample(key, (mean, var), 40000, 2))
    np.testing.assert_allclose(z.mean(0), mean, atol=0.05)
    np.testing.assert_allclose(z.var(0), var, rtol=0.05)

    log_w = jnp.log(jnp.asarray([0.7, 0.3]))
    mus = jnp.asarray([[0.0, 0.0], [4.0, -4.0]])
    vs = jnp.asarray([[1.0, 1.0], [0.25, 4.0]])
    z = np.asarray(expost_prior_sample(key, (log_w, mus, vs), 60000, 2))
    w = np.asarray(jnp.exp(log_w))[:, None]
    want_mean = (w * mus).sum(0)
    want_var = (w * (np.asarray(vs) + np.asarray(mus) ** 2)).sum(0) \
        - want_mean ** 2
    np.testing.assert_allclose(z.mean(0), want_mean, atol=0.05)
    np.testing.assert_allclose(z.var(0), want_var, rtol=0.05)


def test_expost_gmm_prior_end_to_end():
    """Fit on a tiny model + decode: the GMM fit has sane shapes, weights
    normalize, K=1 matches the law-of-total-variance Gaussian fit, and
    generate_samples decodes from the 3-tuple."""
    from apv_tpu.models import build_model
    from apv_tpu.sampling.run import (expost_prior_gmm,
                                      expost_prior_moments,
                                      generate_samples)
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_vae")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (64,) + tuple(cfg.model.image_shape))

    log_w, mus, vs = expost_prior_gmm(model, state.params, x,
                                      jax.random.PRNGKey(2), k=4)
    zd = cfg.model.z_dim
    assert log_w.shape == (4,) and mus.shape == (4, zd) and vs.shape == (4, zd)
    np.testing.assert_allclose(float(jnp.exp(log_w).sum()), 1.0, rtol=1e-4)
    assert bool(jnp.all(vs > 0))

    # K=1: EM over posterior samples ≈ the exact total-variance moments
    log_w1, mu1, v1 = expost_prior_gmm(model, state.params, x,
                                       jax.random.PRNGKey(2), k=1,
                                       draws_per_x=8)
    agg_mean, agg_var = expost_prior_moments(model, state.params, x)
    np.testing.assert_allclose(float(log_w1[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu1[0]), np.asarray(agg_mean),
                               atol=0.1)
    np.testing.assert_allclose(np.asarray(v1[0]), np.asarray(agg_var),
                               rtol=0.35, atol=0.05)

    imgs = generate_samples(model, state.params, jax.random.PRNGKey(3),
                            16, zd, cfg.model.likelihood, 1,
                            prior_moments=(log_w, mus, vs))
    assert imgs.shape == (16,) + tuple(cfg.model.image_shape)


def test_sample_api_expost_gmm(tmp_path):
    import apv_tpu

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    imgs = apv_tpu.sample(cfg, n=8, prior="expost_gmm", gmm_k=3)
    assert imgs.shape == (8,) + tuple(cfg.model.image_shape)


def test_sample_api_expost_prior(tmp_path):
    import apv_tpu

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    imgs = apv_tpu.sample(cfg, n=8, prior="expost")
    assert imgs.shape == (8,) + tuple(cfg.model.image_shape)

    import pytest
    with pytest.raises(ValueError, match="auto\\|standard\\|expost"):
        apv_tpu.sample(cfg, n=8, prior="bogus")


def test_generate_samples_refined_end_to_end():
    """The jitted decode pass accepts refine_steps, returns diagnostics,
    and produces images in [0,1] of the right shape."""
    from apv_tpu.models import (LatentDiscriminator, build_model,
                                d_apply_fn)
    from apv_tpu.sampling.run import generate_samples
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_advprior")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    d_apply = d_apply_fn(
        LatentDiscriminator(tuple(cfg.adversarial.d_widths)))
    imgs, diag = generate_samples(
        model, state.params, jax.random.PRNGKey(0), 8, cfg.model.z_dim,
        cfg.model.likelihood, 1, d_apply=d_apply, d_params=state.d_params,
        mode="mean", refine_steps=5, return_diagnostics=True)
    assert imgs.shape == (8,) + tuple(cfg.model.image_shape)
    assert float(jnp.min(imgs)) >= 0.0 and float(jnp.max(imgs)) <= 1.0
    assert diag["mala_steps"] == 5
    assert 0.0 <= diag["mala_accept_rate"] <= 1.0
    assert diag["sir_ess"] >= 1.0
