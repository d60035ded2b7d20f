"""Eval / sampling / OOD integration tests on untrained tiny models
(SURVEY.md §4 "Integration")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from apv_tpu.eval.iwae_eval import estimate_log_partition, make_iwae_fn
from apv_tpu.eval.ood import auroc, ood_scores
from apv_tpu.eval.run import evaluate_nll
from apv_tpu.models import LatentDiscriminator, build_model
from apv_tpu.training.step import make_train_fns


def _init_state(cfg):
    fns = make_train_fns(cfg)
    return fns.init_fn(jax.random.PRNGKey(0))


def test_evaluate_nll_bernoulli_finite():
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    res = evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=32,
                       per_sample=True)
    assert np.isfinite(res["nll_nats"])
    assert res["num_examples"] == 32
    assert res["per_sample"].shape == (32,)
    # untrained model on binarized pixels: NLL within [0, 784*log2] *ish*
    assert 0 < res["nll_nats"] < 784 * 2.0
    np.testing.assert_allclose(res["bits_per_dim"],
                               res["nll_nats"] / (784 * np.log(2)),
                               rtol=1e-6)


def test_evaluate_nll_adversarial_disc_logistic():
    cfg = tiny_config("cifar_advprior_resnet")
    state = _init_state(cfg)
    res = evaluate_nll(cfg, state.params, state.d_params, k=4, chunk=2,
                       max_examples=16)
    assert np.isfinite(res["nll_nats"])
    assert res["adversarial_prior"] is True
    assert np.isfinite(res["log_partition"])


def test_diag_gmm_logpdf_matches_scipy():
    """K-component diagonal GMM log-density vs a scipy reference, and the
    K=1 w=1 degenerate case vs the plain Gaussian logpdf."""
    from scipy.stats import norm

    from apv_tpu.core.distributions import (diag_gmm_logpdf,
                                            gaussian_logpdf)

    rng = np.random.default_rng(0)
    z = rng.normal(0.0, 3.0, (7, 5, 3)).astype(np.float32)
    w = np.array([0.6, 0.3, 0.1])
    mus = rng.normal(0.0, 2.0, (3, 3)).astype(np.float32)
    vs = rng.uniform(0.2, 2.0, (3, 3)).astype(np.float32)

    got = np.asarray(diag_gmm_logpdf(jnp.asarray(z), jnp.log(jnp.asarray(w)),
                                     jnp.asarray(mus), jnp.asarray(vs)))
    comp = np.stack([norm.logpdf(z, mus[i], np.sqrt(vs[i])).sum(-1)
                     for i in range(3)], axis=-1)
    want = np.log(np.exp(comp + np.log(w)).sum(-1))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    one = np.asarray(diag_gmm_logpdf(jnp.asarray(z), jnp.zeros((1,)),
                                     jnp.asarray(mus[:1]),
                                     jnp.asarray(vs[:1])))
    plain = np.asarray(gaussian_logpdf(jnp.asarray(z), jnp.asarray(mus[0]),
                                       jnp.log(jnp.asarray(vs[0]))).sum(-1))
    np.testing.assert_allclose(one, plain, rtol=2e-5, atol=1e-5)


def test_evaluate_nll_expost_prior():
    """An ex-post standard-Gaussian (mean 0, var 1) must reproduce the
    standard-prior NLL EXACTLY (same key schedule, same estimator); a
    shifted ex-post prior must differ; GMM arity threads through; and
    combining with use_adversarial_prior raises."""
    import pytest

    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    zd = cfg.model.z_dim
    base = evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=16)
    std = evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=16,
                       prior_moments=(jnp.zeros((zd,)), jnp.ones((zd,))))
    np.testing.assert_allclose(std["nll_nats"], base["nll_nats"], rtol=1e-6)
    assert std["prior"] == "expost" and std["log_partition"] == 0.0

    shifted = evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=16,
                           prior_moments=(jnp.full((zd,), 2.0),
                                          jnp.ones((zd,))))
    assert abs(shifted["nll_nats"] - base["nll_nats"]) > 1e-3

    gmm = evaluate_nll(
        cfg, state.params, k=8, chunk=4, max_examples=16,
        prior_moments=(jnp.zeros((1,)), jnp.zeros((1, zd)),
                       jnp.ones((1, zd))))
    np.testing.assert_allclose(gmm["nll_nats"], base["nll_nats"], rtol=1e-6)
    assert gmm["prior"] == "expost_gmm"

    with pytest.raises(ValueError, match="mutually exclusive"):
        evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=16,
                     use_adversarial_prior=True,
                     prior_moments=(jnp.zeros((zd,)), jnp.ones((zd,))))


def test_evaluate_api_expost_gmm(tmp_path):
    """End-to-end: apv evaluate --prior expost_gmm on a tiny checkpoint
    fits the train split and reports finite NLL under the exact prior."""
    import apv_tpu

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64,
        "eval.iwae_k": 4, "eval.iwae_chunk": 2, "eval.max_examples": 16})
    apv_tpu.train(cfg)
    res = apv_tpu.evaluate(cfg, prior="expost_gmm", gmm_k=2,
                           activity=False)
    assert np.isfinite(res["nll_nats"])
    assert res["prior"] == "expost_gmm"
    assert res["adversarial_prior"] is False

    import pytest
    with pytest.raises(ValueError, match="model\\|expost\\|expost_gmm"):
        apv_tpu.evaluate(cfg, prior="bogus")


def test_active_units_streaming_moments():
    """IWAE-paper active-units rule on crafted means: a unit whose
    posterior mean varies across examples is active, a constant one is
    not; batched streaming equals the one-shot computation."""
    from apv_tpu.core.metrics import active_units
    rng = np.random.default_rng(0)
    means = np.stack([rng.normal(0.0, 1.0, 256),      # active (var ~ 1)
                      np.full(256, 0.37),             # collapsed (var 0)
                      rng.normal(5.0, 0.05, 256)],    # var 2.5e-3 < 1e-2
                     axis=1)
    count, var = active_units([means])
    assert count == 1
    assert var[0] > 1e-2 and var[1] < 1e-12 and var[2] < 1e-2
    count_b, var_b = active_units([means[:100], means[100:]])
    assert count_b == count
    np.testing.assert_allclose(var_b, var, atol=1e-12)


def test_posterior_activity_report():
    from apv_tpu.eval.run import posterior_activity
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    rep = posterior_activity(cfg, state.params, max_examples=32)
    assert 0 <= rep["active_units"] <= rep["z_dim"] == cfg.model.z_dim
    assert np.isfinite(rep["max_unit_variance"])
    assert rep["max_unit_variance"] >= rep["median_unit_variance"] >= 0


def test_iwae_more_k_not_worse():
    """On a fixed model, E[IWAE_k] improves with k; with shared seeds and
    modest variance a single comparison at k=1 vs k=32 should hold."""
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    r1 = evaluate_nll(cfg, state.params, k=1, chunk=1, max_examples=32,
                      seed=5)
    r32 = evaluate_nll(cfg, state.params, k=32, chunk=8, max_examples=32,
                       seed=5)
    assert r32["nll_nats"] <= r1["nll_nats"] + 1.0


def test_log_partition_of_zero_discriminator():
    """D ≡ const c ⇒ log Z = c exactly."""
    disc = LatentDiscriminator((8,))
    d_params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))["params"]
    # zero all weights -> logits identically bias=0 -> log Z = 0
    d_params = jax.tree.map(jnp.zeros_like, d_params)

    def d_apply(dp, z):
        return disc.apply({"params": dp}, z)

    lz = estimate_log_partition(d_apply, d_params, 4, jax.random.PRNGKey(1),
                                n=1000, batch=500)
    np.testing.assert_allclose(float(lz), 0.0, atol=1e-5)


def test_generate_samples_jit_cached():
    """Repeated generate_samples calls must reuse one jitted pass
    (regression: a fresh closure per call cost ~475 ms of retrace)."""
    from apv_tpu.sampling.run import _sample_fn, generate_samples
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    model = build_model(cfg.model)
    args = (model, 4, cfg.model.z_dim, cfg.model.likelihood, 1, "mean", None,
            0, False, False)
    assert _sample_fn(*args) is _sample_fn(*args)
    a = generate_samples(model, state.params, jax.random.PRNGKey(0), 4,
                         cfg.model.z_dim, cfg.model.likelihood, 1)
    b = generate_samples(model, state.params, jax.random.PRNGKey(0), 4,
                         cfg.model.z_dim, cfg.model.likelihood, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auroc():
    rng = np.random.default_rng(0)
    hi = rng.normal(2.0, 1.0, 500)
    lo = rng.normal(-2.0, 1.0, 500)
    assert auroc(hi, lo) > 0.95
    assert auroc(lo, hi) < 0.05
    assert abs(auroc(hi, hi) - 0.5) < 0.05


def test_fpr_at_tpr():
    from apv_tpu.eval.ood import fpr_at_tpr

    rng = np.random.default_rng(1)
    in_s = rng.normal(2.0, 1.0, 2000)
    # perfectly-separated OOD scores: zero false positives at any TPR
    assert fpr_at_tpr(in_s, in_s - 100.0) == 0.0
    # identical distributions: admitting 95% of in admits ~95% of ood
    other = rng.normal(2.0, 1.0, 2000)
    assert abs(fpr_at_tpr(in_s, other) - 0.95) < 0.03
    # analytic middle case: in ~ N(2,1), ood ~ N(0,1); the 95%-TPR
    # threshold is 2+Φ⁻¹(0.05) ≈ 0.355 ⇒ FPR = 1−Φ(0.355) ≈ 0.361
    shifted = rng.normal(0.0, 1.0, 4000)
    got = fpr_at_tpr(in_s, shifted, tpr=0.95)
    assert abs(got - 0.361) < 0.04, got


def test_ood_suite_runs_mnist_fashion():
    cfg = tiny_config("mnist_advprior", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "prior_ratio", "ood.iwae_k": 4, "ood.iwae_chunk": 2})
    state = _init_state(cfg)
    res = ood_scores(cfg, state.params, state.d_params)
    assert 0.0 <= res["auroc_in_vs_ood"] <= 1.0
    assert res["n_in"] == res["n_ood"] == 32
    np.testing.assert_allclose(res["auroc_in_vs_ood"],
                               1.0 - res["auroc_ood_vs_in"], atol=1e-9)


def test_ood_elbo_score_no_discriminator():
    cfg = tiny_config("mnist_vae", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "elbo"})
    state = _init_state(cfg)
    res = ood_scores(cfg, state.params)
    assert res["score"] == "elbo"
    assert 0.0 <= res["auroc_in_vs_ood"] <= 1.0


def test_complexity_nats_orders_by_compressibility():
    """The PNG codelength must be positive, per-example, and rank a
    constant image below an incompressible-noise image."""
    import dataclasses

    from apv_tpu.eval.ood import complexity_nats

    cfg = tiny_config("mnist_vae", **{"ood.max_examples": 8})
    L = complexity_nats(cfg, "mnist")
    assert L.shape == (8,) and np.all(L > 0)

    # binarize off → uint8 levels path; synthetic 'mnist' vs the noisier
    # synthetic 'cifar10' textures must cost more nats on average
    cfg_c = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, binarize=False))
    flat = complexity_nats(cfg_c, "mnist")
    assert flat.shape == (8,) and np.all(flat > 0)


def test_ood_complexity_score():
    """score='complexity' = per-sample log p(x) + PNG nats: runs on a
    plain (non-adversarial) checkpoint and equals the iwae score plus the
    codelength vector exactly."""
    import dataclasses

    from apv_tpu.eval.ood import complexity_nats

    cfg = tiny_config("mnist_vae", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "complexity", "ood.iwae_k": 4, "ood.iwae_chunk": 2})
    state = _init_state(cfg)
    res = ood_scores(cfg, state.params)
    assert res["score"] == "complexity"
    assert 0.0 <= res["auroc_in_vs_ood"] <= 1.0

    cfg_iwae = dataclasses.replace(
        cfg, ood=dataclasses.replace(cfg.ood, score="iwae"))
    res_iwae = ood_scores(cfg_iwae, state.params)
    L_in = complexity_nats(cfg, "mnist")
    # means relate exactly: complexity = iwae + L (same key schedule)
    np.testing.assert_allclose(
        res["in_mean"], res_iwae["in_mean"] + L_in[:res["n_in"]].mean(),
        rtol=1e-6)


def test_ood_model_ratio_two_checkpoints():
    """model_ratio: score under two models; with model B == model A the
    ratio is identically 0 (same examples, same key schedule), and with a
    different model B it isn't — proving both models see the same data."""
    from apv_tpu.eval.ood import ood_both

    cfg = tiny_config("mnist_advprior", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "model_ratio", "ood.iwae_k": 4, "ood.iwae_chunk": 2})
    state = _init_state(cfg)
    cfg_b = tiny_config("mnist_vae")
    state_b = _init_state(cfg_b)

    # B == A -> per-sample ratio exactly 0 -> AUROC degenerates to 0.5
    same = ood_scores(cfg, state.params, state.d_params,
                      baseline=(cfg, state.params, state.d_params))
    np.testing.assert_allclose(same["in_mean"], 0.0, atol=1e-6)
    np.testing.assert_allclose(same["ood_mean"], 0.0, atol=1e-6)

    res = ood_scores(cfg, state.params, state.d_params,
                     baseline=(cfg_b, state_b.params, None))
    assert res["score"] == "model_ratio"
    assert abs(res["in_mean"]) > 1e-3 or abs(res["ood_mean"]) > 1e-3
    assert 0.0 <= res["auroc_in_vs_ood"] <= 1.0

    # missing baseline is a hard error
    import pytest
    with pytest.raises(ValueError, match="baseline"):
        ood_scores(cfg, state.params, state.d_params)

    # --both: forward + reversed pair direction in one invocation
    both = ood_both(cfg, state.params, state.d_params,
                    baseline=(cfg_b, state_b.params, None))
    assert both["forward"]["in_dataset"] == "mnist"
    assert both["reverse"]["in_dataset"] == "fashion_mnist"
    assert both["reverse"]["ood_dataset"] == "mnist"
    # same pair scored from both sides: reverse-of-forward symmetry on
    # the shared-model path means in/ood score arrays swap roles
    np.testing.assert_allclose(both["forward"]["in_mean"],
                               both["reverse"]["ood_mean"], rtol=1e-6)


def test_ood_both_model_ratio_swaps_roles():
    """model_ratio + reverse model: the reverse direction's denominator is
    the PRIMARY model (roles swap with the datasets). Regression: with
    reverse_of == baseline_of the reverse ratio was numerator==denominator,
    identically zero, AUROC degenerate at 0.5."""
    from apv_tpu.eval.ood import ood_both

    cfg = tiny_config("mnist_advprior", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "model_ratio", "ood.iwae_k": 4, "ood.iwae_chunk": 2})
    state = _init_state(cfg)
    cfg_b = tiny_config("mnist_vae")
    state_b = _init_state(cfg_b)
    other = (cfg_b, state_b.params, None)

    both = ood_both(cfg, state.params, state.d_params,
                    baseline=other, reverse=other)
    assert abs(both["reverse"]["in_mean"]) > 1e-6
    # same examples + same key schedule in both directions: the reverse
    # score is the exact negation of the forward score per dataset
    np.testing.assert_allclose(both["reverse"]["in_mean"],
                               -both["forward"]["ood_mean"], rtol=1e-5)
    np.testing.assert_allclose(both["reverse"]["ood_mean"],
                               -both["forward"]["in_mean"], rtol=1e-5)


def test_ood_both_with_reverse_model():
    from apv_tpu.eval.ood import ood_both

    cfg = tiny_config("mnist_advprior", **{
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "elbo"})
    state = _init_state(cfg)
    cfg_r = tiny_config("mnist_vae")
    state_r = _init_state(cfg_r)
    both = ood_both(cfg, state.params, state.d_params,
                    reverse=(cfg_r, state_r.params, None))
    assert both["reverse_model"] == "own"
    assert both["reverse"]["in_dataset"] == "fashion_mnist"
    assert 0.0 <= both["reverse"]["auroc_in_vs_ood"] <= 1.0


def test_frechet_and_mmd_two_sample_behavior():
    """Identical sets → ~0; same distribution → small; shifted
    distribution → clearly larger, for both distances."""
    from apv_tpu.eval.sample_quality import frechet_distance, mmd2_rbf
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (500, 16))
    a2 = rng.normal(0, 1, (500, 16))
    b = rng.normal(1.5, 1, (500, 16))
    assert frechet_distance(a, a) < 1e-6
    assert frechet_distance(a, a2) < 0.5 < frechet_distance(a, b)
    assert abs(mmd2_rbf(a, a2)) < 0.01 < mmd2_rbf(a, b)


def test_density_coverage_behavior():
    """Matched distributions → density ≈ 1, coverage ≈ 1; far-shifted
    fakes → both ≈ 0; collapsed fakes → density can stay high while
    coverage drops (the failure-mode separation the metric exists for)."""
    from apv_tpu.eval.sample_quality import density_coverage
    rng = np.random.default_rng(0)
    real = rng.normal(0, 1, (500, 16))
    same = rng.normal(0, 1, (500, 16))
    far = rng.normal(25.0, 1, (500, 16))
    collapsed = real[0] + rng.normal(0, 1e-3, (500, 16))

    d_same, c_same = density_coverage(real, same)
    assert 0.7 < d_same < 1.4
    assert c_same > 0.9

    d_far, c_far = density_coverage(real, far)
    assert d_far < 0.01 and c_far < 0.01

    d_col, c_col = density_coverage(real, collapsed)
    assert c_col < 0.05          # almost no real ball is reached...
    assert d_col > 0.2           # ...yet the clump sits ON the manifold


def test_density_coverage_hand_computed():
    """Exact check on a 1-D configuration small enough to enumerate."""
    from apv_tpu.eval.sample_quality import density_coverage
    real = np.array([[0.0], [1.0], [2.0], [10.0]])
    # k=1 radii: r(0)=1 (→1.0), r(1)=1 (→0 or 2), r(2)=1 (→1), r(10)=8
    fake = np.array([[0.5], [9.0]])
    # 0.5 ∈ B(0,1), B(1,1), B(2,1)? |0.5-2|=1.5 > 1 → no. 9 ∈ B(10,8).
    # density = (1·2 + 1·1) / (k=1 · M=2) hmm: 0.5 inside balls of 0 and 1
    # → 2 memberships; 9.0 inside ball of 10 → 1. total 3 / (1*2) = 1.5
    # coverage: balls of 0, 1, 10 hit; ball of 2 not → 3/4.
    d, c = density_coverage(real, fake, k=1)
    assert d == 1.5
    assert c == 0.75

    with pytest.raises(ValueError):
        density_coverage(real[:1], fake, k=1)


def test_feature_net_deterministic():
    from apv_tpu.eval.sample_quality import extract_features, feature_params
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(4, 28, 28, 1)),
                    jnp.float32)
    f1 = extract_features(feature_params(jax.random.PRNGKey(3), 1), x)
    f2 = extract_features(feature_params(jax.random.PRNGKey(3), 1), x)
    assert f1.shape == (4, 256)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_sample_quality_report():
    from apv_tpu.eval.sample_quality import sample_quality
    cfg = tiny_config("mnist_advprior")
    state = _init_state(cfg)
    rep = sample_quality(cfg, state.params, state.d_params, n=64,
                         batch_size=32)
    assert rep["n"] == 64
    assert np.isfinite(rep["frechet_rfd"]) and rep["frechet_rfd"] >= 0
    assert np.isfinite(rep["mmd2_rbf"])
    assert rep["density"] >= 0.0
    assert 0.0 <= rep["coverage"] <= 1.0
    # untrained samples vs real data must not look identical
    assert rep["frechet_rfd"] > 1e-3


def test_sampling_and_grid(tmp_path):
    from apv_tpu.sampling import generate_samples, save_image_grid
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    model = build_model(cfg.model)
    imgs = generate_samples(model, state.params, jax.random.PRNGKey(0),
                            n=16, z_dim=cfg.model.z_dim,
                            likelihood=cfg.model.likelihood,
                            image_channels=1)
    assert imgs.shape == (16, 28, 28, 1)
    arr = np.asarray(imgs)
    assert arr.min() >= 0 and arr.max() <= 1
    p = save_image_grid(imgs, tmp_path / "grid.png", cols=4)
    assert p.exists() and p.stat().st_size > 100


def test_reconstruct_images():
    from apv_tpu.sampling import reconstruct_images
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    model = build_model(cfg.model)
    x = np.random.default_rng(0).integers(0, 2, (6, 28, 28, 1)).astype(
        np.float32)
    rec = reconstruct_images(model, state.params, jnp.asarray(x),
                             jax.random.PRNGKey(0), "bernoulli", 1)
    arr = np.asarray(rec)
    assert arr.shape == x.shape
    assert arr.min() >= 0 and arr.max() <= 1


def test_latent_interpolate_endpoints_and_kinds():
    from apv_tpu.sampling import latent_interpolate
    from apv_tpu.sampling.run import decoder_pixels
    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    model = build_model(cfg.model)
    x = np.random.default_rng(1).integers(0, 2, (4, 28, 28, 1)).astype(
        np.float32)
    xa, xb = jnp.asarray(x[:2]), jnp.asarray(x[2:])
    frames = latent_interpolate(model, state.params, xa, xb, 5,
                                "bernoulli", 1)
    assert frames.shape == (2, 5, 28, 28, 1)
    # endpoint t=0 decodes exactly the posterior mean of x_a
    za, _ = model.apply({"params": state.params}, xa, method="encode")
    out = model.apply({"params": state.params}, za, method="decode")
    ref = decoder_pixels(out, jax.random.PRNGKey(0), "bernoulli", 1, "mean")
    np.testing.assert_allclose(np.asarray(frames[:, 0]), np.asarray(ref),
                               atol=1e-5)
    lerp = latent_interpolate(model, state.params, xa, xb, 5, "bernoulli",
                              1, kind="lerp")
    assert not np.allclose(np.asarray(frames[:, 2]), np.asarray(lerp[:, 2]))


def test_sir_prior_sampling():
    from apv_tpu.sampling.run import sample_prior
    disc = LatentDiscriminator((16,))
    d_params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))["params"]

    def d_apply(dp, z):
        # hand-crafted D: strongly favor z[0] > 0
        return 4.0 * z[:, 0]

    z = sample_prior(jax.random.PRNGKey(1), 2000, 2, d_apply=d_apply,
                     d_params=d_params, pool_factor=32)
    assert float(jnp.mean((z[:, 0] > 0).astype(jnp.float32))) > 0.85


def test_visualize_interpolate_needs_2n(tmp_path):
    """visualize(what='interpolate') raises a clear error when the test
    split is smaller than 2n (regression: opaque jit broadcast error)."""
    import pytest
    import apv_tpu

    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 12})
    apv_tpu.train(cfg)
    with pytest.raises(ValueError, match="2\\*n"):
        apv_tpu.visualize(cfg, what="interpolate", n=8, steps=2)


# ---------------------------------------------------------------------------
# Round-3 eval plumbing edges (VERDICT r2 item 7) + log-Z error bar (item 6)
# ---------------------------------------------------------------------------

def test_iwae_chunk_non_divisor_uses_largest_divisor():
    """k=12, chunk=9: the old gcd fallback silently picked 3 (a 4x longer
    scan); the fix picks the largest divisor of k that fits (6) and warns
    (eval/run.py chunk handling, VERDICT r2 item 7)."""
    import pytest

    cfg = tiny_config("mnist_vae")
    state = _init_state(cfg)
    with pytest.warns(UserWarning, match="largest divisor"):
        res = evaluate_nll(cfg, state.params, k=12, chunk=9, max_examples=16)
    assert res["iwae_k"] == 12
    assert np.isfinite(res["nll_nats"])


def test_evaluate_rejects_caller_mesh_with_k_shards():
    import pytest

    from apv_tpu.parallel import make_mesh

    cfg = tiny_config("mnist_vae", **{"eval.k_shards": 2})
    state = _init_state(cfg)
    with pytest.raises(ValueError, match="k_shards"):
        evaluate_nll(cfg, state.params, mesh=make_mesh(), k=4, chunk=2,
                     max_examples=16)


def test_log_partition_jackknife_se():
    """with_se returns (log_z, se): se > 0, and the point estimate matches
    the se-less call exactly (same chunking/keys)."""
    disc = LatentDiscriminator((16,))
    d_params = disc.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 8)))["params"]

    def d_apply(dp, z):
        return disc.apply({"params": dp}, z)

    key = jax.random.PRNGKey(3)
    lz = estimate_log_partition(d_apply, d_params, 8, key, n=4000, batch=500)
    lz2, se = estimate_log_partition(d_apply, d_params, 8, key, n=4000,
                                     batch=500, with_se=True)
    np.testing.assert_allclose(float(lz), float(lz2), rtol=1e-6)
    assert float(se) > 0
    # more samples -> tighter error bar (MC rate ~ 1/sqrt(n))
    _, se_big = estimate_log_partition(d_apply, d_params, 8, key, n=16000,
                                       batch=500, with_se=True)
    assert float(se_big) < float(se)


def test_log_partition_jackknife_se_dominated_chunk():
    """One MC chunk dominating the total within float precision must not
    produce a -inf/NaN SE: the log(e^total − e^{L_i}) leave-one-out form
    did (log1p(-1) = -inf), and a NaN would poison eval.json. The masked
    leave-one-out logsumexp stays finite."""
    def d_apply(dp, z):
        # heavy-tailed e^{D(z)}: the max draw dominates all 2000 samples
        return 500.0 * z[:, 0]

    lz, se = estimate_log_partition(d_apply, {}, 4, jax.random.PRNGKey(0),
                                    n=2000, batch=500, with_se=True)
    assert np.isfinite(float(lz))
    assert np.isfinite(float(se)) and float(se) > 0


def test_evaluate_nll_reports_log_partition_se():
    cfg = tiny_config("mnist_advprior")
    state = _init_state(cfg)
    res = evaluate_nll(cfg, state.params, state.d_params, k=4, chunk=2,
                       max_examples=16)
    assert "log_partition_se" in res and res["log_partition_se"] > 0
    # non-adversarial scoring: no MC estimate, se is exactly 0
    res0 = evaluate_nll(cfg, state.params, state.d_params, k=4, chunk=2,
                        max_examples=16, use_adversarial_prior=False)
    assert res0["log_partition_se"] == 0.0


def test_local_rows_matches_global_on_virtual_mesh():
    """_local_rows: shard-sorted concat == the global array when every
    shard is addressable (the single-process invariant the multi-host path
    builds on)."""
    from apv_tpu.eval.run import _local_rows
    from apv_tpu.parallel import data_sharding, make_mesh

    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32)
    arr = jax.device_put(x, data_sharding(mesh))
    np.testing.assert_array_equal(_local_rows(arr), x)
    x2 = np.arange(48, dtype=np.float32).reshape(16, 3)
    arr2 = jax.device_put(x2, data_sharding(mesh))
    np.testing.assert_array_equal(_local_rows(arr2), x2)


def test_assemble_global_reorders_process_major_gather():
    """The [P, n_batches, per] allgather must transpose back to batch-major
    global order (process p owns rows [p*per:(p+1)*per] of every batch)."""
    from apv_tpu.eval.run import _assemble_global

    # global batches: [0..7], [8..15]; per-host rows of each batch
    #   host0: [0..3], [8..11]   host1: [4..7], [12..15]
    h0 = [np.array([0, 1, 2, 3.0]), np.array([8, 9, 10, 11.0])]
    h1 = [np.array([4, 5, 6, 7.0]), np.array([12, 13, 14, 15.0])]
    # single-process path is identity
    np.testing.assert_array_equal(
        _assemble_global(h0, 1), np.concatenate(h0))
    # simulate the gathered tensor process_allgather would produce
    gathered = np.stack([np.stack(h0), np.stack(h1)])     # [P=2, 2, 4]
    flat = gathered.transpose(1, 0, 2).reshape(-1)
    np.testing.assert_array_equal(flat, np.arange(16, dtype=np.float32))


def test_eval_batch_size_rounds_to_host_multiple(monkeypatch):
    """The eval batch must split evenly across hosts (Batcher contract) AND
    across the mesh's data axis (batch-axis device_put) — mirror of the
    train loop's valid-batch rounding."""
    from types import SimpleNamespace

    from apv_tpu.eval import run as eval_run

    mesh1 = SimpleNamespace(shape={"data": 1})
    mesh8 = SimpleNamespace(shape={"data": 8})
    monkeypatch.setattr(eval_run, "_host_shard", lambda: (0, 4))
    assert eval_run._eval_batch_size(50, 1000, mesh1) == 48
    assert eval_run._eval_batch_size(64, 50, mesh1) == 48
    assert eval_run._eval_batch_size(3, 1000, mesh1) == 4  # floor: 1 row/host
    monkeypatch.setattr(eval_run, "_host_shard", lambda: None)
    assert eval_run._eval_batch_size(64, 50, mesh1) == 50
    # mesh data-axis rounding (single process): 50 rows over 8 devices
    assert eval_run._eval_batch_size(64, 50, mesh8) == 48
    assert eval_run._eval_batch_size(12, 12, mesh8) == 8
    # both constraints at once: lcm(pcount=4, shards=8) = 8
    monkeypatch.setattr(eval_run, "_host_shard", lambda: (0, 4))
    assert eval_run._eval_batch_size(50, 1000, mesh8) == 48
    assert eval_run._eval_batch_size(3, 1000, mesh8) == 8
    # split smaller than the smallest sharded batch: loud error, not a
    # zero-batch Batcher dying in an opaque np.stack([])
    import pytest
    monkeypatch.setattr(eval_run, "_host_shard", lambda: None)
    with pytest.raises(ValueError, match="raise max_examples"):
        eval_run._eval_batch_size(64, 4, mesh8)


def test_ood_unknown_score_raises():
    """A misspelled ood.score must error, not silently run the expensive
    IWAE scorer under the typo'd name."""
    import pytest

    from apv_tpu.eval.ood import ood_scores

    cfg = tiny_config("mnist_advprior", **{"ood.score": "pixel-d"})
    with pytest.raises(ValueError, match="unknown ood.score"):
        ood_scores(cfg, params={}, d_params=None)
