"""Serving export: StableHLO artifacts round-trip and run without model code."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from apv_tpu import serving
from apv_tpu.training.step import make_train_fns


def _state(cfg):
    return make_train_fns(cfg).init_fn(jax.random.PRNGKey(0))


def test_sampler_export_roundtrip(tmp_path):
    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 8})
    state = _state(cfg)
    path = serving.export_sampler(cfg, state.params, None,
                                  tmp_path / "sampler.stablehlo")
    assert path.stat().st_size > 1000
    loaded = serving.load_exported(path)
    imgs = loaded.call(jnp.int32(7))
    assert imgs.shape == (8, 28, 28, 1)
    arr = np.asarray(imgs)
    assert np.all((arr >= 0) & (arr <= 1))
    # deterministic in seed, varies across seeds
    np.testing.assert_array_equal(np.asarray(loaded.call(jnp.int32(7))), arr)
    assert not np.array_equal(np.asarray(loaded.call(jnp.int32(8))), arr)


def test_sampler_export_adversarial_sir(tmp_path):
    cfg = tiny_config("mnist_advprior", **{"eval.batch_size": 4})
    state = _state(cfg)
    path = serving.export_sampler(cfg, state.params, state.d_params,
                                  tmp_path / "s.stablehlo")
    imgs = serving.load_exported(path).call(jnp.int32(0))
    assert imgs.shape == (4, 28, 28, 1)


def test_sampler_export_refined(tmp_path):
    """refine_steps bakes the MALA scan into the artifact: it loads, runs,
    stays deterministic in seed, and differs from the SIR-only artifact
    (the refinement actually moved the latents)."""
    cfg = tiny_config("mnist_advprior", **{"eval.batch_size": 4})
    state = _state(cfg)
    p_sir = serving.export_sampler(cfg, state.params, state.d_params,
                                   tmp_path / "sir.stablehlo")
    p_ref = serving.export_sampler(cfg, state.params, state.d_params,
                                   tmp_path / "ref.stablehlo",
                                   refine_steps=4)
    a = np.asarray(serving.load_exported(p_sir).call(jnp.int32(3)))
    b = np.asarray(serving.load_exported(p_ref).call(jnp.int32(3)))
    assert b.shape == (4, 28, 28, 1)
    assert np.all((b >= 0) & (b <= 1))
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(serving.load_exported(p_ref).call(jnp.int32(3))), b)


def test_sampler_export_refine_needs_discriminator(tmp_path):
    """Regression (round-3 review): an artifact exported with a silently
    dropped refinement would misreport its sampling protocol."""
    import pytest

    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 4})
    state = _state(cfg)
    with pytest.raises(ValueError, match="no latent discriminator"):
        serving.export_sampler(cfg, state.params, None,
                               tmp_path / "x.stablehlo", refine_steps=4)


def test_sampler_export_expost_prior(tmp_path):
    """prior_moments bake in as constants: the artifact decodes from the
    ex-post Gaussian (differs from the shaped-prior artifact), runs
    deterministically, and rejects the refine combination."""
    import pytest

    cfg = tiny_config("mnist_advprior", **{"eval.batch_size": 4})
    state = _state(cfg)
    moments = (jnp.zeros((cfg.model.z_dim,)) + 0.3,
               jnp.ones((cfg.model.z_dim,)) * 2.0)
    p_adv = serving.export_sampler(cfg, state.params, state.d_params,
                                   tmp_path / "adv.stablehlo")
    p_exp = serving.export_sampler(cfg, state.params, None,
                                   tmp_path / "exp.stablehlo",
                                   prior_moments=moments)
    a = np.asarray(serving.load_exported(p_adv).call(jnp.int32(5)))
    b = np.asarray(serving.load_exported(p_exp).call(jnp.int32(5)))
    assert b.shape == (4, 28, 28, 1)
    assert np.all((b >= 0) & (b <= 1))
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(serving.load_exported(p_exp).call(jnp.int32(5))), b)
    with pytest.raises(ValueError, match="ex-post prior"):
        serving.export_sampler(cfg, state.params, state.d_params,
                               tmp_path / "x.stablehlo",
                               refine_steps=3, prior_moments=moments)


def test_sampler_export_expost_gmm_prior(tmp_path):
    """A 3-tuple (log_w, means, vars) ex-post GMM bakes in as constants:
    the artifact runs deterministically and differs from the Gaussian
    ex-post artifact over the same decoder."""
    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 4})
    state = _state(cfg)
    zd = cfg.model.z_dim
    gauss = (jnp.zeros((zd,)), jnp.ones((zd,)))
    gmm = (jnp.log(jnp.asarray([0.6, 0.4])),
           jnp.stack([jnp.full((zd,), -3.0), jnp.full((zd,), 3.0)]),
           jnp.stack([jnp.full((zd,), 0.5), jnp.full((zd,), 2.0)]))
    p_g = serving.export_sampler(cfg, state.params, None,
                                 tmp_path / "g.stablehlo",
                                 prior_moments=gauss)
    p_m = serving.export_sampler(cfg, state.params, None,
                                 tmp_path / "m.stablehlo",
                                 prior_moments=gmm)
    a = np.asarray(serving.load_exported(p_g).call(jnp.int32(7)))
    b = np.asarray(serving.load_exported(p_m).call(jnp.int32(7)))
    assert b.shape == (4, 28, 28, 1)
    assert np.all((b >= 0) & (b <= 1))
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(serving.load_exported(p_m).call(jnp.int32(7))), b)


def test_sampler_int8_quantized_export(tmp_path):
    """int8 weight-only quantization: artifact shrinks ~4x on the baked
    weights and the decoded images stay close to the f32 artifact's."""
    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 8,
                                      "model.dense": 256})
    state = _state(cfg)
    p32 = serving.export_sampler(cfg, state.params, None,
                                 tmp_path / "s32.stablehlo")
    p8 = serving.export_sampler(cfg, state.params, None,
                                tmp_path / "s8.stablehlo", quantize="int8")
    assert p8.stat().st_size < 0.5 * p32.stat().st_size, (
        p8.stat().st_size, p32.stat().st_size)
    a = np.asarray(serving.load_exported(p32).call(jnp.int32(7)))
    b = np.asarray(serving.load_exported(p8).call(jnp.int32(7)))
    assert a.shape == b.shape
    # images in [0,1]; per-channel int8 weights keep decode close
    assert np.mean(np.abs(a - b)) < 0.05, np.mean(np.abs(a - b))
    assert np.all((b >= 0) & (b <= 1))


def test_quantize_roundtrip_error_bound():
    from apv_tpu.serving import dequantize_params, quantize_params_int8
    rng = np.random.default_rng(0)
    params = {"layer": {"kernel": rng.normal(0, 0.1, (128, 64)).astype(
        np.float32) * rng.random((1, 64), np.float32),
        "bias": rng.normal(0, 1, (64,)).astype(np.float32)}}
    q = quantize_params_int8(jax.tree.map(jnp.asarray, params))
    assert q["layer"]["kernel"]["__q8__"].dtype == jnp.int8
    # bias untouched
    np.testing.assert_array_equal(np.asarray(q["layer"]["bias"]),
                                  params["layer"]["bias"])
    d = dequantize_params(q)
    w = params["layer"]["kernel"]
    # symmetric per-channel: error <= scale/2 = max|w|_col / 254
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-8
    assert np.all(np.abs(np.asarray(d["layer"]["kernel"]) - w) <= bound)


def test_scorer_cifar_centers_encoder_input(tmp_path):
    """Non-binarized configs must feed the encoder centered [-1,1] input
    (the train/eval distribution — eval/run.py::_prep_eval_batch), while
    the likelihood scores the raw [0,1] levels. Regression for the
    exported scorer running the CIFAR encoder off-distribution."""
    from apv_tpu.eval.run import _prep_eval_batch
    from apv_tpu.models import build_model
    from apv_tpu.training.losses import elbo_terms

    cfg = tiny_config("cifar_advprior_resnet", **{"eval.batch_size": 4})
    state = _state(cfg)
    rng = np.random.default_rng(1)
    x = rng.random((4, 32, 32, 3)).astype(np.float32)

    got = np.asarray(serving._scorer_fn(cfg, state.params)(
        jnp.asarray(x), jnp.int32(5)))

    model = build_model(cfg.model)
    x_in, x_target = _prep_eval_batch(cfg, x)
    recon, kl, _ = elbo_terms(
        lambda p, xx: model.apply({"params": p}, xx, method="encode"),
        lambda p, zz: model.apply({"params": p}, zz, method="decode"),
        state.params, x_in, x_target, jax.random.PRNGKey(5),
        cfg.model.likelihood)
    want = np.asarray(recon - kl)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # and the fix is load-bearing: raw input gives a different score
    recon_raw, kl_raw, _ = elbo_terms(
        lambda p, xx: model.apply({"params": p}, xx, method="encode"),
        lambda p, zz: model.apply({"params": p}, zz, method="decode"),
        state.params, jnp.asarray(x), jnp.asarray(x),
        jax.random.PRNGKey(5), cfg.model.likelihood)
    assert not np.allclose(got, np.asarray(recon_raw - kl_raw))


def test_scorer_export_matches_inprocess(tmp_path):
    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 4})
    state = _state(cfg)
    path = serving.export_scorer(cfg, state.params, tmp_path / "sc.stablehlo")
    loaded = serving.load_exported(path)
    rng = np.random.default_rng(0)
    x = (rng.random((4, 28, 28, 1)) < 0.4).astype(np.float32)
    got = np.asarray(loaded.call(jnp.asarray(x), jnp.int32(3)))
    want = np.asarray(serving._scorer_fn(cfg, state.params)(
        jnp.asarray(x), jnp.int32(3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_export_scorer_rejects_quantize(tmp_path):
    """api.export_artifact must error on quantize for scorers instead of
    silently shipping a full-precision artifact."""
    import pytest
    import apv_tpu

    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    with pytest.raises(ValueError, match="sampler-only"):
        apv_tpu.export_artifact(cfg, what="scorer", quantize="int8")


def test_scorer_polymorphic_batch(tmp_path):
    """The default scorer artifact has a SYMBOLIC batch axis: one export
    serves any batch size, matching the in-process scorer at each."""
    cfg = tiny_config("mnist_vae", **{"eval.batch_size": 4})
    state = _state(cfg)
    path = serving.export_scorer(cfg, state.params, tmp_path / "sc.stablehlo")
    loaded = serving.load_exported(path)
    rng = np.random.default_rng(1)
    for b in (1, 4, 7):
        x = (rng.random((b, 28, 28, 1)) < 0.4).astype(np.float32)
        got = np.asarray(loaded.call(jnp.asarray(x), jnp.int32(3)))
        want = np.asarray(serving._scorer_fn(cfg, state.params)(
            jnp.asarray(x), jnp.int32(3)))
        assert got.shape == (b,)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # pinned export still available for fixed-shape deployments
    pinned = serving.load_exported(serving.export_scorer(
        cfg, state.params, tmp_path / "sc_pin.stablehlo",
        polymorphic_batch=False))
    x = (rng.random((4, 28, 28, 1)) < 0.4).astype(np.float32)
    assert np.asarray(pinned.call(jnp.asarray(x), jnp.int32(0))).shape == (4,)


def test_scorer_adversarial_learned_prior(tmp_path):
    """Scorer artifacts from adversarial checkpoints must score under the
    LEARNED prior (recon − KL + D(z) − log Z), matching the in-repo
    eval/OOD 'elbo' correction — a plain-prior artifact would silently
    rank differently from ood.json (round-3 review finding)."""
    from apv_tpu.models import LatentDiscriminator, build_model
    from apv_tpu.training.losses import elbo_terms

    cfg = tiny_config("mnist_advprior", **{"eval.batch_size": 4})
    state = _state(cfg)
    rng = np.random.default_rng(2)
    x = (rng.random((4, 28, 28, 1)) < 0.4).astype(np.float32)

    path = serving.export_scorer(cfg, state.params, tmp_path / "s.stablehlo",
                                 d_params=state.d_params)
    got = np.asarray(serving.load_exported(path).call(jnp.asarray(x),
                                                      jnp.int32(3)))

    from apv_tpu.eval.iwae_eval import estimate_log_partition
    disc = LatentDiscriminator(tuple(cfg.adversarial.d_widths))
    log_z = float(estimate_log_partition(
        lambda dp, z: disc.apply({"params": dp}, z), state.d_params,
        cfg.model.z_dim, jax.random.PRNGKey(0)))
    model = build_model(cfg.model)
    recon, kl, z = elbo_terms(
        lambda p, xx: model.apply({"params": p}, xx, method="encode"),
        lambda p, zz: model.apply({"params": p}, zz, method="decode"),
        state.params, jnp.asarray(x), jnp.asarray(x),
        jax.random.PRNGKey(3), cfg.model.likelihood)
    want = np.asarray(recon - kl
                      + disc.apply({"params": state.d_params}, z) - log_z)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the correction is actually non-trivial
    plain = np.asarray(recon - kl)
    assert np.max(np.abs(want - plain)) > 1e-6


def test_dispatch_backend_context_restores():
    """serving pins the jnp ops tier while tracing portable exports; the
    context must restore whatever backend was active before."""
    from apv_tpu.ops import dispatch

    prev = dispatch.get_backend()
    with dispatch.backend("jnp"):
        assert dispatch.get_backend() == "jnp"
    assert dispatch.get_backend() == prev


def test_sampler_export_temperature(tmp_path):
    """--temperature bakes into trained-prior sampler artifacts (round 5):
    T=1 ≡ default bit-exact, T≠1 changes the output, non-trained-prior
    exports reject T≠1 loudly (protocol honesty, same rule as sampling)."""
    import pytest

    cfg = tiny_config("mnist_advprior", **{
        "eval.batch_size": 4, "model.prior": "gaussian"})
    state = _state(cfg)
    p1 = serving.export_sampler(cfg, state.params, state.d_params,
                                tmp_path / "t1.stablehlo", temperature=1.0)
    p_def = serving.export_sampler(cfg, state.params, state.d_params,
                                   tmp_path / "tdef.stablehlo")
    p05 = serving.export_sampler(cfg, state.params, state.d_params,
                                 tmp_path / "t05.stablehlo",
                                 temperature=0.5)
    a1 = np.asarray(serving.load_exported(p1).call(jnp.int32(3)))
    a_def = np.asarray(serving.load_exported(p_def).call(jnp.int32(3)))
    a05 = np.asarray(serving.load_exported(p05).call(jnp.int32(3)))
    np.testing.assert_array_equal(a1, a_def)
    assert not np.array_equal(a05, a1)

    std = tiny_config("mnist_vae", **{"eval.batch_size": 4})
    with pytest.raises(ValueError, match="temperature"):
        serving.export_sampler(std, _state(std).params, None,
                               tmp_path / "bad.stablehlo", temperature=0.5)
