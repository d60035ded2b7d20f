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
