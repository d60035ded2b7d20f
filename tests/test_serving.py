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
