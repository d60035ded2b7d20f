"""Biadversarial (two-discriminator) variant tests.

SURVEY.md §8 item 3 names three candidate readings of the reference's
adversarial objective; 'biadversarial' (latent prior-shaping D + pixel-space
conv D on decoded reconstructions) is the third, per the arXiv 1902.03517
lineage. These tests pin the wiring: nested d_params structure, both Ds
learning, generator coupling, eval-side latent-subtree routing, and
checkpoint roundtrip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from apv_tpu.models import latent_d_params
from apv_tpu.training.step import make_train_fns

BIADV = {"adversarial.variant": "biadversarial",
         "adversarial.pixel_d_widths": "[8,16]"}


def _synthetic_batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    h, w, c = cfg.model.image_shape
    if cfg.data.binarize:
        img = (rng.random((n, h, w, c)) < 0.3).astype(np.float32)
    else:
        img = rng.integers(0, 256, size=(n, h, w, c)).astype(np.uint8)
    return {"image": img}


def _run_steps(cfg, n_steps, batch):
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step)
    history = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        history.append({k: float(v) for k, v in metrics.items()})
    return state, history


def test_init_nests_both_discriminators():
    cfg = tiny_config("mnist_advprior", **BIADV)
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    assert set(state.d_params) == {"latent", "pixel"}
    # the accessor returns the latent subtree for biadversarial...
    assert latent_d_params("biadversarial", state.d_params) is \
        state.d_params["latent"]
    # ...and is the identity for the single-D variants
    flat = {"Dense_0": {"kernel": jnp.zeros((2, 2))}}
    assert latent_d_params("learned_prior", flat) is flat
    assert latent_d_params("aae", flat) is flat


def test_biadv_step_runs_and_reports_mnist():
    cfg = tiny_config("mnist_advprior", **BIADV)
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 20, batch)
    last = hist[-1]
    for key in ("d_loss", "d_acc", "px_d_loss", "px_d_acc", "g_px", "g_adv"):
        assert key in last, f"missing metric {key}"
        assert np.isfinite(last[key]), f"non-finite {key}"
    assert last["elbo"] > hist[0]["elbo"]


def test_biadv_step_runs_cifar_disc_logistic():
    cfg = tiny_config("cifar_advprior_resnet", **BIADV)
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 10, batch)
    assert np.isfinite(hist[-1]["loss"])
    assert "px_d_loss" in hist[-1] and "g_px" in hist[-1]


def test_pixel_discriminator_learns():
    """Early in training the pixel D separates blurry decoded means from
    binary data easily: px_d_loss must fall well below its start and
    px_d_acc must rise above chance."""
    cfg = tiny_config("mnist_advprior", **BIADV)
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 30, batch)
    assert hist[-1]["px_d_loss"] < hist[0]["px_d_loss"]
    assert hist[-1]["px_d_acc"] > 0.6


def test_d_first_ordering_computes_own_xhat():
    cfg = tiny_config("mnist_advprior",
                      **{**BIADV, "adversarial.d_reuse_posterior": False})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 3, batch)
    assert "px_d_loss" in hist[-1]
    assert np.isfinite(hist[-1]["px_d_loss"])


def test_iwae_objective_biadv_smoke():
    cfg = tiny_config("mnist_advprior",
                      **{**BIADV, "train.objective": "iwae",
                         "train.iwae_k": 3})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 5, batch)
    last = hist[-1]
    for key in ("iwae_bound", "g_px", "px_d_loss"):
        assert key in last and np.isfinite(last[key]), key


def test_checkpoint_roundtrip_nested_d(tmp_path):
    from apv_tpu.utils import checkpoint as ckpt

    cfg = tiny_config("mnist_advprior", **BIADV)
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(3))
    ckpt.save_checkpoint(tmp_path / "ck", state, 0)
    template = jax.eval_shape(fns.init_fn, jax.random.PRNGKey(0))
    restored = ckpt.restore_checkpoint(tmp_path / "ck", template)
    for a, b in zip(jax.tree.leaves(state.d_params),
                    jax.tree.leaves(restored.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pixel_d_ood_score(tmp_path):
    """ood.score=pixel_d scores with the pixel discriminator's logit:
    finite AUROCs from a biadversarial checkpoint; a loud error from a
    single-D checkpoint (no pixel D to score with)."""
    import pytest

    from apv_tpu import api

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path),
                      **{**BIADV, "train.steps": 4,
                         "train.eval_every": 100000,
                         "name": "biadv_pxd"})
    api.train(cfg, overwrite=True)
    result = api.ood_score(cfg, overrides=[
        "ood.score=pixel_d", "ood.in_dataset=mnist",
        "ood.ood_dataset=fashion_mnist", "ood.max_examples=32",
        "ood.batch_size=16"])
    assert result["score"] == "pixel_d"
    assert 0.0 <= result["auroc_in_vs_ood"] <= 1.0
    assert np.isfinite(result["in_mean"]) and np.isfinite(result["ood_mean"])
    assert result["n_in"] == 32 and result["n_ood"] == 32

    lp = tiny_config("mnist_advprior", tmp_dir=str(tmp_path),
                     **{"train.steps": 4, "train.eval_every": 100000,
                        "name": "lp_pxd"})
    api.train(lp, overwrite=True)
    with pytest.raises(ValueError, match="biadversarial"):
        api.ood_score(lp, overrides=[
            "ood.score=pixel_d", "ood.in_dataset=mnist",
            "ood.ood_dataset=fashion_mnist", "ood.max_examples=32",
            "ood.batch_size=16"])


def test_pixel_d_scores_real_vs_decoded(tmp_path):
    """Mechanics pin for the pixel_d scorer: D_x was trained to separate
    real data (class 1) from decoded means (class 0), so after training,
    real test images must out-score the model's own decoded means. (Whether
    that transfers to cross-DATASET OOD is an empirical question for the
    production-scale gate, not a 60-step unit test.)"""
    import jax.numpy as jnp

    from apv_tpu import api
    from apv_tpu.eval.run import eval_arrays, pixel_d_scores
    from apv_tpu.models import PixelDiscriminator, build_model
    from apv_tpu.training import losses as L

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path),
                      **{**BIADV, "train.steps": 60,
                         "train.eval_every": 100000,
                         "name": "biadv_pxd_sep"})
    api.train(cfg, overwrite=True)
    from apv_tpu.api import _restore_state
    state = _restore_state(cfg)

    real = pixel_d_scores(cfg, state.d_params["pixel"], dataset="mnist",
                          max_examples=64, batch_size=32)
    # decoded means for the same images, through the trained decoder
    model = build_model(cfg.model)
    x = jnp.asarray(eval_arrays(cfg, "mnist", 64)["image"], jnp.float32)
    mean, _ = model.apply({"params": state.params}, x, method="encode")
    out = model.apply({"params": state.params}, mean, method="decode")
    x_hat = L.likelihood_pixel_mean(out, cfg.model.likelihood,
                                    cfg.model.image_shape[2])
    pxd = PixelDiscriminator(tuple(cfg.adversarial.pixel_d_widths))
    fake = np.asarray(pxd.apply({"params": state.d_params["pixel"]}, x_hat))
    from apv_tpu.eval.ood import auroc
    assert auroc(real, fake) > 0.95, (real.mean(), fake.mean())


def test_eval_side_routes_latent_subtree(tmp_path):
    """End-to-end guard for api._d: a biadversarial checkpoint must
    evaluate (IWAE + learned-prior log-partition MC) and sample (SIR from
    the shaped prior) using only the latent D subtree."""
    from apv_tpu import api

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path),
                      **{**BIADV, "train.steps": 4,
                         "train.eval_every": 100000,
                         "name": "biadv_e2e"})
    api.train(cfg, overwrite=True)
    result = api.evaluate(cfg, k=4, activity=False)
    assert np.isfinite(result["nll_nats"])
    assert "log_partition" in result    # learned-prior path exercised
    images = api.sample(cfg, n=4, out_path=str(tmp_path / "s.png"))
    assert np.asarray(images).shape[0] == 4
