"""Trained flow prior (model.prior='flow', models/flow_prior.py).

Contracts: identity at init (so a freshly-initialized flow-prior model IS
the standard-prior model — pinned against the standard estimator), joint
training moves the flow, DReG treats the prior's params exactly like the
decoder's (θ-side w̃ weighting — asserted on a toy prior with explicit
params), and the eval/sample/export surfaces all route through the
trained prior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config


def _tiny_flow_cfg(tmp_dir=None, **over):
    base = {"model.prior": "flow", "model.prior_flow_layers": 2,
            "model.prior_flow_hidden": 8, "train.steps": 1,
            "train.eval_every": 0, "train.batch_size": 8,
            "train.checkpoint_every": 1, "data.synthetic_size": 64}
    base.update(over)
    kw = {"tmp_dir": tmp_dir} if tmp_dir else {}
    return tiny_config("mnist_vae", **kw, **base)


def test_flow_prior_guards():
    from apv_tpu.training.step import make_train_fns

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_fns(tiny_config("mnist_advprior",
                                   **{"model.prior": "flow"}))
    # round 5: free_bits now COMPOSES with trainable priors (the
    # free-information total-KL floor — losses.free_information_kl);
    # the old blanket ban must NOT raise.
    make_train_fns(tiny_config("mnist_vae", **{
        "model.prior": "flow", "train.free_bits": 0.25}))


def test_flow_prior_params_and_identity_nll():
    """A freshly-initialized flow prior is the identity map, so the
    flow-prior model's IWAE NLL must equal the standard-prior model's
    on the SAME encoder/decoder weights (path-based flax rngs make the
    enc/dec inits identical across the prior knob)."""
    from apv_tpu.eval.iwae_eval import make_iwae_fn
    from apv_tpu.models import build_model
    from apv_tpu.training.step import make_train_fns

    cfg_f = _tiny_flow_cfg()
    cfg_s = tiny_config("mnist_vae")
    st_f = make_train_fns(cfg_f).init_fn(jax.random.PRNGKey(0))
    st_s = make_train_fns(cfg_s).init_fn(jax.random.PRNGKey(0))
    assert "flow_prior" in st_f.params and "flow_prior" not in st_s.params

    m_f, m_s = build_model(cfg_f.model), build_model(cfg_s.model)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (8,) + tuple(cfg_f.model.image_shape))
    x = (x < 0.5).astype(jnp.float32)

    def prior_lp(p, z):
        return m_f.apply({"params": p}, z, method="prior_logpdf")

    f_flow = make_iwae_fn(m_f, "bernoulli", k=8, chunk=4,
                          prior_logpdf_p=prior_lp)
    f_std = make_iwae_fn(m_s, "bernoulli", k=8, chunk=4)
    ll_f = np.asarray(f_flow(st_f.params, {}, x, x, jax.random.PRNGKey(2)))
    ll_s = np.asarray(f_std(st_s.params, {}, x, x, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(ll_f, ll_s, rtol=1e-5, atol=1e-4)


def test_flow_prior_trains_jointly():
    """40 steps on synthetic data: finite metrics, and the flow's params
    actually move (the ELBO's −β·E_q[log q − log p_θ] term is the flow's
    MLE gradient — if it stays at init, the prior is not being trained)."""
    from apv_tpu.training.step import make_train_fns

    cfg = _tiny_flow_cfg(**{"train.steps": 40, "train.beta_warmup_steps": 0})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    flow0 = jax.tree.map(jnp.copy, state.params["flow_prior"])

    from apv_tpu.data import load_dataset, static_binarize
    from apv_tpu.data.pipeline import Batcher
    images, _ = load_dataset("mnist", "train", synthetic_size=64)
    images = static_binarize(images, seed=0)
    batcher = Batcher({"image": images}, cfg.train.batch_size, seed=0)
    step = jax.jit(fns.train_step)

    def batches():
        while True:
            yield from batcher.epoch()

    it = batches()
    m = None
    for _ in range(40):
        state, m = step(state, next(it))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["kl"]))
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         flow0, state.params["flow_prior"])
    assert max(jax.tree.leaves(moved)) > 1e-4, moved
    vm = fns.eval_step(state, {"image": images[:8]})
    assert np.isfinite(float(vm["valid_elbo"]))


def test_dreg_theta_path_for_prior_params():
    """DReG and reparam must give the SAME gradient for the prior's own
    parameters (they are θ-side, like the decoder) and the same value —
    asserted exactly on a toy diagonal-Gaussian 'trained prior' whose
    params are explicit."""
    from apv_tpu.core import distributions as D
    from apv_tpu.training import losses as L

    rng = np.random.default_rng(3)
    B, DX, Z = 12, 10, 4
    params = {
        "enc_w": jnp.asarray(rng.normal(0, 0.3, (DX, 2 * Z)), jnp.float32),
        "dec_w": jnp.asarray(rng.normal(0, 0.3, (Z, DX)), jnp.float32),
        "prior_logvar": jnp.asarray(rng.normal(0, 0.2, (Z,)), jnp.float32),
    }

    def encode(p, x):
        mean, logvar = jnp.split(x @ p["enc_w"], 2, axis=-1)
        return mean, jnp.tanh(logvar)

    def decode(p, z):
        return z @ p["dec_w"]

    def prior_lp(p, z):
        return jnp.sum(D.gaussian_logpdf(z, jnp.zeros((Z,)),
                                         p["prior_logvar"]), axis=-1)

    x = jnp.asarray(rng.random((B, DX)) < 0.4, jnp.float32)
    key = jax.random.PRNGKey(7)

    def obj(grad_est):
        def fn(p):
            o, _, _ = L.iwae_objective(encode, decode, p, x, x, key,
                                       "bernoulli", 8, jnp.float32(1.0),
                                       grad_est, prior_logpdf_p=prior_lp)
            return o
        return fn

    v_rep, g_rep = jax.value_and_grad(obj("reparam"))(params)
    v_dreg, g_dreg = jax.value_and_grad(obj("dreg"))(params)
    np.testing.assert_allclose(np.asarray(v_rep), np.asarray(v_dreg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_rep["prior_logvar"]),
                               np.asarray(g_dreg["prior_logvar"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_rep["dec_w"]),
                               np.asarray(g_dreg["dec_w"]),
                               rtol=1e-4, atol=1e-5)
    # φ gradients must DIFFER (the score-term removal is real)
    assert not np.allclose(np.asarray(g_rep["enc_w"]),
                           np.asarray(g_dreg["enc_w"]), atol=1e-6)


def test_flow_prior_iwae_objective_smoke():
    """train.objective=iwae composes with model.prior=flow end to end."""
    from apv_tpu.training.step import make_train_fns

    cfg = _tiny_flow_cfg(**{"train.objective": "iwae", "train.iwae_k": 3})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1),
                            (8,) + tuple(cfg.model.image_shape))
         < 0.5).astype(jnp.float32)
    state, m = jax.jit(fns.train_step)(state, {"image": x})
    assert np.isfinite(float(m["loss"]))


def test_sample_and_evaluate_api_flow_prior(tmp_path):
    """apv train/sample/evaluate on a flow-prior checkpoint: 'auto' draws
    the trained prior, 'standard' still forces N(0,I), and evaluate
    scores the model's own flow (exact — log Z stays 0)."""
    import apv_tpu

    from apv_tpu.models import build_model

    cfg = _tiny_flow_cfg(tmp_dir=str(tmp_path),
                         **{"train.steps": 30,
                            "train.beta_warmup_steps": 0})
    state = apv_tpu.train(cfg)
    imgs = apv_tpu.sample(cfg, n=8)                       # prior='auto'
    assert imgs.shape == (8,) + tuple(cfg.model.image_shape)
    imgs_std = apv_tpu.sample(cfg, n=8, prior="standard")
    assert imgs_std.shape == imgs.shape

    # after 30 joint steps the trained prior is measurably non-identity:
    # 'auto' latents (flow inverse of u) differ from 'standard' (u itself)
    model = build_model(cfg.model)
    u = jax.random.normal(jax.random.PRNGKey(5), (64, cfg.model.z_dim))
    z = model.apply({"params": state.params}, u,
                    method="prior_sample_from")
    assert float(jnp.max(jnp.abs(z - u))) > 1e-4

    res = apv_tpu.evaluate(cfg, k=4, activity=False)
    assert res["prior"] == "model"
    assert res["log_partition"] == 0.0
    assert np.isfinite(res["nll_nats"])


def test_export_sampler_and_scorer_flow_prior(tmp_path):
    """Flow-prior checkpoints export: the sampler bakes the flow inverse
    (and --prior standard still forces the base draw); the scorer scores
    under the trained flow."""
    import apv_tpu
    from apv_tpu import serving

    cfg = _tiny_flow_cfg(tmp_dir=str(tmp_path),
                         **{"train.steps": 30,
                            "train.beta_warmup_steps": 0})
    apv_tpu.train(cfg)
    p_flow = apv_tpu.export_artifact(cfg, what="sampler",
                                     out_path=str(tmp_path / "f.stablehlo"))
    p_std = apv_tpu.export_artifact(cfg, what="sampler", prior="standard",
                                    out_path=str(tmp_path / "s.stablehlo"))
    a = np.asarray(serving.load_exported(p_flow).call(jnp.int32(3)))
    b = np.asarray(serving.load_exported(p_std).call(jnp.int32(3)))
    # a freshly-initialized flow is the EXACT identity (zero-init
    # couplings), so any difference proves the trained-flow branch baked
    assert np.isfinite(a).all() and not np.array_equal(a, b)

    p_sc = apv_tpu.export_artifact(cfg, what="scorer",
                                   out_path=str(tmp_path / "sc.stablehlo"))
    x = (np.random.default_rng(0).random(
        (4,) + tuple(cfg.model.image_shape)) < 0.5).astype(np.float32)
    s = np.asarray(serving.load_exported(p_sc).call(x, jnp.int32(0)))
    assert s.shape == (4,) and np.isfinite(s).all()


def test_latent_scatter_flow_prior():
    from apv_tpu.models import build_model
    from apv_tpu.sampling.latent_viz import latent_scatter_data
    from apv_tpu.training.step import make_train_fns

    cfg = _tiny_flow_cfg()
    state = make_train_fns(cfg).init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    x = (jax.random.uniform(jax.random.PRNGKey(1),
                            (32,) + tuple(cfg.model.image_shape))
         < 0.5).astype(jnp.float32)
    data = latent_scatter_data(model, state.params, x,
                               jax.random.PRNGKey(2), cfg.model.z_dim)
    assert "flow_prior" in data and "shaped_prior" not in data
    assert data["flow_prior"].shape == (32, 2)


def test_temperature_scales_model_prior_draws():
    """--temperature: the base draw is u ~ N(0, T²I) before the inverse
    pass — T changes the output at identical seed, T=1 reproduces the
    default path, and non-model-prior callers reject T≠1 loudly."""
    from apv_tpu.sampling.run import generate_samples
    from apv_tpu.training.step import make_train_fns

    cfg = _tiny_flow_cfg()
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    kw = dict(likelihood=cfg.model.likelihood, image_channels=1,
              model_prior=True, mode="mean")
    key = jax.random.PRNGKey(7)
    img_t1 = generate_samples(fns.model, state.params, key, 8,
                              cfg.model.z_dim, temperature=1.0, **kw)
    img_default = generate_samples(fns.model, state.params, key, 8,
                                   cfg.model.z_dim, **kw)
    img_t05 = generate_samples(fns.model, state.params, key, 8,
                               cfg.model.z_dim, temperature=0.5, **kw)
    np.testing.assert_array_equal(np.asarray(img_t1),
                                  np.asarray(img_default))
    assert not np.array_equal(np.asarray(img_t05), np.asarray(img_t1))
    with pytest.raises(ValueError, match="temperature"):
        generate_samples(fns.model, state.params, key, 8, cfg.model.z_dim,
                         likelihood=cfg.model.likelihood, image_channels=1,
                         temperature=0.5)
