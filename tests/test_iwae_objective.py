"""IWAE-k TRAINING objective tests (train.objective=iwae).

The gradient-estimator checks run on a hand-built linear toy model (explicit
params dict, exact control over the encoder/decoder split) so the DReG
identities can be asserted EXACTLY:

  * value: dreg == reparam (same bound, value+surrogate trick);
  * decoder params: dreg grad == reparam grad (both are sum_i w~_i drecon/dth);
  * k=1: dreg == STL (score term removed, path-only), reparam == naive MC-ELBO
    autodiff, and STL != naive (the score term is real — proves the
    stop-gradient wiring does something).

Integration smokes run make_train_fns with objective=iwae on the real models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from apv_tpu import ops
from apv_tpu.core import distributions as D
from apv_tpu.training import losses as L
from apv_tpu.training.step import make_train_fns

B, DX, Z = 16, 12, 4


def _toy():
    rng = np.random.default_rng(0)
    params = {
        "enc_w": jnp.asarray(rng.normal(0, 0.3, (DX, 2 * Z)), jnp.float32),
        "dec_w": jnp.asarray(rng.normal(0, 0.3, (Z, DX)), jnp.float32),
    }

    def encode(p, x):
        h = x @ p["enc_w"]
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.tanh(logvar)

    def decode(p, z):
        return z @ p["dec_w"]

    x = jnp.asarray(rng.random((B, DX)) < 0.4, jnp.float32)
    return params, encode, decode, x


def _sample_like_objective(key, mean, logvar, k):
    """Reproduce iwae_objective's internal draw exactly."""
    mean_k = jnp.broadcast_to(mean[None], (k,) + mean.shape)
    logvar_k = jnp.broadcast_to(logvar[None], (k,) + logvar.shape)
    return ops.reparam_sample(key, mean_k, logvar_k)


def _objective_fn(encode, decode, x, key, k, grad_est, beta=1.0):
    def fn(p):
        obj, _, _ = L.iwae_objective(encode, decode, p, x, x, key,
                                     "bernoulli", k, jnp.float32(beta),
                                     grad_est)
        return obj
    return fn


def test_dreg_and_reparam_same_value():
    params, encode, decode, x = _toy()
    key = jax.random.PRNGKey(3)
    v_rep = _objective_fn(encode, decode, x, key, 8, "reparam")(params)
    v_dreg = _objective_fn(encode, decode, x, key, 8, "dreg")(params)
    np.testing.assert_allclose(np.asarray(v_rep), np.asarray(v_dreg),
                               rtol=1e-5)


def test_dreg_equals_reparam_for_decoder_params():
    """For decoder params both estimators are sum_i w~_i * drecon_i/dtheta."""
    params, encode, decode, x = _toy()
    key = jax.random.PRNGKey(7)
    g_rep = jax.grad(_objective_fn(encode, decode, x, key, 8, "reparam"))(
        params)
    g_dreg = jax.grad(_objective_fn(encode, decode, x, key, 8, "dreg"))(
        params)
    np.testing.assert_allclose(np.asarray(g_rep["dec_w"]),
                               np.asarray(g_dreg["dec_w"]), atol=1e-5)
    # ...and for ENCODER params they must DIFFER (w~^2 reweighting + score
    # removal) — otherwise dreg is silently falling through to reparam.
    diff = np.abs(np.asarray(g_rep["enc_w"]) - np.asarray(g_dreg["enc_w"]))
    assert diff.max() > 1e-4, "dreg encoder grads identical to reparam"


def _manual_k1_loss(encode, decode, x, key, stop_score):
    """Single-sample MC-ELBO with the same draw as iwae_objective(k=1);
    stop_score=True removes q's direct (score) dependence — the STL/DReG
    k=1 gradient."""
    def fn(p):
        mean, logvar = encode(p, x)
        z = _sample_like_objective(key, mean, logvar, 1)
        m, lv = ((jax.lax.stop_gradient(mean), jax.lax.stop_gradient(logvar))
                 if stop_score else (mean, logvar))
        recon = L.recon_log_likelihood(x, decode(p, z[0]), "bernoulli")
        logp0 = jnp.sum(D.standard_gaussian_logpdf(z[0]), axis=-1)
        logq = jnp.sum(D.gaussian_logpdf(z[0], m, lv), axis=-1)
        return jnp.mean(recon + logp0 - logq)
    return fn


def test_k1_reparam_is_naive_mc_elbo():
    params, encode, decode, x = _toy()
    key = jax.random.PRNGKey(11)
    obj = _objective_fn(encode, decode, x, key, 1, "reparam")
    naive = _manual_k1_loss(encode, decode, x, key, stop_score=False)
    np.testing.assert_allclose(np.asarray(obj(params)),
                               np.asarray(naive(params)), rtol=1e-5)
    g_obj, g_naive = jax.grad(obj)(params), jax.grad(naive)(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_obj[k]),
                                   np.asarray(g_naive[k]), atol=1e-5)


def test_k1_dreg_is_stl():
    """k=1 DReG = path-only (score-removed) gradient, != the naive one."""
    params, encode, decode, x = _toy()
    key = jax.random.PRNGKey(13)
    g_dreg = jax.grad(_objective_fn(encode, decode, x, key, 1, "dreg"))(
        params)
    g_stl = jax.grad(_manual_k1_loss(encode, decode, x, key,
                                     stop_score=True))(params)
    g_naive = jax.grad(_manual_k1_loss(encode, decode, x, key,
                                       stop_score=False))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_dreg[k]),
                                   np.asarray(g_stl[k]), atol=1e-5)
    assert np.abs(np.asarray(g_stl["enc_w"])
                  - np.asarray(g_naive["enc_w"])).max() > 1e-4, \
        "score term vanished — stop-gradient wiring suspect"


def test_bound_tightens_with_k():
    params, encode, decode, x = _toy()
    key = jax.random.PRNGKey(17)
    v1 = _objective_fn(encode, decode, x, key, 1, "reparam")(params)
    v16 = _objective_fn(encode, decode, x, key, 16, "reparam")(params)
    assert float(v16) > float(v1), (float(v1), float(v16))


def test_bad_grad_estimator_raises():
    params, encode, decode, x = _toy()
    with pytest.raises(ValueError, match="grad estimator"):
        _objective_fn(encode, decode, x, jax.random.PRNGKey(0), 2,
                      "nonsense")(params)


# -- integration through make_train_fns -------------------------------------

def _synthetic_batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    h, w, c = cfg.model.image_shape
    if cfg.data.binarize:
        img = (rng.random((n, h, w, c)) < 0.3).astype(np.float32)
    else:
        img = rng.integers(0, 256, size=(n, h, w, c)).astype(np.uint8)
    return {"image": img}


def _train(cfg, n_steps):
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    hist = []
    for _ in range(n_steps):
        state, m = step(state, batch)
        hist.append({k: float(v) for k, v in m.items()})
    return hist


def test_iwae_objective_trains_plain_vae():
    cfg = tiny_config("mnist_vae", **{"train.objective": "iwae",
                                      "train.iwae_k": 3})
    hist = _train(cfg, 40)
    assert hist[-1]["iwae_bound"] > hist[0]["iwae_bound"] + 10, \
        (hist[0]["iwae_bound"], hist[-1]["iwae_bound"])
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert "elbo" in hist[-1] and "kl" in hist[-1]    # reporting continuity


@pytest.mark.parametrize("variant", ["learned_prior", "aae"])
def test_iwae_objective_trains_adversarial(variant):
    cfg = tiny_config("mnist_advprior", **{"train.objective": "iwae",
                                           "train.iwae_k": 3,
                                           "adversarial.variant": variant})
    hist = _train(cfg, 30)
    assert hist[-1]["iwae_bound"] > hist[0]["iwae_bound"], \
        (hist[0]["iwae_bound"], hist[-1]["iwae_bound"])
    assert "d_loss" in hist[-1] and "g_adv" in hist[-1]
    assert all(np.isfinite(h["d_loss"]) for h in hist)


def test_iwae_objective_reparam_variant_trains():
    cfg = tiny_config("mnist_vae", **{"train.objective": "iwae",
                                      "train.iwae_k": 3,
                                      "train.iwae_grad": "reparam"})
    hist = _train(cfg, 30)
    assert hist[-1]["iwae_bound"] > hist[0]["iwae_bound"]


def test_free_bits_plus_iwae_rejected():
    cfg = tiny_config("mnist_vae", **{"train.objective": "iwae",
                                      "train.free_bits": 0.1})
    with pytest.raises(ValueError, match="free_bits"):
        make_train_fns(cfg)


def test_unknown_objective_rejected():
    cfg = tiny_config("mnist_vae", **{"train.objective": "wrong"})
    with pytest.raises(ValueError, match="objective"):
        make_train_fns(cfg)
