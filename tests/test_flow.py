"""Ex-post RealNVP flow prior (core/flow.py + the expost_flow plumbing).

The flow's contracts: exact invertibility, exact log-determinant (so the
NLL path's 'proper likelihood, no MC log-partition' claim holds), identity
at init, and a fit that actually carries non-Gaussian structure a diagonal
Gaussian cannot — the measured gap it exists for (RESULTS.md 800k A/B).
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config


def _perturbed_flow(key, z_dim, n_layers=4, hidden=16):
    """A random NON-identity flow: init (identity) plus noise on every
    weight, so the round-trip/logdet tests exercise real couplings."""
    from apv_tpu.core.flow import init_flow

    params = init_flow(key, z_dim, n_layers=n_layers, hidden=hidden,
                       mean=jnp.arange(z_dim, dtype=jnp.float32) * 0.1,
                       std=jnp.linspace(0.5, 2.0, z_dim))
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    # modest noise: fitted flows are identity-initialized and weight-
    # decayed; a 0.3-noise flow stacks e^±3 scales into f32-hostile
    # thousands-magnitude intermediates (verified exact in f64)
    leaves = [l + 0.05 * jax.random.normal(k, l.shape) if l.ndim > 0 else l
              for l, k in zip(leaves, ks)]
    return jax.tree.unflatten(treedef, leaves)


def test_flow_identity_at_init():
    """Zero-initialized couplings: the flow IS the whitening transform,
    so its density equals the diagonal Gaussian at the whiten moments."""
    from apv_tpu.core.distributions import gaussian_logpdf
    from apv_tpu.core.flow import flow_logpdf, init_flow

    z_dim = 6
    mean = jnp.linspace(-1.0, 1.0, z_dim)
    std = jnp.linspace(0.5, 3.0, z_dim)
    params = init_flow(jax.random.PRNGKey(0), z_dim, mean=mean, std=std)
    z = jax.random.normal(jax.random.PRNGKey(1), (128, z_dim)) * 2.0
    got = flow_logpdf(params, z)
    want = jnp.sum(gaussian_logpdf(z, mean, 2.0 * jnp.log(std)), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flow_inverse_roundtrip():
    from apv_tpu.core.flow import flow_forward, flow_inverse

    z_dim = 8
    params = _perturbed_flow(jax.random.PRNGKey(0), z_dim)
    z = jax.random.normal(jax.random.PRNGKey(2), (64, z_dim)) * 3.0
    u, _ = flow_forward(params, z)
    assert not np.allclose(np.asarray(u), np.asarray(z))  # non-identity
    np.testing.assert_allclose(np.asarray(flow_inverse(params, u)),
                               np.asarray(z), rtol=2e-4, atol=2e-4)
    # and the other direction
    zz = flow_inverse(params, u)
    u2, _ = flow_forward(params, zz)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u),
                               rtol=2e-4, atol=2e-4)


def test_flow_logdet_exact():
    """log|det du/dz| from the coupling sum must equal the autodiff
    Jacobian's slogdet — the exactness the closed-form NLL rests on."""
    from apv_tpu.core.flow import flow_forward

    z_dim = 4
    params = _perturbed_flow(jax.random.PRNGKey(3), z_dim, n_layers=3)
    z = jax.random.normal(jax.random.PRNGKey(4), (8, z_dim))

    def fwd_one(zi):
        u, ld = flow_forward(params, zi[None])
        return u[0], ld[0]

    _, ld = jax.vmap(fwd_one)(z)
    jac = jax.vmap(jax.jacfwd(lambda zi: fwd_one(zi)[0]))(z)
    _, want = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fit_flow_beats_diag_gaussian_on_banana():
    """MLE fit on a banana density (the canonical curved, heavy-shouldered
    target no diagonal Gaussian can carry): heldout NLL must beat the
    diagonal-Gaussian fit by a clear margin, and flow samples must land
    on the banana (the curvature statistic E[z2 − z1²/2] ≈ 0)."""
    from apv_tpu.core.distributions import gaussian_logpdf
    from apv_tpu.core.flow import fit_flow, flow_inverse, flow_logpdf

    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 6144
    z1 = 2.0 * jax.random.normal(k1, (n,))
    z2 = 0.5 * z1**2 + 0.3 * jax.random.normal(k2, (n,))
    z = jnp.stack([z1, z2], axis=1)
    train, hold = z[:4096], z[4096:]

    flow, trace = fit_flow(k3, train, n_layers=4, hidden=32, steps=400,
                           batch=512)
    assert float(trace[-1]) < float(trace[0])  # the fit descended

    flow_nll = -float(jnp.mean(flow_logpdf(flow, hold)))
    mean, var = jnp.mean(train, 0), jnp.var(train, 0)
    gauss_nll = -float(jnp.mean(jnp.sum(
        gaussian_logpdf(hold, mean, jnp.log(var)), -1)))
    assert flow_nll < gauss_nll - 0.3, (flow_nll, gauss_nll)

    s = flow_inverse(flow, jax.random.normal(k4, (4096, 2)))
    curve = float(jnp.mean(s[:, 1] - 0.5 * s[:, 0] ** 2))
    assert abs(curve) < 0.5, curve  # a Gaussian fit sits at ≈ +1.0 here
    assert bool(jnp.all(jnp.isfinite(s)))


def test_expost_flow_prior_end_to_end():
    """Fit on a tiny model: the returned dict samples and scores through
    the two prior_moments owners, and generate_samples decodes from it."""
    from apv_tpu.models import build_model
    from apv_tpu.sampling.run import (expost_prior_flow,
                                      expost_prior_logpdf,
                                      expost_prior_sample,
                                      generate_samples)
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_vae")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (64,) + tuple(cfg.model.image_shape))

    flow = expost_prior_flow(model, state.params, x, jax.random.PRNGKey(2),
                             n_layers=2, hidden=8, steps=30)
    assert "layers" in flow and np.isfinite(float(flow["flow_nll"]))

    zd = cfg.model.z_dim
    zs = expost_prior_sample(jax.random.PRNGKey(3), flow, 32, zd)
    assert zs.shape == (32, zd) and bool(jnp.all(jnp.isfinite(zs)))
    lp = expost_prior_logpdf(flow)(zs)
    assert lp.shape == (32,) and bool(jnp.all(jnp.isfinite(lp)))

    imgs = generate_samples(model, state.params, jax.random.PRNGKey(4),
                            16, zd, cfg.model.likelihood, 1,
                            prior_moments=flow)
    assert imgs.shape == (16,) + tuple(cfg.model.image_shape)


def test_sample_and_evaluate_api_expost_flow(tmp_path):
    """End-to-end: apv sample/evaluate --prior expost_flow on a tiny
    checkpoint; the eval result is exact (no MC log-partition term)."""
    import apv_tpu

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    imgs = apv_tpu.sample(cfg, n=8, prior="expost_flow", flow_steps=30)
    assert imgs.shape == (8,) + tuple(cfg.model.image_shape)

    res = apv_tpu.evaluate(cfg, prior="expost_flow", flow_steps=30,
                           k=4, activity=False)
    assert res["prior"] == "expost_flow"
    assert res["log_partition"] == 0.0 and res["log_partition_se"] == 0.0
    assert np.isfinite(res["nll_nats"])


def test_export_sampler_expost_flow(tmp_path):
    """The flow prior bakes into a StableHLO sampler artifact and the
    artifact's draws match the in-process sampler draws."""
    import apv_tpu
    from apv_tpu import serving

    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 1, "train.eval_every": 0, "train.batch_size": 8,
        "train.checkpoint_every": 1, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    path = apv_tpu.export_artifact(cfg, what="sampler", prior="expost_flow",
                                   flow_steps=30,
                                   out_path=str(tmp_path / "s.stablehlo"))
    imgs = np.asarray(serving.load_exported(path).call(jnp.int32(7)))
    assert imgs.shape[1:] == tuple(cfg.model.image_shape)
    assert np.isfinite(imgs).all()
