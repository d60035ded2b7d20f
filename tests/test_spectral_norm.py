"""Spectral-normalized latent discriminator (models/discriminator.SNDense).

The D-saturation failure mode (RESULTS.md GAN sweep: saturated D → lost
prior-ratio signal AND worse ELBO) has three config-switchable
mitigations: label smoothing, R1 penalty, and spectral normalization.
These tests pin the SN implementation against numpy SVD ground truth and
the 1-Lipschitz property it exists to enforce.
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config


def test_sn_dense_matches_svd_sigma():
    """SNDense must divide by the true spectral norm: build a kernel with
    a known, well-separated top singular value and compare the output to
    the numpy-SVD-normalized affine map."""
    from apv_tpu.models import SNDense

    rng = np.random.default_rng(0)
    u, _ = np.linalg.qr(rng.normal(size=(16, 16)))
    v, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    s = np.zeros((16, 8))
    np.fill_diagonal(s, [3.0, 1.0, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05])
    kernel = (u @ s @ v).astype(np.float32)          # sigma_max = 3, gap 3x
    bias = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(4, 16)).astype(np.float32)

    y = SNDense(8).apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        jnp.asarray(x))
    sigma = np.linalg.svd(kernel, compute_uv=False)[0]
    expected = x @ (kernel / sigma) + bias
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)


def test_sn_dense_zero_column_sum_kernel():
    """Regression (round-3 review): a kernel whose columns sum to zero is
    exactly orthogonal to an all-ones power-iteration start — the old
    fixed start returned sigma=0 and NaN outputs. The random fixed start
    must recover the true sigma."""
    from apv_tpu.models import SNDense

    kernel = np.array([[1.0, 1.0, 1.0],
                       [-1.0, -1.0, -1.0],
                       [0.0, 0.0, 0.0],
                       [0.0, 0.0, 0.0]], np.float32)   # columns sum to 0
    x = np.eye(4, dtype=np.float32)
    y = SNDense(3).apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.zeros((3,))}}, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))
    sigma = np.linalg.svd(kernel, compute_uv=False)[0]
    np.testing.assert_allclose(np.asarray(y), x @ (kernel / sigma),
                               atol=1e-4)


def test_sn_dense_zero_kernel_degrades_to_zero_map():
    from apv_tpu.models import SNDense

    y = SNDense(3).apply(
        {"params": {"kernel": jnp.zeros((4, 3)), "bias": jnp.zeros((3,))}},
        jnp.ones((2, 4)))
    assert np.all(np.asarray(y) == 0.0)


def test_sn_discriminator_is_1_lipschitz():
    """With SN on every layer and leaky_relu (slope ≤ 1), the whole D is
    1-Lipschitz: |D(a) − D(b)| ≤ ‖a − b‖ for all pairs."""
    from apv_tpu.models import LatentDiscriminator

    disc = LatentDiscriminator((32, 32), spectral_norm=True)
    params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"]
    key_a, key_b = jax.random.split(jax.random.PRNGKey(1))
    a = 5.0 * jax.random.normal(key_a, (256, 8))
    b = 5.0 * jax.random.normal(key_b, (256, 8))
    da = disc.apply({"params": params}, a)
    db = disc.apply({"params": params}, b)
    ratio = jnp.abs(da - db) / (jnp.linalg.norm(a - b, axis=-1) + 1e-12)
    # power iteration is approximate: allow 1% slack over the exact bound
    assert float(ratio.max()) <= 1.01, float(ratio.max())


def test_make_latent_d_threads_config():
    from apv_tpu.models import make_latent_d

    cfg = tiny_config("mnist_advprior",
                      **{"adversarial.d_spectral_norm": True})
    disc = make_latent_d(cfg.adversarial)
    assert disc.spectral_norm is True
    assert disc.widths == tuple(cfg.adversarial.d_widths)


def test_sn_adversarial_training_step_runs():
    """Five adversarial steps with the SN discriminator: finite losses,
    D params update, and the d_loss stays in a sane bce range."""
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_advprior",
                      **{"adversarial.d_spectral_norm": True,
                         "train.batch_size": 8})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.d_params)
    batch = {"image": jnp.zeros((8,) + tuple(cfg.model.image_shape),
                                jnp.uint8)}
    metrics = None
    for _ in range(5):
        state, metrics = fns.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), d0,
        state.d_params)
    assert any(jax.tree.leaves(moved))
