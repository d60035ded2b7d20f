"""Multi-device-without-a-cluster tests (SURVEY.md §4): the 8-device CPU
mesh's sharded step must equal the single-device step bit-for-bit(ish)."""

import jax
import numpy as np

from conftest import tiny_config
from apv_tpu.parallel import data_sharding, make_mesh, replicated
from apv_tpu.training.step import make_train_fns
from test_train import _synthetic_batch


def _one_step(cfg, mesh, batch):
    fns = make_train_fns(cfg)
    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(0))
    sharded = {k: jax.device_put(v, data_sharding(mesh))
               for k, v in batch.items()}
    step = jax.jit(fns.train_step)
    with mesh:
        # two steps: LR warmup starts at exactly 0, so step 0 leaves the VAE
        # params untouched and the parity assert would be vacuous
        state, metrics = step(state, sharded)
        state, metrics = step(state, sharded)
    return jax.device_get(state), {k: float(v) for k, v in metrics.items()}


def _assert_tree_close(a, b, rtol, atol):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


def test_sharded_step_matches_single_device_plain():
    cfg = tiny_config("mnist_vae")
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    mesh8 = make_mesh()
    mesh1 = make_mesh(jax.devices()[:1])
    s8, m8 = _one_step(cfg, mesh8, batch)
    s1, m1 = _one_step(cfg, mesh1, batch)
    # Same global batch, replicated params: the all-reduced grads must match
    # the single-device grads on the concatenated batch.
    np.testing.assert_allclose(m8["loss"], m1["loss"], rtol=1e-5)
    _assert_tree_close(s8.params, s1.params, rtol=1e-4, atol=1e-5)


def test_sharded_step_matches_single_device_adversarial():
    cfg = tiny_config("mnist_advprior")
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    s8, m8 = _one_step(cfg, make_mesh(), batch)
    s1, m1 = _one_step(cfg, make_mesh(jax.devices()[:1]), batch)
    np.testing.assert_allclose(m8["d_loss"], m1["d_loss"], rtol=1e-5,
                               atol=1e-6)
    _assert_tree_close(s8.params, s1.params, rtol=1e-4, atol=1e-5)
    _assert_tree_close(s8.d_params, s1.d_params, rtol=1e-4, atol=1e-5)


def test_batch_shards_across_devices():
    cfg = tiny_config("mnist_vae")
    mesh = make_mesh()
    batch = _synthetic_batch(cfg, 32)
    x = jax.device_put(batch["image"], data_sharding(mesh))
    # each of the 8 devices holds a [4, H, W, C] shard
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(4,) + batch["image"].shape[1:]}
