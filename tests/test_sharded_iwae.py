"""k-sharded IWAE: the cross-chip logsumexp merge must reproduce the
single-shard estimator exactly (same key schedule), and scale over a 2-D
mesh (SURVEY.md §2.6 "IWAE-k ... k-sharding")."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from apv_tpu.eval.sharded import make_mesh_2d, make_sharded_iwae_fn
from apv_tpu.models import build_model
from apv_tpu.training.step import make_train_fns


def _setup():
    cfg = tiny_config("mnist_vae")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = (rng.random((8, 28, 28, 1)) < 0.4).astype(np.float32)
    return cfg, model, state.params, x


def test_ksharded_matches_single_shard_exactly():
    """n_k=4 merged result == n_k=1 result with identical total k and key
    schedule (associativity of the streaming fold, now across chips)."""
    cfg, model, params, x = _setup()
    key = jax.random.PRNGKey(11)

    mesh_1 = make_mesh_2d(1, 1, jax.devices()[:1])
    f1 = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4, mesh=mesh_1)
    ll_1 = np.asarray(jax.jit(f1)(params, {}, x, x, key, 0.0))

    mesh_4 = make_mesh_2d(1, 4, jax.devices()[:4])
    f4 = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4, mesh=mesh_4)
    ll_4 = np.asarray(jax.jit(f4)(params, {}, x, x, key, 0.0))

    np.testing.assert_allclose(ll_4, ll_1, rtol=1e-5, atol=1e-4)


def test_full_2d_mesh_data_and_k():
    """2 data shards × 4 k shards: runs, finite, batch stays intact."""
    cfg, model, params, x = _setup()
    mesh = make_mesh_2d(2, 4)
    f = make_sharded_iwae_fn(model, "bernoulli", k=32, chunk=4, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ll = np.asarray(jax.jit(f)(params, {}, xs, xs, jax.random.PRNGKey(3), 0.0))
    assert ll.shape == (8,)
    assert np.all(np.isfinite(ll))


def test_ksharded_with_adversarial_prior():
    cfg, model, params, x = _setup()
    from apv_tpu.models import LatentDiscriminator
    disc = LatentDiscriminator((16,))
    d_params = disc.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, cfg.model.z_dim)))["params"]

    def d_apply(dp, z):
        return disc.apply({"params": dp}, z)

    mesh = make_mesh_2d(2, 2, jax.devices()[:4])
    f = make_sharded_iwae_fn(model, "bernoulli", k=8, chunk=2, mesh=mesh,
                             d_apply=d_apply)
    ll = np.asarray(jax.jit(f)(params, d_params, x, x,
                               jax.random.PRNGKey(5), 0.12))
    assert np.all(np.isfinite(ll))


def test_ksharded_expost_prior_matches_unsharded():
    """The ex-post prior threads through the shard_map body as closed-over
    replicated constants: n_k=4 equals n_k=1 exactly, and a GMM ex-post
    prior equivalent to N(0,I) (K=1, zero mean, unit var) reproduces the
    standard-prior estimator."""
    from apv_tpu.sampling.run import expost_prior_logpdf

    cfg, model, params, x = _setup()
    zd = cfg.model.z_dim
    key = jax.random.PRNGKey(11)
    gmm = (jnp.zeros((1,)), jnp.zeros((1, zd)), jnp.ones((1, zd)))
    logpdf = expost_prior_logpdf(gmm)

    mesh_1 = make_mesh_2d(1, 1, jax.devices()[:1])
    base = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4,
                                mesh=mesh_1)
    ll_base = np.asarray(jax.jit(base)(params, {}, x, x, key, 0.0))

    f1 = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4,
                              mesh=mesh_1, prior_logpdf=logpdf)
    ll_1 = np.asarray(jax.jit(f1)(params, {}, x, x, key, 0.0))
    np.testing.assert_allclose(ll_1, ll_base, rtol=1e-5, atol=1e-4)

    mesh_4 = make_mesh_2d(1, 4, jax.devices()[:4])
    f4 = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4,
                              mesh=mesh_4, prior_logpdf=logpdf)
    ll_4 = np.asarray(jax.jit(f4)(params, {}, x, x, key, 0.0))
    np.testing.assert_allclose(ll_4, ll_1, rtol=1e-5, atol=1e-4)

    # the flow form too: an identity-initialized flow (zero-init
    # couplings, unit whitening) IS N(0,I), and its params-dict closure
    # must thread through the shard_map body like the tuple forms
    from apv_tpu.core.flow import init_flow
    flow = init_flow(jax.random.PRNGKey(0), zd, n_layers=2, hidden=4)
    ff = make_sharded_iwae_fn(model, "bernoulli", k=16, chunk=4,
                              mesh=mesh_4,
                              prior_logpdf=expost_prior_logpdf(flow))
    ll_f = np.asarray(jax.jit(ff)(params, {}, x, x, key, 0.0))
    np.testing.assert_allclose(ll_f, ll_1, rtol=1e-5, atol=1e-4)


def test_evaluate_nll_with_k_shards():
    """End-to-end evaluate path with the k-sharded estimator."""
    from apv_tpu.eval.run import evaluate_nll
    cfg = tiny_config("mnist_vae", **{"eval.k_shards": 2})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    res = evaluate_nll(cfg, state.params, k=8, chunk=4, max_examples=32)
    assert np.isfinite(res["nll_nats"])
    assert res["num_examples"] == 32


def test_rejects_bad_shard_arithmetic():
    import pytest
    cfg, model, params, x = _setup()
    mesh = make_mesh_2d(1, 4, jax.devices()[:4])
    with pytest.raises(ValueError):
        make_sharded_iwae_fn(model, "bernoulli", k=10, chunk=2, mesh=mesh)
    with pytest.raises(ValueError):
        make_mesh_2d(4, 4)          # only 8 devices


def test_ksharded_multihost_assembly_matches_global():
    """Simulated 2-host layout on the (2 data x 4 k) mesh: host p owns
    devices [4p:4p+4] — exactly data row p — so per-host row blocks
    assembled shard-by-shard (the make_array_from_process_local_data
    layout under jax.distributed) score identically to a single-host
    global device_put; and _local_rows dedupes the k-replica shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, model, params, x = _setup()
    mesh = make_mesh_2d(2, 4)
    f = jax.jit(make_sharded_iwae_fn(model, "bernoulli", k=32, chunk=4,
                                     mesh=mesh))
    shard = NamedSharding(mesh, P("data"))
    key = jax.random.PRNGKey(3)
    xg = jax.device_put(x, shard)
    ll_global = f(params, {}, xg, xg, key, 0.0)

    devices = list(mesh.devices.ravel())        # row-major: [data, k]
    rows = [x[:4], x[4:]]                       # host p's Batcher host_shard
    shards = [jax.device_put(rows[p], devices[p * 4 + d])
              for p in range(2) for d in range(4)]
    xa = jax.make_array_from_single_device_arrays(x.shape, shard, shards)
    ll_asm = f(params, {}, xa, xa, key, 0.0)
    np.testing.assert_allclose(np.asarray(ll_asm), np.asarray(ll_global),
                               rtol=1e-6)

    # the score vector is replicated over k: _local_rows must return each
    # data row once, in order — not n_k copies
    from apv_tpu.eval.run import _local_rows
    assert len(ll_global.addressable_shards) == 8
    np.testing.assert_array_equal(_local_rows(ll_global),
                                  np.asarray(ll_global))


def test_ksharded_multihost_alignment_guard(monkeypatch):
    """k_shards that strand a data row across processes must be rejected
    with a clear error (not silently mis-sharded)."""
    import pytest
    from apv_tpu.eval.run import evaluate_nll

    cfg = tiny_config("mnist_vae", **{"eval.k_shards": 4})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    monkeypatch.setattr(jax, "process_count", lambda: 3)   # 8//3 dev/proc
    with pytest.raises(ValueError, match="k_shards"):
        evaluate_nll(cfg, state.params, k=8, chunk=2, max_examples=32)

    # pcount | n_data alone is NOT sufficient: 8 devices / 2 processes with
    # n_k=3 gives n_data=2 (divisible by 2), but the row-major (data, k)
    # grid puts data row 1 on devices [3,4,5] — straddling both processes.
    cfg3 = tiny_config("mnist_vae", **{"eval.k_shards": 3})
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="straddle"):
        evaluate_nll(cfg3, state.params, k=9, chunk=3, max_examples=32)


def test_data_shards_draw_independent_noise():
    """Duplicated rows placed in DIFFERENT data shards must not score
    bitwise-identically: without folding the data-axis index into the
    chunk key, every data shard consumes the same posterior-noise stream
    (round-3 review finding, reproduced bitwise before the fix)."""
    cfg, model, params, x = _setup()
    x2 = np.concatenate([x[:4], x[:4]])        # rows 0-3 == rows 4-7
    mesh = make_mesh_2d(2, 2, jax.devices()[:4])
    f = make_sharded_iwae_fn(model, "bernoulli", k=8, chunk=2, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x2, NamedSharding(mesh, P("data")))
    ll = np.asarray(jax.jit(f)(params, {}, xs, xs, jax.random.PRNGKey(7),
                               0.0))
    assert np.all(np.isfinite(ll))
    # same rows, different shards: estimates agree statistically but must
    # come from independent draws (k=8 spread makes equality ~impossible)
    assert np.max(np.abs(ll[:4] - ll[4:])) > 1e-7
