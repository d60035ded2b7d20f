"""k-sharded IWAE over a 2-D (data × k) mesh (SURVEY.md §2.6, §5).

The IWAE importance-sample axis is this workload's "long axis": k=1000
decoder forwards per image. Beyond chunking it through a scan
(iwae_eval.py), it can be *sharded across chips*: a 2-D mesh splits the
batch over ``data`` and the k samples over ``k``; each chip streams its
k/n_k samples locally, then the running logsumexp states merge with one
``pmax`` + one ``psum`` over the k axis — the cross-chip equivalent of
the streaming-logsumexp fold (exactly associative, so the merged result
is the same estimator as a single-chip run over all k).

This rides ICI with O(batch) bytes per merge — negligible next to the
decoder FLOPs it parallelizes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.7 public API
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from apv_tpu.core.iwae import (LogSumExpState, streaming_logsumexp_init,
                               streaming_logsumexp_update)

DATA_AXIS = "data"
K_AXIS = "k"


def _mark_varying(x, axis_names):
    """pvary replacement: jax >= 0.9 spells it pcast(..., to='varying');
    keep the pvary fallback for older jax."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_names, to="varying")
    return jax.lax.pvary(x, axis_names)   # pragma: no cover


def make_mesh_2d(n_data: int, n_k: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_data * n_k:
        raise ValueError(f"need {n_data * n_k} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_data * n_k]).reshape(n_data, n_k)
    return Mesh(grid, (DATA_AXIS, K_AXIS))


def make_sharded_iwae_fn(model, likelihood: str, k: int, chunk: int,
                         mesh: Mesh, d_apply: Callable | None = None,
                         prior_logpdf: Callable | None = None,
                         prior_logpdf_p: Callable | None = None):
    """Build ``fn(params, d_params, x_in, x_target, key, log_z) -> [B]``.

    ``k`` is the TOTAL sample count; each of the mesh's n_k k-shards runs
    k/n_k samples chunk-by-chunk. With n_k == 1 this reduces exactly to the
    unsharded estimator (same key schedule — tested). ``prior_logpdf``
    swaps in an exact ex-post prior (iwae_eval.make_logw_chunk_fn) — its
    parameters close over as replicated constants, so the shard_map body
    needs no extra operands.
    """
    n_k = mesh.shape[K_AXIS]
    if k % (n_k * chunk) != 0:
        raise ValueError(f"k={k} must divide into n_k={n_k} shards of "
                         f"chunk={chunk}")
    k_local = k // n_k

    def encode(params, x):
        return model.apply({"params": params}, x, method="encode")

    def decode(params, z):
        return model.apply({"params": params}, z, method="decode")

    from apv_tpu.eval.iwae_eval import make_logw_chunk_fn
    local_logw_chunk = make_logw_chunk_fn(decode, likelihood, chunk, d_apply,
                                          prior_logpdf, prior_logpdf_p)
    n_data = mesh.shape[DATA_AXIS]

    def shard_fn(params, d_params, x_in, x_target, key, log_z):
        # x_in/x_target arrive as this chip's data shard; params replicated.
        mean, logvar = encode(params, x_in)
        b = mean.shape[0]
        k_idx = jax.lax.axis_index(K_AXIS)
        # Key schedule: shard i consumes chunk keys [i*n_chunks_local ...),
        # identical to the unsharded scan order when n_k == 1.
        n_chunks_local = k_local // chunk
        base = k_idx * n_chunks_local
        if n_data > 1:
            # Decorrelate posterior noise across data shards: the noise
            # draw depends only on (key, local shape), so without this
            # every data shard consumes the IDENTICAL [chunk, b, Z]
            # stream — importance samples would be correlated across
            # shard-aligned rows (found round 3, reproduced bitwise).
            # n_data == 1 keeps the key schedule exactly equal to the
            # unsharded estimator's (the n_k-equivalence contract).
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

        def body(state: LogSumExpState, i):
            chunk_key = jax.random.fold_in(key, base + i)
            logw = local_logw_chunk(params, d_params, mean, logvar, x_target,
                                    chunk_key, log_z)
            return streaming_logsumexp_update(state, logw), None

        init = streaming_logsumexp_init((b,))
        # shard_map's varying-axis typing: the carry must be marked varying
        # over the mesh axes since the body's outputs are.
        init = jax.tree.map(
            lambda a: _mark_varying(a, tuple(mesh.axis_names)), init)
        state, _ = jax.lax.scan(body, init, jnp.arange(n_chunks_local))
        # Cross-chip merge over the k axis: associative logsumexp fold.
        gmax = jax.lax.pmax(state.max, K_AXIS)
        acc = state.acc * jnp.exp(jnp.where(jnp.isfinite(state.max),
                                            state.max - gmax, -jnp.inf))
        gacc = jax.lax.psum(acc, K_AXIS)
        ll = gmax + jnp.log(gacc) - jnp.log(float(k))
        return ll

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=P(DATA_AXIS),
    )
