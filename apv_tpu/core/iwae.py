"""IWAE importance-weighted log-likelihood estimator (SURVEY.md §2.2, §3.3).

    log p(x) ≈ logsumexp_k [ log p(x, z_k) - log q(z_k | x) ] - log k

The k=1000 configuration cannot materialize all k activations at once, so the
estimator is built around a *streaming* logsumexp: chunks of importance
weights are folded into a running (max, scaled-sum) state inside a
``lax.scan``. Chunking is exactly associative in this representation, so
chunked == unchunked to float tolerance (tested).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LogSumExpState(NamedTuple):
    """Running logsumexp over a streamed axis: value = max + log(acc)."""
    max: jax.Array   # running maximum of the stream
    acc: jax.Array   # sum of exp(w - max) seen so far
    count: jax.Array  # number of items folded in (for the -log k term)


def streaming_logsumexp_init(shape: tuple[int, ...]) -> LogSumExpState:
    return LogSumExpState(
        max=jnp.full(shape, -jnp.inf, dtype=jnp.float32),
        acc=jnp.zeros(shape, dtype=jnp.float32),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def streaming_logsumexp_update(state: LogSumExpState, logw: jax.Array) -> LogSumExpState:
    """Fold a chunk of log-weights (chunk axis 0) into the running state."""
    logw = logw.astype(jnp.float32)
    chunk_max = jnp.max(logw, axis=0)
    new_max = jnp.maximum(state.max, chunk_max)
    # Rescale the old accumulator to the new max; -inf max with empty acc is
    # fine because exp(-inf - finite) = 0.
    old = state.acc * jnp.exp(jnp.where(jnp.isfinite(state.max),
                                        state.max - new_max, -jnp.inf))
    new = jnp.sum(jnp.exp(logw - new_max[None]), axis=0)
    return LogSumExpState(max=new_max, acc=old + new,
                          count=state.count + logw.shape[0])


def streaming_logsumexp_finalize(state: LogSumExpState) -> jax.Array:
    """logsumexp - log(count): the IWAE average in log space."""
    return state.max + jnp.log(state.acc) - jnp.log(state.count.astype(jnp.float32))


def streaming_logsumexp(logw_chunks: jax.Array) -> jax.Array:
    """Reference: fold chunks [n_chunks, chunk, ...] → logmeanexp over k."""
    state = streaming_logsumexp_init(logw_chunks.shape[2:])
    state = jax.lax.fori_loop(
        0, logw_chunks.shape[0],
        lambda i, s: streaming_logsumexp_update(s, logw_chunks[i]), state)
    return streaming_logsumexp_finalize(state)


def iwae_log_likelihood(
    logw_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    k: int,
    chunk_size: int,
    out_shape: tuple[int, ...],
) -> jax.Array:
    """Estimate log p(x) with k importance samples, chunk_size at a time.

    ``logw_fn(key) -> [chunk_size, *out_shape]`` draws ``chunk_size`` fresh
    importance samples and returns log p(x, z) - log q(z|x). The k axis is
    streamed through a ``lax.scan`` so peak memory is one chunk of decoder
    activations (SURVEY.md §3.3: "chunk k at ~50-100").
    """
    if k % chunk_size != 0:
        raise ValueError(f"k={k} must be divisible by chunk_size={chunk_size}")
    n_chunks = k // chunk_size
    keys = jax.random.split(key, n_chunks)

    def body(state: LogSumExpState, chunk_key: jax.Array):
        return streaming_logsumexp_update(state, logw_fn(chunk_key)), None

    state, _ = jax.lax.scan(body, streaming_logsumexp_init(out_shape), keys)
    return streaming_logsumexp_finalize(state)
