"""Device mesh construction and sharding helpers.

Design (scaling-book recipe, SURVEY.md §5 "Distributed communication
backend"): a 1-D ``data`` mesh over all chips; batches sharded on axis 0,
parameters + optimizer state replicated; ``jax.jit`` with these shardings
lets XLA insert the gradient all-reduce over ICI — no hand-written
collectives in the hot path. The step function is mesh-shape-agnostic:
the same code runs on 1 chip, a v5e-8, or a CPU-backed virtual mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, *, n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_data_sharding(mesh: Mesh) -> NamedSharding:
    """[k, B, ...] batch stacks (train.steps_per_call): the scan axis is
    replicated in time, the batch axis (1) sharded over the data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf NamedSharding pytree matching a batch dict."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda _: s, batch)
