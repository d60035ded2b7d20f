"""Multi-host (DCN-spanning) groundwork behind a flag (SURVEY.md §2.6
"mesh-shape-agnostic"; §5 notes v5e-8 is single-host, ICI-only — this
module is the documented path beyond it).

Recipe (scaling-book): every process calls ``jax.distributed.initialize``
before first backend use, builds the SAME global mesh over
``jax.devices()`` (all processes' chips), loads only its own rows of each
global batch, and assembles the global sharded array with
``jax.make_array_from_process_local_data``. The jitted step is unchanged —
it sees one global array; XLA routes the gradient all-reduce over
ICI within a host and DCN across hosts.

Single-process behavior is the identity: ``put_batch`` degrades to
``device_put`` and ``local_rows`` to the full range, so the single-host
path is byte-identical to round 1's (tested:
tests/test_parallel.py::test_multihost_assembly_matches_single_host).
"""

from __future__ import annotations

import os

import jax


def initialize_from_env() -> bool:
    """``jax.distributed.initialize`` from APV_* env vars; returns whether
    distributed mode was initialized.

    Env contract (one process per host, set by the launcher):
      APV_COORDINATOR   host:port of process 0 (required to opt in)
      APV_NUM_PROCESSES total process count
      APV_PROCESS_ID    this process's rank
    Must run before any JAX backend use (the CLI calls it first when
    ``apv train --distributed``).
    """
    coord = os.environ.get("APV_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["APV_NUM_PROCESSES"]),
        process_id=int(os.environ["APV_PROCESS_ID"]),
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_shard() -> tuple[int, int] | None:
    """``Batcher(host_shard=...)`` spec for this process — (index, count)
    under jax.distributed, None single-process. The single owner of the
    host-sharding contract shared by the train and eval batch loops."""
    if jax.process_count() == 1:
        return None
    return (jax.process_index(), jax.process_count())


def round_global_batch(bs: int, pcount: int | None = None,
                       n_shards: int = 1) -> int:
    """Largest multiple of lcm(``pcount``, ``n_shards``) ≤ ``bs`` (floored
    at one such multiple): the Batcher requires the global batch to split
    evenly across hosts AND the batch-axis device_put requires divisibility
    by the mesh's data-axis size. The single owner of this rounding rule —
    the train loop's valid batches and the eval batch loops both call it.
    ``pcount`` defaults to ``jax.process_count()``; callers that already
    carry a host-shard spec pass its count (keeps simulated-multi-host
    tests in control of the value); callers that shard over a mesh pass
    its data-axis size as ``n_shards``."""
    import math
    pcount = jax.process_count() if pcount is None else pcount
    div = math.lcm(pcount, n_shards)
    if div == 1:
        return bs
    return max(div, (bs // div) * div)


def agree_max(value: int | None) -> int | None:
    """Collective max of a per-process optional int (None = absent);
    single-process identity.

    For decisions derived from LOCAL filesystem state (the stale-checkpoint
    refusal): checkpoint saves are primary-only, so on storage that is not
    perfectly shared (host-local disk, lagging NFS) only process 0 may see
    the stale step — a local-only decision would raise on one host and
    leave the others blocking in the first collective. Agreeing on the max
    first makes refusal/overwrite a collective decision."""
    if jax.process_count() == 1:
        return value
    import numpy as np
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.int64(-1 if value is None else value))
    m = int(np.max(gathered))
    return None if m < 0 else m


def local_rows(n_global: int, pid: int | None = None,
               pcount: int | None = None) -> tuple[int, int]:
    """[start, stop) of this host's contiguous row range of a global batch.

    Global batch size must divide evenly (static shapes — the same
    drop-remainder discipline the Batcher applies globally).
    """
    pid = process_index() if pid is None else pid
    pcount = process_count() if pcount is None else pcount
    if n_global % pcount != 0:
        raise ValueError(f"global batch {n_global} not divisible by "
                         f"{pcount} processes")
    per = n_global // pcount
    return pid * per, (pid + 1) * per


def put_batch(batch: dict, sharding: jax.sharding.Sharding) -> dict:
    """Host-local numpy rows -> global sharded jax.Arrays.

    Single process: plain ``device_put`` (the array IS global). Multi
    process: each host contributes its local rows;
    ``make_array_from_process_local_data`` assembles the global array
    without gathering (each device keeps only its shard).
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()}
