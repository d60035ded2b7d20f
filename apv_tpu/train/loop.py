"""The outer training loop (SURVEY.md §3.1/§3.2 host side).

Unlike the reference's per-step feed_dict host sync, the host here only cuts
numpy batches and keeps a prefetch queue ahead of the device; everything
else — input stage, both adversarial phases, optimizer updates, the ICI
grad all-reduce — lives in the single jitted step. Metrics sync to host only
every ``log_every`` steps.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from apv_tpu.data import Batcher, load_dataset, prefetch_to_device, static_binarize
from apv_tpu.parallel import data_sharding, make_mesh, replicated
from apv_tpu.train.state import TrainState
from apv_tpu.train.step import make_train_fns
from apv_tpu.utils import checkpoint as ckpt
from apv_tpu.utils.config import Config
from apv_tpu.utils.logging import MetricLogger


def load_train_arrays(cfg: Config) -> dict[str, np.ndarray]:
    images, _ = load_dataset(cfg.data.dataset, "train",
                             data_dir=cfg.data.data_dir,
                             synthetic_size=cfg.data.synthetic_size)
    if cfg.data.binarize:
        images = static_binarize(images, seed=cfg.train.seed)
    # dequantization happens inside the jitted step (fresh noise per epoch)
    return {"image": images}


def train_loop(cfg: Config, *, mesh=None, max_steps: int | None = None,
               arrays: dict[str, np.ndarray] | None = None,
               resume: bool = False, trace_dir: str | None = None) -> TrainState:
    """Run (or resume) training; returns the final state.

    ``max_steps`` caps this invocation (tests/smoke); the schedule still uses
    ``cfg.train.steps``. ``arrays`` overrides data loading (tests).
    """
    mesh = mesh if mesh is not None else make_mesh()
    fns = make_train_fns(cfg)
    results_dir = Path(cfg.results_dir) / cfg.name
    ckpt_dir = results_dir / "checkpoints"

    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(cfg.train.seed))
    start = 0
    if resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            state = ckpt.restore_checkpoint(ckpt_dir, state)
            state = jax.device_put(state, replicated(mesh))
            start = int(state.step)

    step_fn = jax.jit(fns.train_step, donate_argnums=0)

    arrays = arrays if arrays is not None else load_train_arrays(cfg)
    batcher = Batcher(arrays, cfg.train.batch_size, seed=cfg.train.seed)
    batches = prefetch_to_device(iter(batcher), data_sharding(mesh))

    logger = MetricLogger(results_dir, log_every=cfg.train.log_every,
                          batch_size=cfg.train.batch_size,
                          trace_dir=trace_dir)
    logger.write_json("config.json", cfg.to_json())

    stop = cfg.train.steps if max_steps is None else min(
        start + max_steps, cfg.train.steps)
    with mesh:
        for step in range(start, stop):
            logger.maybe_trace(step)
            state, metrics = step_fn(state, next(batches))
            logger.log(step, metrics)
            if (step + 1) % cfg.train.checkpoint_every == 0 or step + 1 == stop:
                ckpt.save_checkpoint(ckpt_dir, jax.device_get(state), step + 1)
    return state
