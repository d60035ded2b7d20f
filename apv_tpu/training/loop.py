"""The outer training loop (SURVEY.md §3.1/§3.2 host side).

Unlike the reference's per-step feed_dict host sync, the host here only cuts
numpy batches and keeps a prefetch queue ahead of the device; everything
else — input stage, both adversarial phases, optimizer updates, the ICI
grad all-reduce — lives in the single jitted step. Metrics sync to host only
every ``log_every`` steps.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import numpy as np

from apv_tpu.data import (Batcher, load_dataset, prefetch_to_device,
                          stack_batches, static_binarize)
from apv_tpu.data.preprocess import pack_bits
from apv_tpu.parallel import (data_sharding, make_mesh, replicated,
                              stacked_data_sharding)
from apv_tpu.parallel.mesh import DATA_AXIS
from apv_tpu.parallel import multihost
from apv_tpu.training.state import TrainState
from apv_tpu.training.step import make_train_fns
from apv_tpu.utils import checkpoint as ckpt
from apv_tpu.utils.config import Config
from apv_tpu.utils.logging import MetricLogger


def load_train_arrays(cfg: Config) -> tuple[dict[str, np.ndarray],
                                            dict[str, np.ndarray] | None]:
    """(train_arrays, valid_arrays): the valid split is carved from the
    tail of the (pre-shuffled-by-construction) train set."""
    images, _ = load_dataset(cfg.data.dataset, "train",
                             data_dir=cfg.data.data_dir,
                             synthetic_size=cfg.data.synthetic_size)
    key = "image"
    if cfg.data.binarize:
        images = static_binarize(images, seed=cfg.train.seed)
        if cfg.data.bit_pack:
            # 8 px/byte host→HBM payload; the jitted step unpacks on device
            # (prepare_batch) — lossless, and the transfer axis is the
            # measured MNIST bottleneck (RESULTS.md dispatch table).
            images = pack_bits(images)
            key = "image_packed"
    # dequantization happens inside the jitted step (fresh noise per epoch)
    n_valid = int(len(images) * cfg.train.valid_fraction)
    if cfg.train.eval_every <= 0 or n_valid < 1:
        return {key: images}, None
    return ({key: images[:-n_valid]}, {key: images[-n_valid:]})


def make_resident_step(base_fn):
    """Wrap a (state, batch)->(state, metrics) step to take index batches
    plus an HBM-resident dataset dict (data.device_resident): rows are
    gathered ON DEVICE — replicated dataset operand, data-sharded indices,
    so GSPMD emits a local gather per chip, no collectives. Indices come
    from a permutation of arange(n), hence promise_in_bounds (no clamp)."""
    def _resident_step(state, idx_batch, dataset):
        rows = {kk: v.at[idx_batch["_index"]].get(mode="promise_in_bounds")
                for kk, v in dataset.items()}
        return base_fn(state, rows)
    return _resident_step


def train_loop(cfg: Config, *, mesh=None, max_steps: int | None = None,
               arrays: dict[str, np.ndarray] | None = None,
               resume: bool = False, trace_dir: str | None = None,
               overwrite: bool = False) -> TrainState:
    """Run (or resume) training; returns the final state.

    ``max_steps`` caps this invocation (tests/smoke); the schedule still uses
    ``cfg.train.steps``. ``arrays`` overrides data loading (tests).
    ``overwrite`` lets a fresh run clear an existing checkpoint dir.
    """
    mesh = mesh if mesh is not None else make_mesh()
    fns = make_train_fns(cfg)
    results_dir = Path(cfg.results_dir) / cfg.name
    ckpt_dir = results_dir / "checkpoints"
    # Multi-host: every process runs the same compute; only process 0
    # persists (two orbax saves to one shared dir would race).
    primary = jax.process_index() == 0
    # agree_max: saves are primary-only, so on non-shared/laggy results
    # storage only process 0 may SEE the stale step — the refusal below
    # must be a collective decision or the other hosts block in the first
    # collective while process 0 raises.
    stale_step = (None if resume
                  else multihost.agree_max(ckpt.latest_step(ckpt_dir)))
    if stale_step is not None:
        # Orbax skips save() for steps already on disk, so a fresh run into
        # a reused results dir would train new weights but silently KEEP the
        # old checkpoints at overlapping steps (and eval/ood would score the
        # stale model). A non-resume run owns its results dir — but deleting
        # hours of trained checkpoints because someone forgot --resume on a
        # smoke rerun is worse, so clearing needs an explicit opt-in.
        # The refusal is raised on EVERY process (stale_step is agreed
        # collectively above); only the destructive clear is primary-only.
        if not overwrite:
            raise FileExistsError(
                f"{ckpt_dir} already holds a checkpoint (step "
                f"{stale_step}). A fresh run would clear it "
                "and retrain from scratch. Pass --resume to continue that "
                "run, --overwrite to destroy it, or a different name "
                "(--set name=...) to keep both.")
        if primary:
            # Clear the WHOLE results dir, not just checkpoints/ + best/:
            # metrics.jsonl is opened in append mode (two runs would
            # interleave) and best/eval/ood JSONs describe the destroyed
            # model. The loop rewrites config.json below.
            import shutil
            shutil.rmtree(results_dir)
            print(f"cleared stale results under {results_dir} "
                  "(fresh run into an existing results dir; use --resume "
                  "to continue instead)", flush=True)

    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(cfg.train.seed))
    start = 0
    if resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            state = ckpt.restore_checkpoint(ckpt_dir, state)
            state = jax.device_put(state, replicated(mesh))
            start = int(state.step)

    k = cfg.train.steps_per_call
    if k > 1:
        for nm, v in (("steps", cfg.train.steps),
                      ("eval_every", cfg.train.eval_every),
                      ("checkpoint_every", cfg.train.checkpoint_every)):
            if v > 0 and v % k:
                raise ValueError(
                    f"train.{nm}={v} must be a multiple of "
                    f"train.steps_per_call={k}")
    eval_fn = jax.jit(fns.eval_step)

    if arrays is not None:
        train_arrays, valid_arrays = arrays, None
    else:
        train_arrays, valid_arrays = load_train_arrays(cfg)
    host_shard = multihost.host_shard()

    resident = cfg.data.device_resident
    if resident:
        # HBM-resident dataset: upload the full (binarized/packed) train
        # arrays once, replicated per chip; the Batcher then runs over a
        # row-index array — identical seed ⇒ identical permutations ⇒ the
        # yielded index batches select exactly the rows the streaming path
        # would have shipped, so order/resume semantics are unchanged and
        # the per-step host→HBM payload drops to 4 bytes/image.
        # Multi-host: every process loads the same full arrays (loaders
        # are deterministic; host filtering happens at batch cutting), so
        # put_batch's make_array_from_process_local_data assembles the
        # fully-replicated global array from identical local copies.
        n_rows = len(next(iter(train_arrays.values())))
        dataset_dev = multihost.put_batch(train_arrays, replicated(mesh))
        base_fn = fns.multi_step if k > 1 else fns.train_step
        jit_fn = jax.jit(make_resident_step(base_fn), donate_argnums=0)
        step_fn = lambda state, batch: jit_fn(state, batch, dataset_dev)  # noqa: E731
        batcher = Batcher({"_index": np.arange(n_rows, dtype=np.int32)},
                          cfg.train.batch_size, seed=cfg.train.seed,
                          host_shard=host_shard)
    else:
        step_fn = jax.jit(fns.multi_step if k > 1 else fns.train_step,
                          donate_argnums=0)
        batcher = Batcher(train_arrays, cfg.train.batch_size,
                          seed=cfg.train.seed, host_shard=host_shard)

    if k > 1:
        batches = prefetch_to_device(
            stack_batches(batcher.iter_from(start), k),
            stacked_data_sharding(mesh))
    else:
        batches = prefetch_to_device(batcher.iter_from(start),
                                     data_sharding(mesh))

    valid_batches = None
    if valid_arrays is not None:
        n_valid_rows = len(next(iter(valid_arrays.values())))
        # rounded with the SAME host_shard the Batcher below receives
        vbs = multihost.round_global_batch(
            min(cfg.train.batch_size, n_valid_rows),
            pcount=None if host_shard is None else host_shard[1],
            n_shards=mesh.shape[DATA_AXIS])
        vb = Batcher(valid_arrays, vbs, shuffle=False, host_shard=host_shard)
        shard = data_sharding(mesh)
        valid_batches = [multihost.put_batch(b, shard) for b in vb.epoch()]
        if not valid_batches:
            # drop-remainder Batcher with vbs > len(valid): validation (and
            # best-checkpoint tracking) would silently never run
            print(f"warning: validation disabled — valid split "
                  f"({n_valid_rows} rows) smaller than the "
                  f"validation batch ({vbs}); shrink train.batch_size or "
                  f"raise train.valid_fraction", flush=True)
            valid_batches = None

    logger = MetricLogger(results_dir, log_every=cfg.train.log_every,
                          batch_size=cfg.train.batch_size,
                          trace_dir=trace_dir, trace_offset=start)
    if primary:
        logger.write_json("config.json", dataclasses.asdict(cfg))

    def run_validation(state, step):
        sums: dict[str, float] = {}
        for b in valid_batches:
            m = eval_fn(state, b)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / len(valid_batches) for k, v in sums.items()}

    best_valid_elbo = -float("inf")
    stop = cfg.train.steps if max_steps is None else min(
        start + max_steps, cfg.train.steps)
    if k > 1 and (stop - start) % k:
        raise ValueError(f"cannot run {stop - start} steps in calls of "
                         f"steps_per_call={k}")
    step = start
    try:
        with mesh:
            for base in range(start, stop, k):
                logger.maybe_trace(base, stride=k)
                state, metrics = step_fn(state, next(batches))
                if k == 1:
                    logger.log(base, metrics)
                else:
                    # metrics carry a leading scan axis; slice lazily only
                    # at log steps so off-step calls stay host-sync-free.
                    for i in range(k):
                        if (base + i) % cfg.train.log_every == 0:
                            logger.log(base + i,
                                       {kk: v[i] for kk, v in metrics.items()})
                step = base + k - 1
                if valid_batches and cfg.train.eval_every > 0 \
                        and (step + 1) % cfg.train.eval_every == 0:
                    vm = run_validation(state, step)
                    logger.log_now(step + 1, vm)
                    # best-validation checkpoint (reference TrainLoop
                    # parity: periodic valid eval + best-model saving,
                    # SURVEY.md §5)
                    if vm["valid_elbo"] > best_valid_elbo:
                        best_valid_elbo = vm["valid_elbo"]
                        if primary:
                            ckpt.save_checkpoint(results_dir / "best",
                                                 jax.device_get(state),
                                                 step + 1)
                            logger.write_json("best.json",
                                              {"step": step + 1, **vm})
                if primary and ((step + 1) % cfg.train.checkpoint_every == 0
                                or step + 1 == stop):
                    ckpt.save_checkpoint(ckpt_dir, jax.device_get(state),
                                         step + 1)
    except KeyboardInterrupt:
        # Graceful stop: persist progress so --resume continues here.
        # Note: on the axon relay a SIGINT landing mid-device-step can
        # surface as a JaxRuntimeError instead (backend torn down) — that
        # path intentionally does NOT save, since the state may be
        # unreadable; the periodic checkpoint covers it.
        if primary:
            ckpt.save_checkpoint(ckpt_dir, jax.device_get(state), step + 1)
        print(f"interrupted at step {step + 1}; checkpoint saved — resume "
              f"with --resume", flush=True)
        raise
    finally:
        # A run ending inside the trace window (short smoke, max_steps,
        # Ctrl-C) must still flush the profile: data is only written on
        # stop_trace.
        logger.close()
    return state
