"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

One ``TrainState`` pytree holds params, both optimizer states, the PRNG key
and the step (SURVEY.md §2.4), so save/restore is a single Standard
checkpoint; eval / sample / ood consume the same format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str | Path, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str | Path, state: Any, step: int) -> None:
    with _manager(ckpt_dir) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def latest_step(ckpt_dir: str | Path) -> int | None:
    if not Path(ckpt_dir).exists():
        return None
    with _manager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_checkpoint(ckpt_dir: str | Path, template: Any,
                       step: int | None = None) -> Any:
    """Restore into the structure of ``template`` (concrete or ShapeDtype)."""
    abstract = jax.tree.map(
        lambda x: (jax.ShapeDtypeStruct(x.shape, x.dtype)
                   if hasattr(x, "shape") else x), template)
    with _manager(ckpt_dir) as mngr:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        try:
            return mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        except ValueError as e:
            if "ema_params" not in str(e) or not hasattr(abstract, "replace"):
                raise
            # EMA on/off mismatch between checkpoint and config
            # (train.ema_decay changed between train and eval/resume):
            # adapt the TrainState template instead of crashing.
            if getattr(abstract, "ema_params", None):
                # checkpoint has no EMA shadow -> restore bare, seed the
                # shadow from the restored params (EMA warm-starts there)
                bare = abstract.replace(ema_params={})
                out = mngr.restore(step, args=ocp.args.StandardRestore(bare))
                # jnp.copy, NOT identity: aliased leaves would be donated
                # twice by jit(train_step, donate_argnums=0) on --resume
                # (init_fn copies for the same reason)
                import jax.numpy as jnp
                return out.replace(ema_params=jax.tree.map(jnp.copy,
                                                           out.params))
            # checkpoint HAS an EMA shadow the config ignores -> restore it
            # anyway (training/state.eval_params picks raw params when off)
            withema = abstract.replace(ema_params=abstract.params)
            return mngr.restore(step,
                                args=ocp.args.StandardRestore(withema))
