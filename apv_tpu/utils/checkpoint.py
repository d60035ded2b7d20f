"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

One ``TrainState`` pytree holds params, both optimizer states, the PRNG key
and the step (SURVEY.md §2.4), so save/restore is a single Standard
checkpoint; eval / sample / ood consume the same format.

Format compatibility: checkpoints written before ``TrainState.ema_params``
existed lack that key entirely on disk, and runs with ``ema_decay`` toggled
between train and eval disagree about whether the shadow is populated. The
branch is decided from the CHECKPOINT's own metadata (``item_metadata``),
not from the template — a template-guessed branch mis-restores whichever
side it didn't guess (round-2 advisor finding).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str | Path, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        # Registering the handler up front lets item_metadata() read the
        # saved tree structure BEFORE any restore args exist — that is how
        # restore_checkpoint decides EMA-format branches from the
        # checkpoint itself instead of guessing from the template.
        item_handlers=ocp.StandardCheckpointHandler(),
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


def _saved_keys_and_ema(mngr, step) -> tuple[set[str] | None, bool]:
    """(top-level keys, ema-shadow-nonempty) read from the checkpoint's own
    metadata; (None, False) when the metadata API yields nothing usable."""
    try:
        meta = mngr.item_metadata(step)
    except Exception:
        return None, False
    tree = getattr(meta, "tree", meta)
    if not isinstance(tree, dict):
        try:
            tree = dict(tree)
        except Exception:
            return None, False
    ema = tree.get("ema_params")
    return set(tree), bool(ema)


def _restore_pre_ema(mngr, step, abstract, want_ema: bool):
    """Pre-EMA (round-1) checkpoint: the key is absent on disk, so ANY
    TrainState template mismatches. Restore through a name-keyed dict
    template that omits the field (orbax matches leaves by key path, so
    field names line up), then seed or drop the shadow per the config."""
    names = [f.name for f in dataclasses.fields(abstract)
             if f.name != "ema_params"]
    tmpl = {n: getattr(abstract, n) for n in names}
    out = mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
    # jnp.copy, NOT identity: aliased leaves would be donated
    # twice by jit(train_step, donate_argnums=0) on --resume
    ema = jax.tree.map(jnp.copy, out["params"]) if want_ema else {}
    return type(abstract)(**out, ema_params=ema)


def _restore_ema_mismatch(mngr, step, abstract, want_ema: bool):
    """Checkpoint and config disagree about whether the EMA shadow is
    populated: adapt the template to the checkpoint's side."""
    if want_ema:
        # checkpoint saved with ema off (explicit {} node):
        # restore bare, warm-start the shadow from params
        bare = abstract.replace(ema_params={})
        out = mngr.restore(step, args=ocp.args.StandardRestore(bare))
        return out.replace(ema_params=jax.tree.map(jnp.copy, out.params))
    # checkpoint HAS a shadow the config ignores: restore it
    # anyway (training/state.eval_params picks raw params)
    withema = abstract.replace(ema_params=abstract.params)
    return mngr.restore(step, args=ocp.args.StandardRestore(withema))


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
        is_state = (hasattr(abstract, "replace")
                    and hasattr(abstract, "ema_params"))
        if is_state:
            keys, saved_ema = _saved_keys_and_ema(mngr, step)
            want_ema = bool(abstract.ema_params)
            if keys is None:
                # Metadata unreadable (orbax metadata API moved under us):
                # trial restores in place of the metadata decision — exact
                # template first, then each format adaptation the metadata
                # path would have picked. The EMA-mismatch branches fail
                # fast on a tree mismatch, so wrong attempts are cheap.
                first_err = None
                for attempt in (
                        lambda: mngr.restore(
                            step, args=ocp.args.StandardRestore(abstract)),
                        lambda: _restore_ema_mismatch(mngr, step, abstract,
                                                      want_ema),
                        lambda: _restore_pre_ema(mngr, step, abstract,
                                                 want_ema)):
                    try:
                        return attempt()
                    except Exception as e:  # orbax error types are
                        first_err = first_err or e  # version-fragile
                raise first_err
            if "ema_params" not in keys:
                return _restore_pre_ema(mngr, step, abstract, want_ema)
            if saved_ema != want_ema:
                return _restore_ema_mismatch(mngr, step, abstract, want_ema)
        return mngr.restore(step, args=ocp.args.StandardRestore(abstract))
