"""Train-loop integration: checkpointing, resume, periodic validation
(SURVEY.md §4 "Integration", §5 "Checkpoint / resume")."""

import json

import numpy as np

from conftest import tiny_config
from apv_tpu.training import train_loop
from apv_tpu.utils import checkpoint as ckpt


def _cfg(tmp_path, **kw):
    return tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 9, "train.checkpoint_every": 3,
        "train.eval_every": 4, "train.valid_fraction": 0.25,
        "train.log_every": 2, **kw})


def test_loop_checkpoints_and_validation(tmp_path):
    cfg = _cfg(tmp_path)
    state = train_loop(cfg)
    assert int(state.step) == 9

    results = tmp_path / cfg.name
    steps = ckpt.latest_step(results / "checkpoints")
    assert steps == 9
    lines = [json.loads(l) for l in
             (results / "metrics.jsonl").read_text().splitlines()]
    valid = [l for l in lines if "valid_elbo" in l]
    assert len(valid) == 2            # steps 4 and 8
    assert np.isfinite(valid[-1]["valid_elbo"])
    # best-validation checkpoint exists
    assert (results / "best").exists()
    best = json.loads((results / "best.json").read_text())
    assert best["step"] in (4, 8)


def test_loop_resume(tmp_path):
    cfg = _cfg(tmp_path)
    train_loop(cfg, max_steps=3)
    assert ckpt.latest_step(tmp_path / cfg.name / "checkpoints") == 3
    state = train_loop(cfg, resume=True)
    assert int(state.step) == 9
    # resume didn't restart from zero: checkpoints at 3,6,9
    assert ckpt.latest_step(tmp_path / cfg.name / "checkpoints") == 9


def test_resume_adopts_checkpoint_arch(tmp_path):
    """api.train --resume rebuilds the CHECKPOINT's architecture: a preset
    default that moved between runs (e.g. activation gelu→silu) must not
    silently push the restored weights through different activations."""
    import dataclasses
    import json

    import apv_tpu as api

    cfg = _cfg(tmp_path, **{"model.activation": "relu", "train.steps": 4,
                            "train.checkpoint_every": 2,
                            "train.eval_every": 0})
    api.train(cfg, max_steps=2)
    moved = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, activation="gelu"))
    state = api.train(moved, resume=True)
    assert int(state.step) == 4
    saved = json.loads((tmp_path / cfg.name / "config.json").read_text())
    assert saved["model"]["activation"] == "relu"


def test_resume_restores_exact_state(tmp_path):
    """Continuous 6 steps == 3 steps + checkpoint + resume 3 steps."""
    cfg = _cfg(tmp_path, **{"train.steps": 6, "train.checkpoint_every": 3,
                            "train.eval_every": 0})
    state_a = train_loop(cfg)

    cfg2 = _cfg(tmp_path / "b", **{"train.steps": 6,
                                   "train.checkpoint_every": 3,
                                   "train.eval_every": 0})
    train_loop(cfg2, max_steps=3)
    state_b = train_loop(cfg2, resume=True)

    import jax
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
