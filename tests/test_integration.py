"""End-to-end integration (SURVEY.md §4): train a micro config-1 run via the
public API, then evaluate / sample / OOD off its checkpoints."""

import numpy as np

import apv_tpu
from conftest import tiny_config


def test_full_pipeline_config1(tmp_path):
    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 80, "train.lr": 3e-3, "train.checkpoint_every": 80,
        "train.eval_every": 40, "train.valid_fraction": 0.25,
        "data.synthetic_size": 512})

    state = apv_tpu.train(cfg)
    assert int(state.step) == 80

    # NLL below a loose bound: untrained is ~543 nats (log 2 * 784); a
    # trained micro-model must beat it clearly on this easy synthetic set.
    res = apv_tpu.evaluate(cfg, k=8)
    assert res["nll_nats"] < 543.0, res
    assert 0 < res["bits_per_dim"] < 1.0
    assert 0 <= res["active_units"] <= cfg.model.z_dim

    imgs = apv_tpu.sample(cfg, n=8, quality_n=32)
    assert imgs.shape == (8, 28, 28, 1)
    assert (tmp_path / cfg.name / "samples.png").exists()
    assert (tmp_path / cfg.name / "sample_quality.json").exists()

    apv_tpu.visualize(cfg, what="reconstruct", n=4)
    apv_tpu.visualize(cfg, what="interpolate", n=2, steps=4)
    assert (tmp_path / cfg.name / "reconstructions.png").exists()
    assert (tmp_path / cfg.name / "interpolation.png").exists()

    ood_cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "data.synthetic_size": 512,
        "ood.in_dataset": "mnist", "ood.ood_dataset": "fashion_mnist",
        "ood.score": "elbo", "ood.max_examples": 32})
    res = apv_tpu.ood_score(ood_cfg)
    assert 0.0 <= res["auroc_in_vs_ood"] <= 1.0

    art = apv_tpu.export_artifact(cfg, what="sampler")
    assert art.exists() and art.stat().st_size > 1000


def test_full_pipeline_config2_adversarial(tmp_path):
    cfg = tiny_config("mnist_advprior", tmp_dir=str(tmp_path), **{
        "train.steps": 40, "train.checkpoint_every": 40,
        "train.eval_every": 0, "data.synthetic_size": 256})
    state = apv_tpu.train(cfg)
    assert int(state.step) == 40
    res = apv_tpu.evaluate(cfg, k=4)
    assert np.isfinite(res["nll_nats"])
    assert res["adversarial_prior"] is True


def test_result_writes_are_process0_only(tmp_path, monkeypatch):
    """Under jax.distributed every process runs the eval compute, but only
    process 0 may persist eval.json/ood.json — concurrent writers to one
    shared results file would interleave (same rule as orbax saves)."""
    import jax

    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 2, "train.checkpoint_every": 2,
        "train.eval_every": 0, "data.synthetic_size": 64})
    apv_tpu.train(cfg)

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    res = apv_tpu.evaluate(cfg, k=2, activity=False)
    assert np.isfinite(res["nll_nats"])       # compute still runs
    assert not (tmp_path / cfg.name / "eval.json").exists()

    monkeypatch.undo()
    apv_tpu.evaluate(cfg, k=2, activity=False)
    assert (tmp_path / cfg.name / "eval.json").exists()


def test_eval_adopts_checkpoint_architecture(tmp_path):
    """A preset whose architecture default drifted (e.g. norm group->rms
    between rounds) must still restore an older checkpoint: eval-side entry
    points snap model/adversarial sections to the checkpoint's own saved
    config.json (round-2 advisor, api._adopt_checkpoint_arch)."""
    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 2, "train.checkpoint_every": 2,
        "train.eval_every": 0, "data.synthetic_size": 64})
    apv_tpu.train(cfg)

    # same preset, but the caller's config drifted to a different z_dim —
    # without adoption the restore template mismatches the checkpoint
    drifted = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "model.z_dim": 12, "train.steps": 2, "train.eval_every": 0,
        "data.synthetic_size": 64})
    res = apv_tpu.evaluate(drifted, k=2, activity=False)
    assert np.isfinite(res["nll_nats"])
    assert "active_units" not in res          # activity=False skips the pass

    res2 = apv_tpu.evaluate(drifted, k=2)
    assert res2["active_units"] <= 8          # the CHECKPOINT's z_dim (8)
