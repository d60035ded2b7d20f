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


def test_nondefault_priors_write_suffixed_artifacts(tmp_path):
    """--prior != default must never overwrite the default-prior artifact
    names (round-4 evidence-retention lesson: an expost rerun clobbered
    the gb shaped-prior headline's sample_quality.json pre-commit).
    evaluate → eval_<prior>.json, sample → samples_<prior>.png +
    sample_quality_<prior>.json, and `apv info` surfaces the suffixed
    files."""
    import json

    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 20, "train.checkpoint_every": 20,
        "train.eval_every": 0, "data.synthetic_size": 128})
    apv_tpu.train(cfg)
    run = tmp_path / cfg.name

    apv_tpu.evaluate(cfg, k=4, activity=False)
    apv_tpu.evaluate(cfg, k=4, activity=False, prior="expost")
    assert (run / "eval.json").exists()
    assert (run / "eval_expost.json").exists()
    assert json.loads((run / "eval.json").read_text())["prior"] == "model"
    assert (json.loads((run / "eval_expost.json").read_text())["prior"]
            == "expost")

    apv_tpu.sample(cfg, n=4, quality_n=16)
    default_q = (run / "sample_quality.json").read_text()
    apv_tpu.sample(cfg, n=4, quality_n=16, prior="expost")
    assert (run / "samples.png").exists()
    assert (run / "samples_expost.png").exists()
    assert (run / "sample_quality_expost.json").exists()
    # the default-prior artifact is untouched by the expost rerun
    assert (run / "sample_quality.json").read_text() == default_q

    info = apv_tpu.info(cfg.name, results_dir=str(tmp_path))
    assert info["sample_quality"]["prior"] == "auto"
    assert info["sample_quality_expost"]["prior"] == "expost"
    assert info["eval_expost"]["prior"] == "expost"


def test_temperature_samples_write_suffixed_artifacts(tmp_path):
    """--temperature != 1 suffixes sample artifacts too (_T{T}): a
    temperature A/B must not clobber the T=1 headline files (round-5
    session lesson, same hazard as the prior suffix)."""
    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "model.prior": "flow", "model.prior_flow_layers": 2,
        "model.prior_flow_hidden": 8,
        "train.steps": 20, "train.checkpoint_every": 20,
        "train.eval_every": 0, "data.synthetic_size": 128})
    apv_tpu.train(cfg)
    run = tmp_path / cfg.name
    apv_tpu.sample(cfg, n=4, quality_n=16)
    default_q = (run / "sample_quality.json").read_text()
    apv_tpu.sample(cfg, n=4, quality_n=16, temperature=0.8)
    assert (run / "samples_T0.8.png").exists()
    assert (run / "sample_quality_T0.8.json").exists()
    assert (run / "sample_quality.json").read_text() == default_q


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


def test_eval_adopts_checkpoint_data_protocol(tmp_path):
    """Eval-side entry points must adopt the checkpoint's DATA section too:
    scoring a binarized-trained Bernoulli model through a config whose
    data.binarize drifted to False (the CIFAR-derived ood_suite preset)
    would silently feed continuous [0,1] levels — a train/eval protocol
    mismatch (round-3 review finding)."""
    from apv_tpu.api import _adopt_checkpoint_arch

    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 2, "train.checkpoint_every": 2,
        "train.eval_every": 0, "data.synthetic_size": 64})
    apv_tpu.train(cfg)

    drifted = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "data.binarize": False, "data.synthetic_size": 64})
    adopted = _adopt_checkpoint_arch(drifted, None)
    assert adopted.data.binarize is True        # checkpoint's protocol wins
    # explicit overrides still outrank the adoption
    forced = _adopt_checkpoint_arch(drifted, ["data.binarize=false"])
    assert forced.data.binarize is False

    # end-to-end: the drifted config scores identically to the original
    res_orig = apv_tpu.evaluate(cfg, k=2, activity=False)
    res_drift = apv_tpu.evaluate(drifted, k=2, activity=False)
    np.testing.assert_allclose(res_drift["nll_nats"], res_orig["nll_nats"],
                               rtol=1e-6)


def test_resume_without_checkpoint_keeps_requested_config(tmp_path):
    """A results dir holding config.json but NO checkpoint (run crashed
    before the first save) must not pin a resumed run to the dead run's
    architecture: config.json is written at loop start, so resume only
    adopts it when a checkpoint actually exists."""
    import dataclasses
    import json

    stale = tiny_config("mnist_vae", tmp_dir=str(tmp_path),
                        **{"model.z_dim": 12})
    run_dir = tmp_path / stale.name
    run_dir.mkdir(parents=True)
    (run_dir / "config.json").write_text(
        json.dumps(dataclasses.asdict(stale)))

    fresh = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 2, "train.checkpoint_every": 2,
        "train.eval_every": 0, "data.synthetic_size": 64})
    state = apv_tpu.train(fresh, resume=True)
    head = state.params["encoder"]["gaussian_head"]["kernel"]
    assert head.shape[-1] == 2 * fresh.model.z_dim   # 8, not the stale 12


def test_overwrite_clears_stale_run_artifacts(tmp_path):
    """overwrite=True must clear the WHOLE results dir: metrics.jsonl is
    append-mode (two runs would interleave) and best/eval/ood JSONs
    describe the destroyed model."""
    cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **{
        "train.steps": 2, "train.checkpoint_every": 2,
        "train.eval_every": 0, "data.synthetic_size": 64})
    apv_tpu.train(cfg)
    run_dir = tmp_path / cfg.name
    (run_dir / "eval.json").write_text("{\"stale\": true}")
    n_lines_one_run = len(
        (run_dir / "metrics.jsonl").read_text().splitlines())
    assert n_lines_one_run > 0

    apv_tpu.train(cfg, overwrite=True)
    assert not (run_dir / "eval.json").exists()
    assert len((run_dir / "metrics.jsonl").read_text().splitlines()) \
        == n_lines_one_run                       # not appended twice
