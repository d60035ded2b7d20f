"""Unit tests for the infrastructure utilities (logging, checkpoint,
compcache) — SURVEY.md §5 observability/checkpoint rows."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apv_tpu.utils import checkpoint as ckpt
from apv_tpu.utils.logging import MetricLogger


def test_metric_logger_interval_and_throughput(tmp_path):
    lg = MetricLogger(tmp_path, log_every=2, batch_size=64)
    lg.log(0, {"loss": 1.0})
    lg.log(1, {"loss": 0.9})          # skipped (1 % 2 != 0)
    time.sleep(0.01)
    lg.log(2, {"loss": jnp.float32(0.8)})
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [l["step"] for l in lines] == [0, 2]
    assert "images_per_sec_per_chip" in lines[1]
    assert lines[1]["images_per_sec_per_chip"] > 0
    assert isinstance(lines[1]["loss"], float)


def test_maybe_trace_window_and_strides(tmp_path, monkeypatch):
    """The profiler window must open/close once for stride 1 and for call
    strides that straddle trace_steps (train.steps_per_call)."""
    import apv_tpu.utils.logging as logging_mod
    for stride, steps in ((1, range(0, 20)), (8, range(0, 24, 8))):
        events = []
        monkeypatch.setattr(logging_mod.jax.profiler, "start_trace",
                            lambda d, _e=events: _e.append("start"))
        monkeypatch.setattr(logging_mod.jax.profiler, "stop_trace",
                            lambda _e=events: _e.append("stop"))
        lg = MetricLogger(tmp_path, trace_dir=str(tmp_path),
                          trace_steps=(10, 15))
        for s in steps:
            lg.maybe_trace(s, stride=stride)
        assert events == ["start", "stop"], (stride, events)


def test_metric_logger_log_now_unconditional(tmp_path):
    lg = MetricLogger(tmp_path, log_every=1000)
    lg.log_now(7, {"valid_elbo": -1.5})
    line = json.loads((tmp_path / "metrics.jsonl").read_text())
    assert line == {"step": 7, "valid_elbo": -1.5}


def test_metric_logger_write_json(tmp_path):
    lg = MetricLogger(tmp_path)
    lg.write_json("eval.json", {"a": 1})
    assert json.loads((tmp_path / "eval.json").read_text()) == {"a": 1}


def test_checkpoint_roundtrip_pytree(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(5, jnp.int32),
             "key": jax.random.PRNGKey(3)}
    ckpt.save_checkpoint(tmp_path / "c", state, 5)
    assert ckpt.latest_step(tmp_path / "c") == 5
    restored = ckpt.restore_checkpoint(tmp_path / "c", state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 5
    np.testing.assert_array_equal(np.asarray(restored["key"]),
                                  np.asarray(state["key"]))


def test_checkpoint_keeps_limited_history(tmp_path):
    state = {"x": jnp.zeros(2)}
    for s in (1, 2, 3, 4, 5):
        ckpt.save_checkpoint(tmp_path / "c", state, s)
    assert ckpt.latest_step(tmp_path / "c") == 5
    # max_to_keep=3: old steps pruned
    kept = sorted(int(p.name) for p in (tmp_path / "c").iterdir()
                  if p.name.isdigit())
    assert kept == [3, 4, 5]


def test_checkpoint_missing_raises(tmp_path):
    assert ckpt.latest_step(tmp_path / "none") is None
    with pytest.raises(FileNotFoundError):
        ckpt.restore_checkpoint(tmp_path / "none2", {"x": jnp.zeros(1)})


def test_compcache_no_op_off_tpu(monkeypatch, tmp_path):
    """On CPU the default cache must stay disabled (machine-feature lock)."""
    from apv_tpu.utils.compcache import enable_default_cache
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    before = jax.config.jax_compilation_cache_dir
    enable_default_cache()
    assert jax.config.jax_compilation_cache_dir == before


def test_config_from_dict_roundtrip():
    import dataclasses
    import json

    from apv_tpu.utils.config import config_from_dict, get_preset

    cfg = get_preset("cifar_advprior_resnet")
    d = json.loads(cfg.to_json())
    cfg2 = config_from_dict(d)
    assert cfg2 == cfg
    # unknown keys (configs written by future versions) are ignored
    d["ood"]["not_a_field"] = 1
    d["also_not_a_field"] = "x"
    assert config_from_dict(d) == cfg
    # tuples survive the JSON list round-trip
    assert isinstance(cfg2.model.widths, tuple)
    assert cfg2.model.image_shape == (32, 32, 3)


def test_trace_window_offsets_on_resume(tmp_path, monkeypatch):
    """--trace-dir on a RESUMED run must trace relative to the run's own
    first step: absolute trace_steps (10, 15) are unreachable from a
    checkpoint at step 1000 and silently produced no trace."""
    from apv_tpu.utils.logging import MetricLogger

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop",)))

    lg = MetricLogger(tmp_path, trace_dir=str(tmp_path), trace_offset=1000)
    for base in range(1000, 1040, 8):
        lg.maybe_trace(base, stride=8)
    assert ("start", str(tmp_path)) in calls and ("stop",) in calls

    # and a run ending INSIDE the window flushes via close()
    calls.clear()
    lg2 = MetricLogger(tmp_path, trace_dir=str(tmp_path))
    lg2.maybe_trace(8, stride=8)          # covers step 10 -> starts
    assert calls == [("start", str(tmp_path))]
    lg2.close()                           # run ends before step 15
    assert calls[-1] == ("stop",)


def test_metric_logger_nonprimary_writes_nothing(tmp_path, monkeypatch):
    """Under jax.distributed only process 0 may append to metrics.jsonl —
    P interleaved copies of every record corrupt the step series."""
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    from apv_tpu.utils.logging import MetricLogger

    lg = MetricLogger(tmp_path / "np", log_every=1)
    lg.log(0, {"loss": 1.0})
    lg.log_now(0, {"valid": 2.0})
    lg.write_json("x.json", {"a": 1})
    assert not (tmp_path / "np" / "metrics.jsonl").exists()
    assert not (tmp_path / "np" / "x.json").exists()


def test_cli_presets_lists_all(capsys):
    """`apv presets` lists every registered preset with its docstring
    headline, without touching any JAX backend (one-TPU-process rule)."""
    from apv_tpu.cli import main
    from apv_tpu.utils.config import PRESETS

    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in PRESETS:
        assert name in out
    assert "Config 1" in out and "Config 5" in out


def test_cli_info_lists_and_summarizes(tmp_path, capsys):
    """`apv info` is filesystem-only introspection: a listing row per run
    and a full summary with checkpoint steps, best record, and result
    files — assembled without touching any device (one-TPU-process
    rule)."""
    import apv_tpu
    from apv_tpu.cli import main

    run = tmp_path / "demo"
    (run / "checkpoints" / "100").mkdir(parents=True)
    (run / "checkpoints" / "300").mkdir()
    (run / "checkpoints" / "junk.tmp").write_text("")   # non-step entry
    (run / "config.json").write_text(json.dumps({
        "model": {"family": "conv", "z_dim": 4, "likelihood": "bernoulli"},
        "adversarial": {"enabled": True, "variant": "learned_prior"},
        "data": {"dataset": "mnist"}, "train": {"steps": 300}}))
    (run / "best.json").write_text(json.dumps({"step": 100,
                                               "valid_elbo": -1.0}))
    (run / "eval.json").write_text(json.dumps({"bits_per_dim": 0.5}))
    with (run / "metrics.jsonl").open("w") as fh:
        fh.write(json.dumps({"step": 100, "loss": 2.0}) + "\n")
        fh.write(json.dumps({"step": 300, "loss": 1.0}) + "\n")

    listing = apv_tpu.info(results_dir=str(tmp_path))
    assert [r["name"] for r in listing["runs"]] == ["demo"]
    assert listing["runs"][0]["latest_checkpoint"] == 300

    one = apv_tpu.info("demo", results_dir=str(tmp_path))
    assert one["checkpoint_steps"] == [100, 300]
    assert one["best"]["step"] == 100
    assert one["eval"]["bits_per_dim"] == 0.5
    assert one["last_metrics"]["step"] == 300
    assert one["adversarial"] == "learned_prior"

    assert main(["info", "demo", "--results-dir", str(tmp_path)]) == 0
    assert "checkpoint_steps" in capsys.readouterr().out

    with pytest.raises(FileNotFoundError):
        apv_tpu.info("nope", results_dir=str(tmp_path))
