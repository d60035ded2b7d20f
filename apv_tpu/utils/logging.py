"""Metrics logging + observability (SURVEY.md §5 "Metrics / logging").

Structured stdout + ``metrics.jsonl`` in the results dir; tracks step time
and images/sec/chip (a north-star metric). ``jax.profiler`` tracing hooks
sit behind ``trace_dir`` (SURVEY.md §5 "Tracing / profiling").
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax


class MetricLogger:
    def __init__(self, results_dir: str | Path, *, log_every: int = 100,
                 batch_size: int = 0, trace_dir: str | None = None,
                 trace_steps: tuple[int, int] = (10, 15),
                 trace_offset: int = 0):
        self.dir = Path(results_dir)
        # Multi-host: every process logs compute-replicated metrics, so
        # only process 0 writes the jsonl / prints — P interleaved copies
        # of every record would corrupt the step series (same contract as
        # api._write_json and the loop's checkpoint saves).
        self.primary = jax.process_index() == 0
        if self.primary:
            self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.jsonl"
        self.log_every = log_every
        self.batch_size = batch_size
        self.n_chips = max(jax.device_count(), 1)
        self._last_time = time.perf_counter()
        self._last_step = None
        self.trace_dir = trace_dir
        # trace_steps are relative to THIS run's first step (trace_offset =
        # resume start): --trace-dir on a resumed run would otherwise never
        # reach its absolute-step window and silently produce no trace.
        self.trace_steps = (trace_steps[0] + trace_offset,
                            trace_steps[1] + trace_offset)
        self._tracing = False

    def maybe_trace(self, step: int, stride: int = 1) -> None:
        """Start/stop the profiler around trace_steps. ``stride`` is the
        number of steps the next dispatch covers (train.steps_per_call):
        the trace starts at the call containing trace_steps[0] and stops
        at the first call boundary past trace_steps[1]."""
        if self.trace_dir is None:
            return
        if not self._tracing and step <= self.trace_steps[0] < step + stride:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        elif self._tracing and step + stride > self.trace_steps[1]:
            jax.profiler.stop_trace()
            self._tracing = False
            self.trace_dir = None          # one-shot window

    def close(self) -> None:
        """Stop a still-open trace window (run ended inside it): trace
        data is only flushed on stop_trace, so skipping this loses the
        profile of a short/truncated run."""
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            self.trace_dir = None

    def log_now(self, step: int, metrics: dict) -> None:
        """Unconditional structured log (validation results etc.)."""
        if not self.primary:
            return
        record = {"step": step}
        record.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        parts = [f"step {step}"] + [f"{k}={v:.4g}" for k, v in record.items()
                                    if k != "step"]
        print("  ".join(parts), flush=True)

    def log(self, step: int, metrics: dict) -> None:
        if step % self.log_every != 0 or not self.primary:
            return
        now = time.perf_counter()
        record = {"step": step}
        record.update({k: float(v) for k, v in metrics.items()})
        if self._last_step is not None and step > self._last_step:
            dt = (now - self._last_time) / (step - self._last_step)
            record["step_time_s"] = dt
            if self.batch_size:
                record["images_per_sec_per_chip"] = (
                    self.batch_size / dt / self.n_chips)
        self._last_time, self._last_step = now, step
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        parts = [f"step {step}"]
        parts += [f"{k}={v:.4g}" for k, v in record.items()
                  if k != "step" and isinstance(v, float)]
        print("  ".join(parts), flush=True)

    def write_json(self, name: str, obj) -> None:
        if not self.primary:
            return
        with open(self.dir / name, "w") as f:
            json.dump(obj, f, indent=2, default=str)
