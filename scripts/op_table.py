"""Op-level step-time table for the flagship train step (VERDICT r2
item 8: turn the "60% MXU conv ceiling" claim into per-op evidence).

Captures a jax.profiler xplane trace of the compiled adversarial step on
the real chip, parses the TPU device plane (tensorflow's xplane proto —
TF is in the image but NOT load-bearing elsewhere), and aggregates
self-time by HLO op, bucketed into conv-forward / conv-backward / norm /
elementwise / copy classes. Prints a JSON table and writes
``results/op_table.json``.

Usage: python scripts/op_table.py [n_steps]
"""

from __future__ import annotations

import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parent.parent
TRACE_DIR = "/tmp/apv_op_trace"


def capture(n_steps: int = 10) -> None:
    from apv_tpu.parallel import data_sharding, make_mesh, replicated
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import get_preset

    cfg = get_preset("cifar_advprior_resnet")
    fns = make_train_fns(cfg)
    mesh = make_mesh()
    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(0))
    h, w, c = cfg.model.image_shape
    images = np.random.default_rng(0).integers(
        0, 256, size=(cfg.train.batch_size, h, w, c)).astype(np.uint8)
    batch = {"image": jax.device_put(images, data_sharding(mesh))}
    step = jax.jit(fns.train_step, donate_argnums=0)
    with mesh:
        for _ in range(5):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(n_steps):
                state, metrics = step(state, batch)
            float(metrics["loss"])


# On TPU, XLA fuses nearly everything into generic "%fusion.N" ops, so
# opcode alone is useless — classify by SHAPE SIGNATURE instead: a fusion
# whose OUTPUT is 3x3-filter-shaped is a conv-backward-filter; one with a
# 3x3-filter OPERAND runs a conv (forward or backward-input) on the MXU.
_FILTER = re.compile(r"\[3,3,\d+,\d+\]")
_BOUND = {"conv_mxu": "MXU", "conv_bwd_filter": "MXU",
          "elementwise": "VPU/HBM", "copy_reshape": "HBM",
          "reduce_stats": "VPU", "pallas": "kernel", "convert": "VPU"}


def bucket_of(name: str) -> tuple[str, str]:
    lhs, _, rhs = name.partition(" = ")
    ident = re.sub(r"[.\d]+$", "", lhs.lstrip("%"))
    i = rhs.find("fusion(")
    out_t, operands = (rhs[:i], rhs[i:]) if i >= 0 else (rhs.split("(")[0],
                                                         rhs)
    if "custom-call" in ident or "jvp" in ident:
        b = "pallas"
    elif "convolution" in ident or "conv" in ident:
        b = "conv_mxu"
    elif "fusion" in ident:
        if _FILTER.search(out_t):
            b = "conv_bwd_filter"
        elif _FILTER.search(operands):
            b = "conv_mxu"
        elif "reduce" in ident:
            b = "reduce_stats"
        else:
            b = "elementwise"
    elif any(k in ident for k in ("copy", "slice", "reshape", "bitcast",
                                  "pad", "reverse")):
        b = "copy_reshape"
    elif "convert" in ident:
        b = "convert"
    else:
        b = ident
    return b, _BOUND.get(b, "?")


def parse(n_steps: int) -> dict:
    """Aggregate exclusive per-op self-time from the device plane's
    'XLA Ops' line ONLY. The 'Async XLA Ops' line (DMA slices overlapping
    compute) and the host plane would double-count wall time — the first
    cut of this parser summed every line and reported 87 ms/step for a
    14 ms step; 'XLA Ops' alone reproduces the measured step time."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(Path(TRACE_DIR).rglob("*.xplane.pb"))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {TRACE_DIR}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    planes = [p for p in space.planes
              if "TPU" in p.name and any(l.name == "XLA Ops"
                                         for l in p.lines)]
    if not planes:
        raise RuntimeError("no TPU device plane with an 'XLA Ops' line; "
                           f"planes: {[p.name for p in space.planes]}")
    op_time_ps: dict[str, int] = defaultdict(int)
    op_count: dict[str, int] = defaultdict(int)
    async_dma_ms = 0.0
    for plane in planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "Async XLA Ops":
                async_dma_ms += sum(e.duration_ps
                                    for e in line.events) / 1e9 / n_steps
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                op_time_ps[name] += ev.duration_ps
                op_count[name] += 1

    total_ps = sum(op_time_ps.values())
    per_step_ms = total_ps / 1e9 / n_steps
    rows = sorted(op_time_ps.items(), key=lambda kv: -kv[1])
    buckets: dict[str, float] = defaultdict(float)
    for name, ps in rows:
        buckets[bucket_of(name)[0]] += ps / 1e9 / n_steps
    top = [{"op": name[:160], "ms_per_step": round(ps / 1e9 / n_steps, 4),
            "pct": round(100 * ps / total_ps, 2),
            "calls_per_step": op_count[name] // n_steps,
            "bucket": bucket_of(name)[0], "bound": bucket_of(name)[1]}
           for name, ps in rows[:40]]
    return {"n_steps": n_steps,
            "device_plane_names": [p.name for p in planes],
            "total_device_ms_per_step": round(per_step_ms, 3),
            # DMA issued async, overlapping compute — NOT additive with the
            # exclusive op times above; large values mean the step is
            # memory-traffic heavy even when op self-times look small.
            "async_dma_overlap_ms_per_step": round(async_dma_ms, 3),
            "buckets_ms_per_step": {k: round(v, 3)
                                    for k, v in sorted(buckets.items(),
                                                       key=lambda kv: -kv[1])},
            "top_ops": top}


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    t0 = time.perf_counter()
    capture(n_steps)
    out = parse(n_steps)
    out["capture_seconds"] = round(time.perf_counter() - t0, 1)
    (REPO / "results" / "op_table.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({"total_device_ms_per_step":
                      out["total_device_ms_per_step"],
                      "buckets_ms_per_step": out["buckets_ms_per_step"]},
                     indent=2))
    for row in out["top_ops"][:20]:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
