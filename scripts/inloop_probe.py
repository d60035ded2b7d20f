"""Real-streaming throughput probe: the full host→HBM path at train time.

Unlike dispatch_probe.py (which parks one batch on device and measures pure
compute), this drives the actual production loop — Batcher gather →
stack_batches → prefetch_to_device → jitted multi_step — so the ~50 MB/s
relay host→HBM link is in the measured path. This is the probe that decides
whether data.bit_pack (8 px/byte payloads, VERDICT r2 item 2) moves the
transfer-bound MNIST loop toward its 244k img/s compute ceiling.

Prints one JSON line per (preset, bit_pack, steps_per_call); best-of-W
windows (bench.py discipline — the relay step time wanders 2-10x).

Usage: python scripts/inloop_probe.py [preset ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax


def probe(preset: str, bit_pack: bool, k: int, *, resident: bool = False,
          windows: int = 5, steps_per_window: int = 240) -> dict:
    import numpy as np

    from apv_tpu.data import Batcher, prefetch_to_device, stack_batches
    from apv_tpu.parallel import (data_sharding, make_mesh, replicated,
                                  stacked_data_sharding)
    from apv_tpu.training.loop import load_train_arrays
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import apply_overrides, get_preset

    cfg = apply_overrides(get_preset(preset), [
        f"train.steps_per_call={k}", f"data.bit_pack={bit_pack}",
        "train.eval_every=0",
    ])
    fns = make_train_fns(cfg)
    mesh = make_mesh()
    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(0))
    arrays, _ = load_train_arrays(cfg)      # synthetic fallback, packed per cfg
    base_fn = fns.multi_step if k > 1 else fns.train_step
    if resident:
        # data.device_resident path: HBM-resident dataset, int32 index
        # batches, on-device row gather (training/loop.py wiring).
        dataset_dev = {kk: jax.device_put(v, replicated(mesh))
                       for kk, v in arrays.items()}

        from apv_tpu.training.loop import make_resident_step
        jit_fn = jax.jit(make_resident_step(base_fn), donate_argnums=0)
        fn = lambda s, b: jit_fn(s, b, dataset_dev)   # noqa: E731
        n_rows = len(next(iter(arrays.values())))
        batcher = Batcher({"_index": np.arange(n_rows, dtype=np.int32)},
                          cfg.train.batch_size, seed=0)
    else:
        fn = jax.jit(base_fn, donate_argnums=0)
        batcher = Batcher(arrays, cfg.train.batch_size, seed=0)
    if k > 1:
        batches = prefetch_to_device(stack_batches(iter(batcher), k),
                                     stacked_data_sharding(mesh))
    else:
        batches = prefetch_to_device(iter(batcher), data_sharding(mesh))

    def sync(m):
        loss = m["loss"]
        float(loss[-1] if k > 1 else loss)   # host readback (relay caveat)

    calls_per_window = max(1, steps_per_window // k)
    best = float("inf")
    with mesh:
        for _ in range(3):                   # warmup incl. compile
            state, m = fn(state, next(batches))
        sync(m)
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(calls_per_window):
                state, m = fn(state, next(batches))
            sync(m)
            best = min(best, time.perf_counter() - t0)
    steps = calls_per_window * k
    payload = next(iter(arrays.values()))
    return {"preset": preset, "bit_pack": bit_pack, "steps_per_call": k,
            "device_resident": resident,
            "bytes_per_image": 4 if resident
            else int(payload.nbytes // len(payload)),
            "step_ms": round(best / steps * 1e3, 3),
            "images_per_sec": round(cfg.train.batch_size * steps / best, 0)}


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    if sys.argv[1:2] == ["--resident"]:
        # A/B the HBM-resident dataset path against streaming at the
        # recorded operating points (RESULTS.md dispatch table).
        for preset, k in (("mnist_advprior", 8), ("mnist_advprior", 32),
                          ("cifar_advprior_resnet", 1)):
            for resident in (False, True):
                print(json.dumps(probe(preset, True, k, resident=resident)),
                      flush=True)
        return
    presets = sys.argv[1:] or ["mnist_vae", "mnist_advprior"]
    for preset in presets:
        for bit_pack in (False, True):
            for k in (8, 32):
                print(json.dumps(probe(preset, bit_pack, k)), flush=True)


if __name__ == "__main__":
    main()
