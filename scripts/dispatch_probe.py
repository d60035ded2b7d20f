"""Throughput probe for train.steps_per_call on the small-model configs.

The MNIST conv-VAE step is far cheaper than the CIFAR ResNet step, so the
per-dispatch host round-trip (not compute) can bound throughput; stacking k
steps into one lax.scan dispatch amortizes it. Prints one JSON line per
(preset, k). Host-readback synced (CLAUDE.md relay caveat).

Usage: python scripts/dispatch_probe.py [preset ...]   (default mnist configs)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def probe(preset: str, k: int, n_calls: int = 20) -> dict:
    from apv_tpu.data import stack_batches
    from apv_tpu.parallel import (data_sharding, make_mesh, replicated,
                                  stacked_data_sharding)
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import apply_overrides, get_preset

    cfg = apply_overrides(get_preset(preset),
                          [f"train.steps_per_call={k}"])
    fns = make_train_fns(cfg)
    mesh = make_mesh()
    state = jax.jit(fns.init_fn, out_shardings=replicated(mesh))(
        jax.random.PRNGKey(0))
    h, w, c = cfg.model.image_shape
    rng = np.random.default_rng(0)
    if cfg.data.binarize:
        img = (rng.random((cfg.train.batch_size, h, w, c)) < 0.3
               ).astype(np.float32)
    else:
        img = rng.integers(0, 256, (cfg.train.batch_size, h, w, c)
                           ).astype(np.uint8)
    if k > 1:
        batch = next(stack_batches(iter([{"image": img}] * k), k))
        batch = {kk: jax.device_put(v, stacked_data_sharding(mesh))
                 for kk, v in batch.items()}
        fn = jax.jit(fns.multi_step, donate_argnums=0)
    else:
        batch = {"image": jax.device_put(img, data_sharding(mesh))}
        fn = jax.jit(fns.train_step, donate_argnums=0)

    def last_loss(m):
        loss = m["loss"]
        return loss[-1] if k > 1 else loss

    with mesh:
        for _ in range(3):
            state, m = fn(state, batch)
        float(last_loss(m))
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, m = fn(state, batch)
        float(last_loss(m))
        dt = time.perf_counter() - t0
    steps = n_calls * k
    return {"preset": preset, "steps_per_call": k,
            "step_ms": round(dt / steps * 1e3, 3),
            "images_per_sec": round(cfg.train.batch_size * steps / dt, 0)}


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    presets = sys.argv[1:] or ["mnist_vae", "mnist_advprior"]
    for preset in presets:
        for k in (1, 8, 32):
            print(json.dumps(probe(preset, k)), flush=True)


if __name__ == "__main__":
    main()
