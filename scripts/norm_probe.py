"""Step-time probe for model.norm variants on the flagship config.

Measures compiled adversarial train-step time (host-readback synced, per
CLAUDE.md: block_until_ready is unreliable on the axon relay) for
norm in {group, rms, none} at the production batch size. Companion to the
RESULTS.md roofline table; run on the real chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def time_variant(norm: str, n_steps: int = 30) -> dict:
    from apv_tpu.parallel import data_sharding, make_mesh, replicated
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import apply_overrides, get_preset

    cfg = apply_overrides(get_preset("cifar_advprior_resnet"),
                          [f"model.norm={norm}"])
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
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
    ms = dt / n_steps * 1e3
    return {"norm": norm, "step_ms": round(ms, 2),
            "images_per_sec": round(cfg.train.batch_size / (dt / n_steps), 0)}


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    for norm in sys.argv[1:] or ("group", "rms", "none"):
        print(json.dumps(time_variant(norm)), flush=True)


if __name__ == "__main__":
    main()
