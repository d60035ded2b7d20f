"""IWAE k=1000 eval throughput vs scan-chunk size (SURVEY.md §7 "chunk
size autotuned to HBM" hard part — measured instead of modeled).

Larger chunks mean fewer scan iterations (less per-iteration overhead) but
a bigger live slab of decoder activations; this probe measures s/batch for
the flagship ResNet VAE at k=1000 over divisors of k, best-of-3 windows
with host-readback sync. The winner gets snapped into the iwae_eval
preset's ``eval.iwae_chunk`` if it beats the current default measurably.

Usage: python scripts/iwae_chunk_probe.py [chunk ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    from apv_tpu.eval.iwae_eval import make_iwae_fn
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import get_preset

    cfg = get_preset("iwae_eval")
    k = cfg.eval.iwae_k
    batch = cfg.eval.batch_size
    chunks = [int(c) for c in sys.argv[1:]] or [25, 50, 100, 200, 500]
    fns = make_train_fns(cfg)
    state = jax.jit(fns.init_fn)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h, w, c = cfg.model.image_shape
    x = np.asarray(rng.random((batch, h, w, c)), np.float32)

    for chunk in chunks:
        if k % chunk:
            print(json.dumps({"chunk": chunk, "skip": "not a divisor"}),
                  flush=True)
            continue
        fn = jax.jit(make_iwae_fn(fns.model, cfg.model.likelihood, k=k,
                                  chunk=chunk))
        try:
            ll = fn(state.params, None, x, x, jax.random.PRNGKey(0), 0.0)
            float(ll[0])
        except Exception as e:                      # OOM at huge chunks
            print(json.dumps({"chunk": chunk,
                              "error": type(e).__name__}), flush=True)
            continue
        best = float("inf")
        for w_i in range(3):
            t0 = time.perf_counter()
            for i in range(3):
                ll = fn(state.params, None, x, x,
                        jax.random.PRNGKey(1 + 3 * w_i + i), 0.0)
            float(ll[0])
            best = min(best, (time.perf_counter() - t0) / 3)
        print(json.dumps({"chunk": chunk, "k": k, "batch": batch,
                          "s_per_batch": round(best, 4),
                          "images_per_sec": round(batch / best, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
