"""Decode samples/sec probe, best-of-5-window discipline (VERDICT r2
item 6: the round-2 41k number was taken in a degraded relay phase with a
single window; bench.py's windowing exists precisely for that).

Measures the cached jitted batched decode (sampling/run.generate_samples)
on the flagship ResNet decoder at n=2048, host-readback synced. Prints one
JSON line (BASELINE.json tracked metric "decode samples/sec").
"""

from __future__ import annotations

import json
import sys
import time

import jax


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    import numpy as np

    from apv_tpu.models import build_model, d_apply_fn, make_latent_d
    from apv_tpu.sampling.run import generate_samples
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils.config import get_preset

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = get_preset("cifar_advprior_resnet")
    fns = make_train_fns(cfg)
    state = jax.jit(fns.init_fn)(jax.random.PRNGKey(0))
    d_apply = d_apply_fn(make_latent_d(cfg.adversarial))

    def call(key):
        return generate_samples(fns.model, state.params, key, n,
                                cfg.model.z_dim, cfg.model.likelihood,
                                cfg.model.image_shape[2], d_apply=d_apply,
                                d_params=state.d_params, mode="mean")

    # Sustained throughput: dispatch a window of calls back-to-back and
    # host-sync ONCE at the end (block_until_ready unreadable on the relay;
    # a per-call float() readback serializes a ~35 ms host round trip into
    # every batch and measures relay latency, not decode throughput --
    # round-3 diagnosis, RESULTS.md sampling section).
    float(call(jax.random.PRNGKey(0))[0, 0, 0, 0])   # compile + warmup
    float(call(jax.random.PRNGKey(1))[0, 0, 0, 0])
    reps, best = 16, float("inf")
    for w in range(5):
        t0 = time.perf_counter()
        for i in range(reps):
            last = call(jax.random.PRNGKey(100 + w * reps + i))
        float(last[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    per_call = best / reps
    print(json.dumps({
        "metric": "decode_samples_per_sec_per_chip",
        "n": n,
        "pipelined_calls_per_window": reps,
        "ms_per_batch": round(per_call * 1e3, 2),
        "samples_per_sec": round(n / per_call, 0),
    }))


if __name__ == "__main__":
    main()
