"""Conv microbenchmark: can ANYTHING beat XLA's conv at flagship shapes?
(VERDICT r2 item 8: the "~60% MXU is the conv codegen ceiling" claim needs
a measured microbenchmark verdict, even a losing one.)

Three contenders per shape, forward pass, f32 AND bf16 (the production
convs run bf16 — RESULTS.md roofline), best-of-5 windows with
host-readback sync:
  * xla_conv    — lax.conv_general_dilated (the production path)
  * nine_dot    — same conv as 9 shifted matmuls accumulated (XLA dots on
                  the MXU; tests whether conv→GEMM reformulation helps)
  * pallas_conv — hand-written kernel: batch-tiled grid, the 3×3 loop of
                  [tb·H·W, C]×[C, K] dots accumulated in VMEM

Shapes are the flagship ResNet VAE's three stages (RESULTS.md roofline).
Prints one JSON line per (shape, impl) with ms and TFLOP/s.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPES = [          # (B, H, W, Cin, Cout) — flagship stages at batch 256
    (256, 32, 32, 64, 64),
    (256, 16, 16, 128, 128),
    (256, 8, 8, 256, 256),
]


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def nine_dot(x, w):
    b, h, wd, c = x.shape
    k = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, wd, k), x.dtype)
    for ky in range(3):
        for kx in range(3):
            patch = xp[:, ky:ky + h, kx:kx + wd, :].reshape(-1, c)
            out = out + (patch @ w[ky, kx]).reshape(b, h, wd, k)
    return out


def _pallas_kernel(x_ref, w_ref, o_ref, *, h, wd, c, k):
    xb = x_ref[:]                                  # [tb, h+2, w+2, c]
    tb = xb.shape[0]
    acc = jnp.zeros((tb * h * wd, k), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = xb[:, ky:ky + h, kx:kx + wd, :].reshape(tb * h * wd, c)
            acc = acc + jnp.dot(patch, w_ref[ky, kx],
                                preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(tb, h, wd, k)


def pallas_conv(x, w, tile_b: int = 4):
    b, h, wd, c = x.shape
    k = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_pallas_kernel, h=h, wd=wd, c=c, k=k)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, k), jnp.float32),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, h + 2, wd + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, k), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, h, wd, k), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(xp, w)


def bench_chained(fn, x, w, *, n_iter=50, windows=5, reps=4) -> float:
    """Per-conv time with the dispatch floor amortized away: Cin==Cout and
    SAME padding make the conv shape-preserving, so 50 convs chain inside
    ONE jitted fori_loop — a single dispatch, back-to-back MXU work, like
    convs sit in the real training graph. (Per-call benching on this relay
    bottoms out at a ~1.7 ms dispatch floor that swamps the ~0.2 ms op.)"""

    @jax.jit
    def many(x, w):
        def body(_, xc):
            return fn(xc, w).astype(x.dtype)
        return jax.lax.fori_loop(0, n_iter, body, x)

    y = many(x, w)
    float(y[0, 0, 0, 0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = many(x, w)
        float(y[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / (reps * n_iter)


def main() -> None:
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    rng = np.random.default_rng(0)
    impls = [("xla_conv", xla_conv), ("nine_dot", nine_dot),
             ("pallas_conv", pallas_conv)]
    for b, h, wd, cin, cout in SHAPES:
        xf = jnp.asarray(rng.normal(size=(b, h, wd, cin)), jnp.float32)
        wf = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                         jnp.float32)
        ref = np.asarray(xla_conv(xf, wf))
        flops = 2 * b * h * wd * 9 * cin * cout
        for dtype in (jnp.float32, jnp.bfloat16):
            x, w = xf.astype(dtype), wf.astype(dtype)
            for name, fn in impls:
                got = np.asarray(jax.jit(fn)(x, w), np.float32)
                err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
                sec = bench_chained(fn, x, w)
                print(json.dumps({
                    "shape": [b, h, wd, cin, cout], "impl": name,
                    "dtype": dtype.__name__,
                    "chained_ms": round(sec * 1e3, 3),
                    "tflops": round(flops / sec / 1e12, 2),
                    "rel_err_vs_xla_f32": round(err, 7)}), flush=True)


if __name__ == "__main__":
    main()
