"""On-chip Pallas kernel parity gate (VERDICT r2 item 4).

Runs all four Pallas kernels' value+grad parity against the jnp oracle and
the reparam moment checks ON THE REAL TPU (the CI suite only exercises the
interpret/jnp fallback paths — ops/kernels.py:39), emits one JSON line per
check, and writes ``results/tpu_parity.json``. Re-run every round: a Mosaic
codegen / HW-PRNG regression surfaces here as a red gate instead of as
silently wrong training.

Usage:  python scripts/tpu_checks.py   (requires the real chip)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _check(name: str, got, want, *, rtol: float, atol: float) -> dict:
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.max(np.abs(got - want)))
    denom = np.maximum(np.abs(want), 1e-30)
    rel = float(np.max(np.abs(got - want) / denom))
    ok = bool(np.allclose(got, want, rtol=rtol, atol=atol))
    rec = {"check": name, "ok": ok, "max_abs_err": err, "max_rel_err": rel,
           "rtol": rtol, "atol": atol}
    print(json.dumps(rec))
    return rec


def _check_scaled(name: str, got, want, *, tol: float = 1e-3) -> dict:
    """Gradient parity, scale-relative: max|got-want| / max|want| ≤ tol.

    Both sides are XLA-compiled f32 on TPU with DIFFERENT expression trees
    (hand-derived bwd vs autodiff of the oracle) whose exp/sigmoid use
    TPU's transcendental approximations — element-wise rtol blows up
    wherever an individual gradient entry is near zero. The CPU interpret
    tests (tests/test_kernels.py) pin mathematical equivalence at 1e-4;
    this gate pins that the COMPILED path tracks the oracle at gradient
    scale."""
    got = np.asarray(got)
    want = np.asarray(want)
    scale = float(max(np.max(np.abs(want)), 1e-30))
    err = float(np.max(np.abs(got - want)))
    rec = {"check": name, "ok": bool(err / scale <= tol),
           "max_abs_err": err, "grad_scale": scale,
           "scaled_err": err / scale, "tol": tol}
    print(json.dumps(rec))
    return rec


def main() -> int:
    if jax.default_backend() != "tpu":
        print(json.dumps({"check": "backend", "ok": False,
                          "error": f"need TPU, got {jax.default_backend()}"}))
        return 2

    from apv_tpu.ops import dispatch
    from apv_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    records: list[dict] = []

    # -- KL: value + grad ---------------------------------------------------
    mean = rng.normal(size=(48, 128)).astype(np.float32)
    logvar = rng.normal(size=(48, 128)).astype(np.float32)
    records.append(_check(
        "kl_value", jax.jit(K.kl)(mean, logvar),
        dispatch._kl_jnp(mean, logvar), rtol=1e-5, atol=1e-4))
    w = jnp.linspace(0.5, 2.0, 48)
    gk = jax.jit(jax.grad(lambda m, lv: jnp.sum(K.kl(m, lv) * w),
                          argnums=(0, 1)))(mean, logvar)
    gj = jax.grad(lambda m, lv: jnp.sum(dispatch._kl_jnp(m, lv) * w),
                  argnums=(0, 1))(mean, logvar)
    records.append(_check("kl_grad_mean", gk[0], gj[0], rtol=1e-5, atol=1e-5))
    records.append(_check("kl_grad_logvar", gk[1], gj[1], rtol=1e-5,
                          atol=1e-5))

    # -- Bernoulli: value + grad -------------------------------------------
    logits = (rng.normal(size=(32, 3072)) * 5).astype(np.float32)
    xb = (rng.random((32, 3072)) < 0.5).astype(np.float32)
    records.append(_check(
        "bernoulli_value", jax.jit(K.bernoulli)(xb, logits),
        dispatch._bernoulli_jnp(xb, logits), rtol=1e-5, atol=2e-3))
    wb = jnp.linspace(0.5, 2.0, 32)
    gk = jax.jit(jax.grad(lambda l: jnp.sum(K.bernoulli(xb, l) * wb)))(logits)
    gj = jax.grad(lambda l: jnp.sum(dispatch._bernoulli_jnp(xb, l) * wb))(
        logits)
    records.append(_check_scaled("bernoulli_grad", gk, gj))

    # -- Discretized logistic: value + grad (incl. edge bins) --------------
    shape = (32, 3072)
    xd = (rng.integers(0, 256, size=shape) / 255.0).astype(np.float32)
    xd[0, :8] = 0.0
    xd[1, :8] = 1.0
    mu = rng.uniform(-0.2, 1.2, size=shape).astype(np.float32)
    ls = rng.uniform(-7, -0.5, size=shape).astype(np.float32)
    records.append(_check(
        "disc_logistic_value",
        jax.jit(lambda x, m, s: K.disc_logistic(x, m, s, 1 / 255.0))(
            xd, mu, ls),
        dispatch._disc_logistic_jnp(xd, mu, ls, 1 / 255.0),
        rtol=2e-5, atol=5e-2))   # per-sample sums over 3072 dims
    wd = jnp.linspace(0.5, 2.0, 32)
    gk = jax.jit(jax.grad(
        lambda m, s: jnp.sum(K.disc_logistic(xd, m, s, 1 / 255.0) * wd),
        argnums=(0, 1)))(mu, ls)
    gj = jax.grad(
        lambda m, s: jnp.sum(
            dispatch._disc_logistic_jnp(xd, m, s, 1 / 255.0) * wd),
        argnums=(0, 1))(mu, ls)
    records.append(_check_scaled("disc_logistic_grad_mean", gk[0], gj[0]))
    records.append(_check_scaled("disc_logistic_grad_ls", gk[1], gj[1]))

    # -- Reparam (HW PRNG): moments, determinism, grads ---------------------
    mean_r = jnp.broadcast_to(jnp.array([1.5, -2.0]), (200_000, 2))
    logvar_r = jnp.broadcast_to(jnp.array([0.5, -1.0]), (200_000, 2))
    z = np.asarray(jax.jit(K.reparam)(jax.random.PRNGKey(3), mean_r, logvar_r))
    m_err = float(np.max(np.abs(z.mean(0) - np.array([1.5, -2.0]))))
    v_ratio = z.var(0) / np.exp(np.array([0.5, -1.0]))
    fr = float((np.abs(z[:, 0] - 1.5) < np.exp(0.25)).mean())
    rec = {"check": "reparam_moments",
           "ok": bool(m_err < 0.02
                      and np.all(np.abs(v_ratio - 1) < 0.03)
                      and abs(fr - 0.6827) < 0.01),
           "mean_abs_err": m_err,
           "var_ratio": [float(v) for v in v_ratio],
           "frac_within_1sigma": fr}
    print(json.dumps(rec))
    records.append(rec)

    z1 = np.asarray(K.reparam(jax.random.PRNGKey(7), mean_r[:64], logvar_r[:64]))
    z2 = np.asarray(K.reparam(jax.random.PRNGKey(7), mean_r[:64], logvar_r[:64]))
    z3 = np.asarray(K.reparam(jax.random.PRNGKey(8), mean_r[:64], logvar_r[:64]))
    rec = {"check": "reparam_key_determinism",
           "ok": bool(np.array_equal(z1, z2) and not np.array_equal(z1, z3))}
    print(json.dumps(rec))
    records.append(rec)

    mg = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    lg = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    zg = K.reparam(key, mg, lg)
    g = jax.jit(jax.grad(lambda m, lv: jnp.sum(K.reparam(key, m, lv)),
                         argnums=(0, 1)))(mg, lg)
    records.append(_check("reparam_grad_mean", g[0], np.ones_like(mg),
                          rtol=1e-6, atol=1e-6))
    records.append(_check("reparam_grad_logvar", g[1],
                          0.5 * (zg - mg), rtol=1e-5, atol=1e-6))

    out = {"device": str(jax.devices()[0]),
           "jax_version": jax.__version__,
           "all_ok": all(r["ok"] for r in records),
           "checks": records}
    out_path = REPO / "results" / "tpu_parity.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=2))
    print(json.dumps({"check": "ALL", "ok": out["all_ok"],
                      "written": str(out_path)}))
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
