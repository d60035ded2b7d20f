"""Ex-post normalizing-flow prior: RealNVP affine couplings on z.

Third rung of the ex-post prior ladder (SURVEY.md §2.5 evaluation /
sampling surface; RAE lineage, arXiv 1903.12436 §4). The measured story
so far (RESULTS.md 800k A/B): the converged adversarial prior
under-disperses vs the aggregate posterior q(z); a diagonal-Gaussian
ex-post fit recovers −26% Fréchet, and its residual gap is q's heavy
tails, which neither a diagonal Gaussian nor (fully) a K-component
diagonal GMM can carry. An affine-coupling flow is the standard exact-
density model for that regime: closed-form log-density (so the NLL path
needs no MC log-partition estimate, same contract as the GMM), closed-
form inverse (so sampling is one batched pass, exportable to StableHLO).

TPU shape: each coupling layer is two dense matmuls (MXU) plus
elementwise mask/exp work that XLA fuses; the whole maximum-likelihood
fit is ONE jitted ``lax.scan`` of Adam steps over on-device minibatches
— no per-step host round trips on a relay where dispatch costs ~15 ms
(RESULTS.md dispatch table).

Parameterization notes (each is load-bearing for stability):

* The last dense layer of every coupling MLP initializes to ZERO, so the
  flow starts as the identity and early fit steps are well-conditioned.
* The log-scale output is smoothly capped, ``s = cap·tanh(raw/cap)``,
  bounding each layer's per-dim expansion to e^±cap — unbounded scales
  are the classic RealNVP divergence mode.
* A fixed whitening layer (data moments, not learned) absorbs q(z)'s
  wild per-dim spread (±10σ in the converged flagship's top PCs) so the
  couplings model shape, not scale.

The fitted prior is a plain pytree dict — it flows through ``jax.jit``
boundaries, ``jax.device_get``, and ``jax.export`` tracing like any
other parameter tree (serving.py bakes it into sampler artifacts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SCALE_CAP = 3.0


def _mask(z_dim: int, layer: int) -> jnp.ndarray:
    """Alternating binary mask; 1 = conditioning (pass-through) dims."""
    return jnp.asarray((jnp.arange(z_dim) + layer) % 2, jnp.float32)


def init_flow(key: jax.Array, z_dim: int, *, n_layers: int = 6,
              hidden: int = 64, mean=None, std=None) -> dict:
    """Initialize flow params (identity map until fitted).

    ``mean``/``std`` ([Z] each) seed the fixed whitening layer; defaults
    are 0/1 (no whitening) — :func:`fit_flow` sets them from data.
    """
    if n_layers < 2:
        raise ValueError(f"a flow needs n_layers >= 2 so every dim is "
                         f"transformed at least once, got {n_layers}")
    layers = []
    for i in range(n_layers):
        key, k1, k2 = jax.random.split(key, 3)
        # He-scaled hidden layers; zero-init output => identity coupling
        layers.append({
            "w1": jax.random.normal(k1, (z_dim, hidden), jnp.float32)
            * jnp.sqrt(2.0 / z_dim),
            "b1": jnp.zeros((hidden,), jnp.float32),
            "w2": jax.random.normal(k2, (hidden, hidden), jnp.float32)
            * jnp.sqrt(2.0 / hidden),
            "b2": jnp.zeros((hidden,), jnp.float32),
            "w3": jnp.zeros((hidden, 2 * z_dim), jnp.float32),
            "b3": jnp.zeros((2 * z_dim,), jnp.float32),
        })
    return {
        "whiten": {
            "mean": (jnp.zeros((z_dim,), jnp.float32)
                     if mean is None else jnp.asarray(mean, jnp.float32)),
            "log_std": (jnp.zeros((z_dim,), jnp.float32) if std is None
                        else jnp.log(jnp.asarray(std, jnp.float32))),
        },
        "layers": layers,
    }


def _coupling_st(layer: dict, z_masked: jax.Array, mask: jax.Array):
    """Coupling MLP: masked input → (log-scale s, shift t), both zeroed
    on the conditioning dims (they pass through unchanged)."""
    h = jax.nn.silu(z_masked @ layer["w1"] + layer["b1"])
    h = jax.nn.silu(h @ layer["w2"] + layer["b2"])
    out = h @ layer["w3"] + layer["b3"]
    z_dim = mask.shape[0]
    s_raw, t = out[..., :z_dim], out[..., z_dim:]
    s = _SCALE_CAP * jnp.tanh(s_raw / _SCALE_CAP)
    return s * (1.0 - mask), t * (1.0 - mask)


def flow_forward(params: dict, z: jax.Array):
    """Density direction z → u: whiten, then couplings in order.

    Returns ``(u, log_det)`` with ``log_det = log|det du/dz|`` summed
    over all layers, shape ``z.shape[:-1]``.
    """
    w = params["whiten"]
    u = (z - w["mean"]) * jnp.exp(-w["log_std"])
    log_det = jnp.broadcast_to(-jnp.sum(w["log_std"]), z.shape[:-1])
    z_dim = z.shape[-1]
    for i, layer in enumerate(params["layers"]):
        mask = _mask(z_dim, i)
        s, t = _coupling_st(layer, u * mask, mask)
        u = mask * u + (1.0 - mask) * (u * jnp.exp(s) + t)
        log_det = log_det + jnp.sum(s, axis=-1)
    return u, log_det


def flow_inverse(params: dict, u: jax.Array) -> jax.Array:
    """Sampling direction u → z: invert couplings in reverse, unwhiten.
    Exact (affine couplings invert in closed form)."""
    z_dim = u.shape[-1]
    z = u
    for i in reversed(range(len(params["layers"]))):
        mask = _mask(z_dim, i)
        s, t = _coupling_st(params["layers"][i], z * mask, mask)
        z = mask * z + (1.0 - mask) * ((z - t) * jnp.exp(-s))
    w = params["whiten"]
    return z * jnp.exp(w["log_std"]) + w["mean"]


def flow_logpdf(params: dict, z: jax.Array) -> jax.Array:
    """Exact log p(z) by change of variables (no MC estimate needed —
    the same 'proper likelihood' contract as the ex-post GMM)."""
    u, log_det = flow_forward(params, z)
    log_base = -0.5 * jnp.sum(u * u + jnp.log(2.0 * jnp.pi), axis=-1)
    return log_base + log_det


def fit_flow(key: jax.Array, z: jax.Array, *, n_layers: int = 6,
             hidden: int = 64, steps: int = 2000, batch: int = 1024,
             lr: float = 1e-3, weight_decay: float = 1e-4,
             holdout_frac: float = 0.1):
    """Maximum-likelihood fit to latent samples, one jitted program.

    AdamW over ``steps`` minibatch NLL steps under a single ``lax.scan``
    (cosine-decayed LR); minibatches are on-device index gathers, so the
    entire fit is one dispatch. Returns ``(params, nll_trace)`` where
    ``nll_trace`` is the per-step mean train NLL (nats) for convergence
    inspection.

    Two overfit guards — the fit sees a few thousand posterior draws but
    carries ~10⁵ parameters: weight decay, and holdout-best selection
    (``holdout_frac`` of the samples never train; every step scores them
    and the scan carries the best-holdout params, so the returned flow
    is the early-stopped one, not the last iterate). The holdout shuffle
    is seeded off ``key`` — callers pass data in any order.
    """
    import optax

    z = jnp.asarray(z, jnp.float32)
    n_total, z_dim = z.shape
    k_init, k_perm, k_fit = jax.random.split(key, 3)
    n_hold = int(n_total * holdout_frac)
    if n_hold > 0:
        z = z[jax.random.permutation(k_perm, n_total)]
    z_hold, z_train = z[:n_hold], z[n_hold:]
    n = n_total - n_hold
    batch = min(batch, n)
    params = init_flow(k_init, z_dim, n_layers=n_layers, hidden=hidden,
                       mean=jnp.mean(z_train, axis=0),
                       std=jnp.std(z_train, axis=0) + 1e-4)
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps),
                     weight_decay=weight_decay)

    @jax.jit
    def _fit(params, z_train, z_hold, key):
        opt_state = tx.init(params)

        def nll(p, zb):
            return -jnp.mean(flow_logpdf(p, zb))

        def step(carry, k):
            p, s, best_nll, best_p = carry
            idx = jax.random.randint(k, (batch,), 0, n)
            loss, g = jax.value_and_grad(nll)(p, z_train[idx])
            updates, s = tx.update(g, s, p)
            p = optax.apply_updates(p, updates)
            if n_hold > 0:
                h = nll(p, z_hold)
                better = h < best_nll
                best_nll = jnp.where(better, h, best_nll)
                best_p = jax.tree.map(
                    lambda new, old: jnp.where(better, new, old), p, best_p)
            else:
                best_p = p
            return (p, s, best_nll, best_p), loss

        carry = (params, opt_state, jnp.float32(jnp.inf), params)
        (_, _, _, best_p), losses = jax.lax.scan(
            step, carry, jax.random.split(key, steps))
        return best_p, losses

    return _fit(params, z_train, z_hold, k_fit)
