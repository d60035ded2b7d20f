"""Latent-space diagnostic scatter (SURVEY.md §1 L6 visualization tier).

The adversarial prior's entire job is to make p*(z) ∝ N(0,I)·e^{D(z)}
cover the aggregate posterior q(z) = E_x[q(z|x)] (SURVEY.md §0.1). This
module renders that claim directly: posterior means of encoded test
images, draws from the standard prior, and draws from the shaped prior
(SIR, optionally MALA-refined), all projected onto the top-2 principal
components of the aggregate posterior. A well-trained adversarial prior
shows the shaped-prior cloud tracking the posterior cloud where the
N(0,I) cloud does not.

Everything device-side is one jitted pass; the PCA and the PNG rendering
are host-side numpy/matplotlib (visualization is not a hot path).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from apv_tpu.sampling.run import sample_prior


def latent_scatter_data(model, params, x_in: jax.Array, key: jax.Array,
                        z_dim: int, *, d_apply=None, d_params=None,
                        refine_steps: int = 0) -> dict:
    """Posterior means + prior draws, projected to the aggregate
    posterior's top-2 PCs.

    Returns a dict of [N,2] float arrays: ``posterior``, ``prior`` and —
    for adversarial models — ``shaped_prior``; plus ``explained``: the
    fraction of aggregate-posterior variance the 2 PCs carry (how honest
    the 2-D picture is).
    """
    n = int(x_in.shape[0])

    @jax.jit
    def _device(params, d_params, x, key):
        k_p, k_s, k_e = jax.random.split(key, 3)
        mean, logvar = model.apply({"params": params}, x, method="encode")
        z_prior = jax.random.normal(k_p, (n, z_dim), jnp.float32)
        # ex-post aggregate-posterior Gaussian (law of total variance) —
        # the same fit `apv sample --prior expost` decodes from, drawn
        # here so the scatter shows where that generation prior lives
        agg_mean = jnp.mean(mean, axis=0)
        agg_var = jnp.var(mean, axis=0) + jnp.mean(jnp.exp(logvar), axis=0)
        z_expost = agg_mean + jnp.sqrt(agg_var) * jax.random.normal(
            k_e, (n, z_dim), jnp.float32)
        model_prior_kind = getattr(model, "prior", "standard")
        if model_prior_kind == "flow":
            # trained flow prior: ITS draws are the model-prior cloud
            # (the N(0,I) cloud stays as the base-distribution referent)
            z_shaped = model.apply({"params": params}, z_prior,
                                   method="prior_sample_from")
            return mean, z_prior, z_shaped, z_expost
        base_from = base_logp = None
        if model_prior_kind == "gaussian":
            # trainable base: the shaped cloud SIRs over N(μ,σ) (and with
            # no D, the base draw itself is the model-prior cloud)
            def base_from(u):
                return model.apply({"params": params}, u,
                                   method="prior_sample_from")

            def base_logp(zz):
                return model.apply({"params": params}, zz,
                                   method="prior_logpdf")
            if d_apply is None:
                return mean, z_prior, base_from(z_prior), z_expost
        if d_apply is None:
            return mean, z_prior, z_prior, z_expost
        z_shaped = sample_prior(k_s, n, z_dim, d_apply=d_apply,
                                d_params=d_params,
                                refine_steps=refine_steps,
                                base_from=base_from, base_logp=base_logp)
        return mean, z_prior, z_shaped, z_expost

    mean, z_prior, z_shaped, z_expost = _device(params, d_params, x_in, key)
    mu = np.asarray(mean, np.float64)
    centered = mu - mu.mean(0)
    # PCs of the aggregate posterior — the axes where q(z) actually lives
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    basis = vt[:2].T                                   # [Z, 2]
    total = float(np.sum(s ** 2))
    explained = float(np.sum(s[:2] ** 2) / total) if total > 0 else 0.0

    def proj(z):
        return (np.asarray(z, np.float64) - mu.mean(0)) @ basis

    out = {"posterior": proj(mu), "prior": proj(z_prior),
           "expost_prior": proj(z_expost), "explained": explained}
    if d_apply is not None:
        out["shaped_prior"] = proj(z_shaped)
    elif getattr(model, "prior", "standard") == "flow":
        out["flow_prior"] = proj(z_shaped)
    elif getattr(model, "prior", "standard") == "gaussian":
        out["gaussian_prior"] = proj(z_shaped)
    return out


def save_latent_scatter(data: dict, path: str | Path,
                        title: str = "latent space") -> Path:
    """Render the projected clouds to one PNG (matplotlib Agg)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 6.4), dpi=120)
    styles = [
        ("posterior", "aggregate posterior q(z)", "#1f77b4", 0.45),
        ("prior", "prior N(0, I)", "#9aa0a6", 0.30),
        ("shaped_prior", "shaped prior p*(z)", "#d62728", 0.45),
        ("flow_prior", "trained flow prior p_θ(z)", "#d62728", 0.45),
        ("gaussian_prior", "trained gaussian prior N(μ,σ)", "#d62728", 0.45),
        ("expost_prior", "ex-post prior (fit to q)", "#2ca02c", 0.35),
    ]
    for key, label, color, alpha in styles:
        if key in data:
            pts = np.asarray(data[key])
            ax.scatter(pts[:, 0], pts[:, 1], s=6, c=color, alpha=alpha,
                       label=label, linewidths=0)
    ax.set_title(f"{title}  (top-2 posterior PCs, "
                 f"{100 * data.get('explained', 0.0):.0f}% var)")
    ax.set_xlabel("PC 1")
    ax.set_ylabel("PC 2")
    ax.legend(loc="upper right", framealpha=0.9)
    ax.set_aspect("equal", adjustable="datalim")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
