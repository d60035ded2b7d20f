"""bits/dim conversion and related reporting metrics (SURVEY.md §2.2)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def nats_to_bits_per_dim(nll_nats, num_dims: int, *,
                         dequant_correction: bool = False,
                         num_levels: int = 256):
    """Convert a negative log-likelihood in nats to bits per dimension.

    bits/dim = NLL / (D * ln 2).

    For continuous models trained on uniformly dequantized data (CIFAR-10,
    SURVEY.md §2.1), the discrete log-likelihood relates to the continuous
    density via log P(x) >= E_u[log p(x+u)] + D*log(num_levels^-1)'s change of
    variables; with pixels scaled to [0,1] in steps of 1/(num_levels-1) the
    correction is +log(num_levels-1) per dim when the density is over [0,1].
    Our discretized-logistic likelihood is already a *discrete* pmf over 256
    bins, so no correction applies there (``dequant_correction=False``); the
    flag exists for evaluating continuous-density baselines.
    """
    bpd = nll_nats / (num_dims * math.log(2.0))
    if dequant_correction:
        bpd = bpd + math.log2(float(num_levels - 1))
    return bpd


def bits_per_dim_to_nats(bpd, num_dims: int):
    return bpd * num_dims * math.log(2.0)


def active_units(mean_batches, threshold: float = 1e-2):
    """Active latent units à la the IWAE paper (arXiv 1509.00519 §5.1):
    unit u is active if A_u = Cov_x(E_{z~q(z|x)}[z_u]) > threshold.

    ``mean_batches`` yields [B, Z] posterior-mean arrays; the variance over
    all examples is accumulated in float64 streaming moments (one pass, no
    materialized N×Z matrix). Returns (count, per-dim variance [Z]).
    """
    n = 0
    s = s2 = None
    for m in mean_batches:
        m = np.asarray(m, np.float64).reshape(m.shape[0], -1)
        if s is None:
            s = np.zeros(m.shape[1])
            s2 = np.zeros(m.shape[1])
        n += m.shape[0]
        s += m.sum(axis=0)
        s2 += (m * m).sum(axis=0)
    if not n:
        raise ValueError("active_units: no posterior means supplied")
    var = s2 / n - (s / n) ** 2
    return int((var > threshold).sum()), var


def binary_accuracy(logits, labels):
    """Discriminator accuracy: fraction of correct real/fake calls."""
    pred = (logits > 0).astype(jnp.float32)
    return jnp.mean((pred == labels.astype(jnp.float32)).astype(jnp.float32))
