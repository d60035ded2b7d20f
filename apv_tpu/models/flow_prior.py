"""Trained normalizing-flow prior p_θ(z) (model.prior='flow').

The third prior family next to the fixed N(0,I) and the adversarially-
shaped p*(z) ∝ p0(z)·e^{D(z)} (SURVEY.md §0.1): a RealNVP flow trained
JOINTLY with the VAE by the same ELBO — the term −β·E_q[log q − log p_θ]
is, for the flow's parameters, maximum likelihood on aggregate-posterior
samples. Where the adversarial prior learns a density RATIO through a
discriminator game (and needs an MC log-partition estimate at eval), the
flow prior is exact end to end: exact log-density in the bound, exact
log Z = 0 at evaluation, exact inverse for sampling. It is the trained
counterpart of the ex-post flow fit (`--prior expost_flow`) — same
core/flow.py math, but learned during training rather than fitted after.

Mutually exclusive with `adversarial.enabled` (each is a complete,
different reading of log p(z)); enforced in training/step.py.

The whole flow is ONE flax param (a pytree dict, core/flow.init_flow's
structure): optax, orbax, EMA tree_maps, and the export baking all treat
it like any other parameter leaf set, and the pure core/flow functions
stay the single implementation for trained, ex-post, and test uses.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from apv_tpu.core.flow import flow_inverse, flow_logpdf, init_flow


class FlowPrior(nn.Module):
    z_dim: int
    n_layers: int = 6
    hidden: int = 64

    def setup(self):
        self.flow = self.param(
            "flow", lambda k: init_flow(k, self.z_dim,
                                        n_layers=self.n_layers,
                                        hidden=self.hidden))

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """log p_θ(z), shape z.shape[:-1] — exact (change of variables)."""
        return flow_logpdf(self.flow, z)

    def sample_from(self, u: jnp.ndarray) -> jnp.ndarray:
        """Base draws u ~ N(0,I) → prior draws z (exact inverse pass)."""
        return flow_inverse(self.flow, u)
