"""Trainable diagonal-Gaussian prior p_θ(z) = N(μ, diag σ²)
(model.prior='gaussian').

The fourth prior reading next to the fixed N(0,I), the adversarially-
shaped p*(z) ∝ p0(z)·e^{D(z)}, and the trained flow (SURVEY.md §0.1):
a learned base whose (μ, log σ) train through the ELBO's KL term. The
KL gradient w.r.t. (μ, σ) is exactly moment matching to the AGGREGATE
posterior q(z) = E_x[q(z|x)] — i.e. the measured-winning ex-post
diagonal-Gaussian fit (RESULTS.md 800k A/B: −26% Fréchet / −46% MMD²
over the shaped prior), but fitted continuously DURING training and
therefore consistent between the training objective, the NLL evaluator,
and the sampler.

Unlike the flow prior this COMPOSES with the adversarial D: with
adversarial.enabled the shaped prior becomes p*(z) ∝ N(μ,σ)·e^{D(z)} —
the base carries q's location/scale (what the round-3 latent scatters
show N(0,I) cannot: ±10σ tails), and D only shapes the residual, so the
density-ratio game no longer fights the aggregate dispersion. Eval draws
the log-partition MC from the learned base; sampling SIRs a base pool.

Zero-init (μ=0, log σ=0) makes the model EXACTLY the standard-prior
model at initialization — every path (training, eval, OOD, sampling,
export) reproduces prior='standard' numbers until the base moves.

Known approximation (deliberate; round-4 advisor finding): with
adversarial shaping on, the normalizer Z(μ,σ) = E_{N(μ,σ)}[e^{D(z)}]
depends on the base params, but the G-phase gradient for (μ, log σ) is
the analytic-KL moment match only — no −∂ log Z/∂(μ,σ) term. At the
density-ratio game's optimum D ≡ const so that term vanishes; away from
it the training objective is a biased bound w.r.t. the base. Eval and
serving re-estimate log Z under the CURRENT base by MC
(eval/iwae_eval.estimate_log_partition with base_from), so every
REPORTED NLL is consistent — only the training-time pull on (μ, σ)
omits the term. Don't over-read small A/B NLL deltas against this
training bias.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from apv_tpu.core.distributions import gaussian_logpdf


class GaussianPrior(nn.Module):
    z_dim: int

    def setup(self):
        self.mu = self.param("mu", nn.initializers.zeros, (self.z_dim,))
        self.log_sigma = self.param("log_sigma", nn.initializers.zeros,
                                    (self.z_dim,))

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """log p_θ(z), shape z.shape[:-1] — exact closed form."""
        return jnp.sum(gaussian_logpdf(z, self.mu, 2.0 * self.log_sigma),
                       axis=-1)

    def sample_from(self, u: jnp.ndarray) -> jnp.ndarray:
        """Base draws u ~ N(0,I) → prior draws z = μ + σ·u (exact)."""
        return self.mu + jnp.exp(self.log_sigma) * u

    def moments(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(μ, σ²) — the analytic-KL consumers' view (training/step.py)."""
        return self.mu, jnp.exp(2.0 * self.log_sigma)
