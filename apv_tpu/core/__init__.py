"""Pure-jnp probabilistic core (SURVEY.md §2.2).

This tier is the correctness oracle: every fused Pallas kernel in
``apv_tpu.ops`` is parity-tested against these functions, and they serve as
the CPU fallback when Pallas is unavailable.
"""

from apv_tpu.core.distributions import (  # noqa: F401
    gaussian_sample,
    gaussian_logpdf,
    standard_gaussian_logpdf,
    gaussian_kl_standard,
    gaussian_kl,
    bernoulli_logpmf,
    discretized_logistic_logpmf,
)
from apv_tpu.core.iwae import iwae_log_likelihood, streaming_logsumexp  # noqa: F401
from apv_tpu.core.metrics import nats_to_bits_per_dim  # noqa: F401
