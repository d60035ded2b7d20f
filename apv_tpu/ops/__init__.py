"""Fused probabilistic ops (SURVEY.md §2.2 "Pallas-kernel tier").

Four hot ops from the north star — reparameterized sampling, KL, Bernoulli
reconstruction LL, discretized-logistic reconstruction LL — each with two
interchangeable backends:

* ``jnp``    — pure-jnp reference (CPU fallback + correctness oracle)
* ``pallas`` — fused TPU kernels with custom VJPs

Backend selection: ``set_backend()`` / ``APV_OPS_BACKEND`` env var, default
``pallas`` on TPU and ``jnp`` elsewhere. Every op reduces over event dims to
a per-sample value — that reduction fusing with the elementwise math is the
point of the kernel tier.
"""

from apv_tpu.ops.dispatch import (  # noqa: F401
    set_backend, get_backend, reparam_sample, kl_standard,
    bernoulli_recon_ll, disc_logistic_recon_ll, disc_logistic_mix_recon_ll)
