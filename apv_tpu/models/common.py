"""Shared network pieces: the activation registry.

``model.activation`` is a throughput/parity knob (SURVEY.md §7 R2:
architecture details are [I]-level — the TF1-era reference family most
plausibly used ReLU/LeakyReLU): GELU's tanh polynomial chain is pure VPU
time between MXU convs (measured 1.2 ms of the 15.5 ms config-3 step;
RESULTS.md roofline). All options keep the same parameter count/shapes.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS: dict[str, Callable] = {
    # flax default gelu = tanh approximation
    "gelu": nn.gelu,
    # sigmoid approximation of GELU (Hendrycks & Gimpel eq. 10): one
    # transcendental instead of tanh's polynomial chain
    "gelu_sigmoid": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; "
                         f"have {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


def likelihood_out_params(likelihood: str, mix_components: int) -> int:
    """Per-image-channel decoder head width: Bernoulli logits (1),
    disc-logistic (mean, log_scale → 2), K-component mixture
    (K means + K log_scales + K mix logits → 3·K; the split convention
    lives in losses.decoder_output_to_likelihood_params)."""
    if likelihood == "bernoulli":
        return 1
    if likelihood == "discretized_logistic":
        return 2
    if likelihood == "disc_logistic_mix":
        return 3 * mix_components
    raise ValueError(f"unknown likelihood {likelihood!r}")
