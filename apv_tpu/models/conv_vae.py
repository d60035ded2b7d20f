"""MNIST-scale convolutional VAE (SURVEY.md §2.3 rows 1-2).

Encoder: strided convs 28→14→7, dense trunk, (mu, logvar) heads.
Decoder: dense → 7×7 feature map → nearest-upsample+conv ×2 → per-pixel
Bernoulli logits (upsample+conv instead of transposed conv: same FLOPs
on the MXU, no checkerboard artifacts).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from apv_tpu.models.common import get_activation, likelihood_out_params


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class ConvEncoder(nn.Module):
    z_dim: int
    widths: Sequence[int] = (32, 64)
    dense: int = 512
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        h = x.astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
            h = act(h)
            h = nn.Conv(w, (3, 3), dtype=self.dtype)(h)
            h = act(h)
        h = h.reshape(h.shape[0], -1)
        h = act(nn.Dense(self.dense, dtype=self.dtype)(h))
        # Distribution heads in float32 (accuracy-critical).
        out = nn.Dense(2 * self.z_dim, dtype=jnp.float32,
                       name="gaussian_head")(h.astype(jnp.float32))
        mean, logvar = jnp.split(out, 2, axis=-1)
        # Soft-bound logvar to a sane range; hard clipping kills gradients.
        logvar = 8.0 * jnp.tanh(logvar / 8.0)
        return mean, logvar


class ConvDecoder(nn.Module):
    image_shape: tuple[int, int, int] = (28, 28, 1)
    widths: Sequence[int] = (64, 32)
    dense: int = 512
    out_params: int = 1                # Bernoulli: 1 logit per pixel channel
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "gelu"

    @nn.compact
    def __call__(self, z):
        act = get_activation(self.activation)
        hh, ww, c = self.image_shape
        h0, w0 = hh // 4, ww // 4
        h = act(nn.Dense(self.dense, dtype=self.dtype)(z.astype(self.dtype)))
        h = act(nn.Dense(h0 * w0 * self.widths[0], dtype=self.dtype)(h))
        h = h.reshape(-1, h0, w0, self.widths[0])
        for w in self.widths:
            h = _upsample2x(h)
            h = act(nn.Conv(w, (3, 3), dtype=self.dtype)(h))
            h = act(nn.Conv(w, (3, 3), dtype=self.dtype)(h))
        out = nn.Conv(c * self.out_params, (3, 3), dtype=jnp.float32,
                      name="likelihood_head")(h.astype(jnp.float32))
        return out                      # [B, H, W, C*out_params]


class ConvVAE(nn.Module):
    """Bundled encoder/decoder; likelihood = Bernoulli over pixels."""
    z_dim: int = 40
    widths: Sequence[int] = (32, 64)
    dense: int = 512
    image_shape: tuple[int, int, int] = (28, 28, 1)
    dtype: jnp.dtype = jnp.bfloat16
    likelihood: str = "bernoulli"
    activation: str = "gelu"
    mix_components: int = 5                    # disc_logistic_mix only
    prior: str = "standard"          # standard | flow | gaussian
    prior_flow_layers: int = 6                 # prior='flow' only
    prior_flow_hidden: int = 64

    def setup(self):
        self.encoder = ConvEncoder(self.z_dim, self.widths, self.dense,
                                   self.dtype, self.activation)
        out_params = likelihood_out_params(self.likelihood,
                                           self.mix_components)
        self.decoder = ConvDecoder(self.image_shape,
                                   tuple(reversed(self.widths)), self.dense,
                                   out_params, self.dtype,
                                   activation=self.activation)

        if self.prior == "flow":
            from apv_tpu.models.flow_prior import FlowPrior
            self.flow_prior = FlowPrior(self.z_dim, self.prior_flow_layers,
                                        self.prior_flow_hidden)
        elif self.prior == "gaussian":
            from apv_tpu.models.gaussian_prior import GaussianPrior
            self.gaussian_prior = GaussianPrior(self.z_dim)
        elif self.prior != "standard":
            raise ValueError(
                f"unknown model prior {self.prior!r} "
                "(standard|flow|gaussian)")

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def prior_logpdf(self, z):
        """log p(z) under the model's own prior, shape z.shape[:-1] —
        exact for both families (the adversarially-shaped prior is NOT
        a model prior; it lives in d_params and carries a log Z)."""
        if self.prior == "flow":
            return self.flow_prior(z)
        if self.prior == "gaussian":
            return self.gaussian_prior(z)
        from apv_tpu.core.distributions import standard_gaussian_logpdf
        return jnp.sum(standard_gaussian_logpdf(z), axis=-1)

    def prior_sample_from(self, u):
        """Base draws u ~ N(0,I) → prior draws (identity for the
        standard prior, exact flow inverse for prior='flow')."""
        if self.prior == "flow":
            return self.flow_prior.sample_from(u)
        if self.prior == "gaussian":
            return self.gaussian_prior.sample_from(u)
        return u

    def __call__(self, x, z):
        """Used only for init: touches every parameter once."""
        mean, logvar = self.encode(x)
        if self.prior in ("flow", "gaussian"):
            self.prior_logpdf(z)       # create the prior params at init
        return mean, logvar, self.decode(z)
