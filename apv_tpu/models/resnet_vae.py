"""CIFAR-scale residual VAE (SURVEY.md §2.3 row 3).

Encoder: conv stem → [ResBlock×n, strided downsample] per stage (32→16→8),
global dense heads. Decoder mirrors with nearest-upsample + conv. Output is
the discretized-logistic parameter map: per-pixel (mean, log_scale) → 2·C
channels, f32. GroupNorm (batch-size independent — the same params serve
train and k-replicated IWAE eval) + GELU throughout, bf16 compute.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from apv_tpu.models.common import get_activation, likelihood_out_params
from apv_tpu.models.conv_vae import _upsample2x


def _make_norm(norm: str, groups: int, dtype):
    """norm='group' -> flax GroupNorm; 'rms' -> channel-only RMSNorm;
    'none' -> identity (norm-free residual trunk — the TF1-era reference
    family plausibly used no norm, and GroupNorm is ~15% of the measured
    step; RESULTS.md roofline).

    'rms' exists for throughput: GroupNorm reduces over (H, W, C/G), a
    two-pass walk over the whole activation that XLA cannot fuse into the
    surrounding convs (measured 2.3-2.6 ms/step, RESULTS.md roofline).
    RMSNorm reduces only over the channel axis at each spatial position —
    one short per-row reduction XLA fuses with the adjacent elementwise
    ops, so the activation is read once, not three times.
    Norm-free blocks scale the residual branch by 1/sqrt(2) (SkipInit-ish)
    to keep activation variance bounded with depth."""
    if norm == "group":
        return nn.GroupNorm(num_groups=groups, dtype=dtype)
    if norm == "rms":
        return nn.RMSNorm(dtype=dtype)
    if norm == "none":
        return lambda x: x
    raise ValueError(f"unknown norm {norm!r} (group|rms|none)")


class ResBlock(nn.Module):
    width: int
    dtype: jnp.dtype = jnp.bfloat16
    groups: int = 8
    activation: str = "gelu"
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        h = _make_norm(self.norm, self.groups, self.dtype)(x)
        h = act(h)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype)(h)
        h = _make_norm(self.norm, self.groups, self.dtype)(h)
        h = act(h)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype)(h)
        if self.norm == "none":
            h = h * (2.0 ** -0.5)
        if x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1), dtype=self.dtype)(x)
        return x + h


class ResNetEncoder(nn.Module):
    z_dim: int
    widths: Sequence[int] = (64, 128, 256)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "gelu"
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.widths[0], (3, 3), dtype=self.dtype)(x.astype(self.dtype))
        for i, w in enumerate(self.widths):
            for _ in range(self.blocks_per_stage):
                h = ResBlock(w, self.dtype, activation=self.activation,
                             norm=self.norm)(h)
            if i < len(self.widths) - 1:
                h = nn.Conv(self.widths[i + 1], (3, 3), strides=(2, 2),
                            dtype=self.dtype)(h)
        h = _make_norm(self.norm, 8, self.dtype)(h)
        h = get_activation(self.activation)(h)
        h = h.reshape(h.shape[0], -1)
        out = nn.Dense(2 * self.z_dim, dtype=jnp.float32,
                       name="gaussian_head")(h.astype(jnp.float32))
        mean, logvar = jnp.split(out, 2, axis=-1)
        logvar = 8.0 * jnp.tanh(logvar / 8.0)
        return mean, logvar


class ResNetDecoder(nn.Module):
    image_shape: tuple[int, int, int] = (32, 32, 3)
    widths: Sequence[int] = (256, 128, 64)     # deepest first
    blocks_per_stage: int = 2
    out_params: int = 2                        # disc-logistic: mean, log_scale
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "gelu"
    norm: str = "group"
    # 'nearest': broadcast-upsample + 3x3 conv (no checkerboard artifacts);
    # 'conv_transpose': one fused stride-2 4x4 transposed conv (fewer HBM
    # round-trips; kernel 4 divisible by stride avoids most checkerboard)
    upsample: str = "nearest"

    @nn.compact
    def __call__(self, z):
        hh, ww, c = self.image_shape
        down = 2 ** (len(self.widths) - 1)
        h0, w0 = hh // down, ww // down
        h = nn.Dense(h0 * w0 * self.widths[0], dtype=self.dtype)(
            z.astype(self.dtype))
        h = h.reshape(-1, h0, w0, self.widths[0])
        for i, w in enumerate(self.widths):
            for _ in range(self.blocks_per_stage):
                h = ResBlock(w, self.dtype, activation=self.activation,
                             norm=self.norm)(h)
            if i < len(self.widths) - 1:
                if self.upsample == "conv_transpose":
                    h = nn.ConvTranspose(self.widths[i + 1], (4, 4),
                                         strides=(2, 2), dtype=self.dtype)(h)
                else:
                    h = _upsample2x(h)
                    h = nn.Conv(self.widths[i + 1], (3, 3), dtype=self.dtype)(h)
        h = _make_norm(self.norm, 8, self.dtype)(h)
        h = get_activation(self.activation)(h)
        out = nn.Conv(c * self.out_params, (3, 3), dtype=jnp.float32,
                      name="likelihood_head")(h.astype(jnp.float32))
        return out                              # [B, H, W, C*out_params]


class ResNetVAE(nn.Module):
    """Residual VAE; likelihood = discretized logistic (CIFAR-10)."""
    z_dim: int = 128
    widths: Sequence[int] = (64, 128, 256)
    blocks_per_stage: int = 2
    image_shape: tuple[int, int, int] = (32, 32, 3)
    dtype: jnp.dtype = jnp.bfloat16
    likelihood: str = "discretized_logistic"
    upsample: str = "nearest"
    activation: str = "gelu"
    norm: str = "group"
    mix_components: int = 5                    # disc_logistic_mix only
    prior: str = "standard"          # standard | flow | gaussian
    prior_flow_layers: int = 6                 # prior='flow' only
    prior_flow_hidden: int = 64

    def setup(self):
        self.encoder = ResNetEncoder(self.z_dim, self.widths,
                                     self.blocks_per_stage, self.dtype,
                                     self.activation, self.norm)
        out_params = likelihood_out_params(self.likelihood,
                                           self.mix_components)
        self.decoder = ResNetDecoder(self.image_shape,
                                     tuple(reversed(self.widths)),
                                     self.blocks_per_stage, out_params,
                                     self.dtype, upsample=self.upsample,
                                     activation=self.activation,
                                     norm=self.norm)

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
        mean, logvar = self.encode(x)
        if self.prior in ("flow", "gaussian"):
            self.prior_logpdf(z)       # create the prior params at init
        return mean, logvar, self.decode(z)
