"""Model construction from config (SURVEY.md §2.3)."""

from __future__ import annotations

import flax.linen as nn

from apv_tpu.models.conv_vae import ConvVAE
from apv_tpu.models.resnet_vae import ResNetVAE


def build_model(model_cfg) -> nn.Module:
    """Build the VAE module named by ``model_cfg.family``."""
    mix = getattr(model_cfg, "mix_components", 5)
    if model_cfg.family == "conv":
        return ConvVAE(z_dim=model_cfg.z_dim, widths=tuple(model_cfg.widths),
                       dense=model_cfg.dense,
                       image_shape=tuple(model_cfg.image_shape),
                       likelihood=model_cfg.likelihood,
                       activation=getattr(model_cfg, "activation", "gelu"),
                       mix_components=mix,
                       prior=getattr(model_cfg, "prior", "standard"),
                       prior_flow_layers=getattr(model_cfg,
                                                 "prior_flow_layers", 6),
                       prior_flow_hidden=getattr(model_cfg,
                                                 "prior_flow_hidden", 64))
    if model_cfg.family == "resnet":
        return ResNetVAE(z_dim=model_cfg.z_dim, widths=tuple(model_cfg.widths),
                         blocks_per_stage=model_cfg.blocks_per_stage,
                         image_shape=tuple(model_cfg.image_shape),
                         likelihood=model_cfg.likelihood,
                         upsample=getattr(model_cfg, "upsample", "nearest"),
                         activation=getattr(model_cfg, "activation", "gelu"),
                         norm=getattr(model_cfg, "norm", "group"),
                         mix_components=mix,
                         prior=getattr(model_cfg, "prior", "standard"),
                         prior_flow_layers=getattr(model_cfg,
                                                   "prior_flow_layers", 6),
                         prior_flow_hidden=getattr(model_cfg,
                                                   "prior_flow_hidden", 64))
    raise ValueError(f"unknown model family {model_cfg.family!r}")
