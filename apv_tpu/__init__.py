"""apv_tpu — a TPU-native (JAX/XLA/Pallas) adversarial-prior VAE framework.

Built from scratch to cover the capability surface of
``chenwenxiao/adversarial-prior-vae`` (see SURVEY.md; the reference mount was
empty at build time, so capability citations point at SURVEY.md sections which
themselves cite the driver's BASELINE.json north star).

Public API (mirrors the reference's train / evaluate / sample entry points,
SURVEY.md §0.1):

    from apv_tpu import train, evaluate, sample, ood_score

Layer map (SURVEY.md §1):
    core/      L2  distributions & likelihoods (pure jnp oracle tier)
    ops/       L2' fused Pallas kernels with custom VJPs + jnp fallbacks
    data/      L1  dataset loaders, binarization/dequantization, host→HBM pipe
    models/    L3  flax conv/ResNet encoders+decoders, latent discriminator
    training/  L4  ELBO + adversarial alternating-update train steps
    parallel/  —   mesh construction, shardings (DP over ICI)
    eval/      L5  IWAE-k estimator at scale, bits/dim, OOD suite
    sampling/  L6  batched XLA decode path, image grids
    utils/     L7  config presets, checkpointing, metrics logging
"""

__version__ = "0.1.0"

_API_NAMES = ("train", "evaluate", "sample", "visualize", "ood_score",
              "export_artifact", "info")


def __getattr__(name):
    # Lazy so that `import apv_tpu.core` doesn't pull in flax/optax.
    if name in _API_NAMES:
        from apv_tpu import api
        return getattr(api, name)
    raise AttributeError(name)
