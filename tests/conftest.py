"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

Must run before jax is imported anywhere — pytest imports conftest first, so
setting the env here is sufficient as long as no test module imports jax at
collection time before this file executes (pytest guarantees conftest loads
first within the rootdir).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and calls
# jax.config.update("jax_platforms", "axon,cpu"), which outranks the env var.
# Re-update AFTER import (backends aren't initialized until first use).
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tiny_config(preset: str = "mnist_vae", tmp_dir: str = "/tmp/apv_test",
                **extra_overrides):
    """A preset shrunk to CPU-test size (1-core machine: keep it small)."""
    from apv_tpu.utils.config import apply_overrides, get_preset
    overrides = [
        "model.z_dim=8", "model.widths=[8,16]", "model.dense=32",
        "model.blocks_per_stage=1",
        "train.batch_size=32", "train.steps=60", "train.log_every=1000",
        "train.steps_per_call=1",   # presets default to 8 (MNIST dispatch)
        "train.checkpoint_every=100000", "train.lr=2e-3",
        "data.synthetic_size=256",
        "adversarial.d_widths=[32,32]",
        "eval.iwae_k=20", "eval.iwae_chunk=10", "eval.batch_size=16",
        "eval.max_examples=32",
        "ood.iwae_k=10", "ood.iwae_chunk=10", "ood.batch_size=16",
        "ood.max_examples=32",
        f"results_dir={tmp_dir}",
    ] + [f"{k}={v}" for k, v in extra_overrides.items()]
    return apply_overrides(get_preset(preset), overrides)
