"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

Must run before jax is imported anywhere — pytest imports conftest first, so
setting the env here is sufficient as long as no test module imports jax at
collection time before this file executes (pytest guarantees conftest loads
first within the rootdir).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
