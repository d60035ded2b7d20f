"""Native C++ host-pipeline library: build, parity, fallback equivalence."""

import numpy as np
import pytest

from apv_tpu.data import _native
from apv_tpu.data.preprocess import _splitmix64_uniform, static_binarize


def test_native_builds_and_loads():
    lib = _native.load()
    assert lib is not None, "g++ build of the native batcher failed"


def test_gather_rows_matches_numpy(rng):
    src = rng.integers(0, 256, size=(1000, 28, 28, 1)).astype(np.uint8)
    idx = rng.integers(0, 1000, size=128)
    got = _native.gather_rows(src, idx)
    assert got is not None
    np.testing.assert_array_equal(got, src[idx])

    srcf = rng.normal(size=(500, 32, 32, 3)).astype(np.float32)
    gotf = _native.gather_rows(srcf, idx % 500)
    np.testing.assert_array_equal(gotf, srcf[idx % 500])


def test_gather_rejects_unsupported(rng):
    src = rng.normal(size=(10, 4)).astype(np.float64)
    assert _native.gather_rows(src, np.arange(3)) is None


def test_binarize_native_numpy_identical(rng):
    """The binarized dataset must be identical with and without the lib."""
    img = rng.integers(0, 256, size=(64, 28, 28, 1)).astype(np.uint8)
    native = _native.binarize_u8(img, seed=42)
    if native is None:
        pytest.skip("native lib unavailable")
    u = _splitmix64_uniform(img.size, 42).reshape(img.shape)
    numpy_path = (u * np.float32(255.0)
                  < img.astype(np.float32)).astype(np.float32)
    np.testing.assert_array_equal(native, numpy_path)
    # and the public entry uses one of them deterministically
    np.testing.assert_array_equal(static_binarize(img, 42),
                                  static_binarize(img, 42))


def test_binarize_statistics():
    img = np.full((100_000,), 128, np.uint8)
    out = static_binarize(img, seed=7)
    # P(1) = 128/255 within sampling noise
    np.testing.assert_allclose(out.mean(), 128 / 255, atol=0.01)
    img0 = np.zeros(1000, np.uint8)
    img255 = np.full(1000, 255, np.uint8)
    assert static_binarize(img0, 1).max() == 0.0
    assert static_binarize(img255, 1).min() == 1.0


def test_batcher_uses_native_gather(rng):
    from apv_tpu.data import Batcher
    arrays = {"image": rng.integers(0, 256, size=(100, 8, 8, 1)).astype(np.uint8)}
    b = Batcher(arrays, 32, seed=0)
    batch = next(iter(b))
    assert batch["image"].shape == (32, 8, 8, 1)
    assert batch["image"].dtype == np.uint8
