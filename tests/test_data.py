"""Data layer + config system tests (SURVEY.md §2.1, §2.6)."""

import dataclasses

import jax
import numpy as np
import pytest

from apv_tpu.data import (Batcher, load_dataset, prefetch_to_device,
                          static_binarize, to_unit_interval,
                          uniform_dequantize)
from apv_tpu.data.datasets import DATASETS
from apv_tpu.utils.config import PRESETS, apply_overrides, get_preset


@pytest.mark.parametrize("name", sorted(DATASETS))
def test_synthetic_fallback_shapes(name):
    spec = DATASETS[name]
    images, labels = load_dataset(name, "test", synthetic_size=64)
    assert images.shape == (64,) + spec.shape
    assert images.dtype == np.uint8
    assert labels.shape == (64,) and labels.dtype == np.int32
    # deterministic
    images2, labels2 = load_dataset(name, "test", synthetic_size=64)
    np.testing.assert_array_equal(images, images2)


def test_synthetic_seed_is_process_independent():
    """Golden values: python's salted hash() must never sneak back in —
    a per-process seed means train and eval processes see different data."""
    from apv_tpu.data.datasets import _stable_seed
    assert _stable_seed("mnist", "test") == _stable_seed("mnist", "test")
    # blake2s digest of "mnist/test" — fixed forever
    assert _stable_seed("mnist", "test") == 547395361
    assert _stable_seed("mnist", "train") != _stable_seed("mnist", "test")


def test_synthetic_train_test_same_family():
    """Train/test of one synthetic dataset must come from one distribution
    (the base frequency family depends on the name only)."""
    tr, _ = load_dataset("mnist", "train", synthetic_size=512)
    te, _ = load_dataset("mnist", "test", synthetic_size=512)
    # same family -> closely matching pixel-intensity histograms
    h_tr, _ = np.histogram(tr, bins=16, range=(0, 255), density=True)
    h_te, _ = np.histogram(te, bins=16, range=(0, 255), density=True)
    np.testing.assert_allclose(h_tr, h_te, atol=0.0005)


def test_synthetic_datasets_differ_across_names():
    a, _ = load_dataset("mnist", "test", synthetic_size=32)
    b, _ = load_dataset("fashion_mnist", "test", synthetic_size=32)
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_load_rejects_unknown():
    with pytest.raises(ValueError):
        load_dataset("imagenet")
    with pytest.raises(ValueError):
        load_dataset("mnist", "valid")
    with pytest.raises(FileNotFoundError):
        load_dataset("mnist", data_dir="/nonexistent", allow_synthetic=False)


def test_static_binarize():
    img = np.array([[0, 255, 128]], np.uint8)
    out1 = static_binarize(img, seed=3)
    out2 = static_binarize(img, seed=3)
    np.testing.assert_array_equal(out1, out2)        # static = fixed
    assert out1.dtype == np.uint8     # 4x-smaller host->HBM payload
    assert set(np.unique(out1)) <= {0, 1}
    assert out1[0, 0] == 0.0 and out1[0, 1] == 1.0   # p=0 and p=1 are exact
    # p=128/255 binarizes to either value across seeds
    vals = {float(static_binarize(img, seed=s)[0, 2]) for s in range(30)}
    assert vals == {0.0, 1.0}


def test_uniform_dequantize_range():
    img = np.array([[0, 255]], np.uint8)
    out = uniform_dequantize(jax.random.PRNGKey(0), img)
    arr = np.asarray(out)
    assert arr.dtype == np.float32
    assert 0.0 <= arr[0, 0] < 1 / 256 + 1e-6
    assert 255 / 256 <= arr[0, 1] < 1.0
    np.testing.assert_allclose(np.asarray(to_unit_interval(img)),
                               [[0.0, 1.0]])


def test_batcher_epochs_and_shuffling():
    arrays = {"image": np.arange(100, dtype=np.float32)[:, None]}
    b = Batcher(arrays, 32, seed=1)
    assert b.batches_per_epoch == 3
    epoch1 = list(b.epoch())
    assert len(epoch1) == 3
    assert all(x["image"].shape == (32, 1) for x in epoch1)
    epoch2 = list(b.epoch())
    flat1 = np.concatenate([x["image"] for x in epoch1]).ravel()
    flat2 = np.concatenate([x["image"] for x in epoch2]).ravel()
    assert not np.array_equal(flat1, flat2)          # reshuffled
    with pytest.raises(ValueError):
        Batcher(arrays, 200)
    with pytest.raises(ValueError):
        Batcher({"a": np.zeros(3), "b": np.zeros(4)}, 2)


def test_prefetch_preserves_order_and_count():
    arrays = {"x": np.arange(64, dtype=np.float32)}
    b = Batcher(arrays, 16, shuffle=False)
    out = list(prefetch_to_device(b.epoch(), depth=2))
    assert len(out) == 4
    np.testing.assert_array_equal(np.asarray(out[0]["x"]),
                                  np.arange(16, dtype=np.float32))
    assert isinstance(out[0]["x"], jax.Array)


def test_stack_batches_order_and_remainder():
    from apv_tpu.data import stack_batches
    arrays = {"x": np.arange(80, dtype=np.float32)}
    b = Batcher(arrays, 16, shuffle=False)
    out = list(stack_batches(b.epoch(), 2))
    # 5 batches -> 2 full stacks, trailing odd batch dropped
    assert len(out) == 2
    assert out[0]["x"].shape == (2, 16)
    np.testing.assert_array_equal(out[0]["x"][1],
                                  np.arange(16, 32, dtype=np.float32))
    np.testing.assert_array_equal(out[1]["x"][0],
                                  np.arange(32, 48, dtype=np.float32))


# -- config system ----------------------------------------------------------

def test_all_presets_build():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.name == name
        assert cfg.to_json()


def test_preset_capability_surface():
    """The five configs must match BASELINE.json's definitions."""
    c1 = get_preset("mnist_vae")
    assert (c1.data.binarize, c1.model.likelihood,
            c1.adversarial.enabled) == (True, "bernoulli", False)
    c2 = get_preset("mnist_advprior")
    assert c2.adversarial.enabled
    c3 = get_preset("cifar_advprior_resnet")
    assert (c3.model.family, c3.model.likelihood, c3.data.dequantize,
            c3.adversarial.enabled) == ("resnet", "discretized_logistic",
                                        True, True)
    c4 = get_preset("iwae_eval")
    assert c4.eval.iwae_k == 1000
    c5 = get_preset("ood_suite")
    assert (c5.ood.in_dataset, c5.ood.ood_dataset) == ("cifar10", "svhn")


def test_eval_presets_point_at_training_checkpoints():
    """iwae_eval/ood_suite must read the checkpoints config 3 writes."""
    assert get_preset("iwae_eval").checkpoint_of == "cifar_advprior_resnet"
    assert get_preset("ood_suite").checkpoint_of == "cifar_advprior_resnet"
    assert get_preset("cifar_advprior_resnet").checkpoint_of is None


def test_overrides():
    cfg = get_preset("mnist_vae")
    cfg = apply_overrides(cfg, ["train.lr=0.5", "model.widths=[4,8]",
                                "adversarial.enabled=true",
                                "data.data_dir=/tmp/x"])
    assert cfg.train.lr == 0.5
    assert cfg.model.widths == (4, 8)
    assert cfg.adversarial.enabled is True
    assert cfg.data.data_dir == "/tmp/x"
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no.such.field=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["malformed"])


def test_config_frozen():
    cfg = get_preset("mnist_vae")
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.train.lr = 1.0


# ---------------------------------------------------------------------------
# Bit-packed binarized payloads (VERDICT r2 item 2): 8 px/byte host->HBM
# ---------------------------------------------------------------------------

def test_pack_unpack_roundtrip(rng):
    import jax.numpy as jnp

    from apv_tpu.data.preprocess import pack_bits, unpack_bits

    imgs = (rng.random((10, 28, 28, 1)) < 0.5).astype(np.uint8)
    packed = pack_bits(imgs)
    assert packed.shape == (10, 98) and packed.dtype == np.uint8
    un = np.asarray(unpack_bits(jnp.asarray(packed), (28, 28, 1)))
    np.testing.assert_array_equal(un, imgs.astype(np.float32))


def test_pack_unpack_non_multiple_of_8(rng):
    import jax.numpy as jnp

    from apv_tpu.data.preprocess import pack_bits, unpack_bits

    imgs = (rng.random((4, 3, 3, 1)) < 0.5).astype(np.uint8)   # 9 px/image
    packed = pack_bits(imgs)
    assert packed.shape == (4, 2)           # ceil(9/8) bytes
    un = np.asarray(unpack_bits(jnp.asarray(packed), (3, 3, 1)))
    np.testing.assert_array_equal(un, imgs.astype(np.float32))


def test_unpack_handles_stacked_batches(rng):
    """steps_per_call stacks [k, B, nbytes]; unpack must keep leading axes."""
    import jax.numpy as jnp

    from apv_tpu.data.preprocess import pack_bits, unpack_bits

    imgs = (rng.random((6, 28, 28, 1)) < 0.5).astype(np.uint8)
    packed = pack_bits(imgs).reshape(2, 3, 98)
    un = np.asarray(unpack_bits(jnp.asarray(packed), (28, 28, 1)))
    assert un.shape == (2, 3, 28, 28, 1)
    np.testing.assert_array_equal(un.reshape(6, 28, 28, 1),
                                  imgs.astype(np.float32))


def test_load_train_arrays_packs_binarized():
    from conftest import tiny_config
    from apv_tpu.training.loop import load_train_arrays

    cfg = tiny_config("mnist_vae")     # data.bit_pack defaults on
    train, valid = load_train_arrays(cfg)
    assert "image_packed" in train and train["image_packed"].dtype == np.uint8
    assert train["image_packed"].shape[1] == 98
    cfg_off = tiny_config("mnist_vae", **{"data.bit_pack": False})
    train_off, _ = load_train_arrays(cfg_off)
    assert "image" in train_off
    # packed payload is exactly the packed unpacked payload
    from apv_tpu.data.preprocess import pack_bits
    np.testing.assert_array_equal(
        train["image_packed"], pack_bits(train_off["image"]))
    # CIFAR (no binarize): untouched
    cfg_c = tiny_config("cifar_advprior_resnet")
    train_c, _ = load_train_arrays(cfg_c)
    assert "image" in train_c and train_c["image"].dtype == np.uint8


def test_mnist_fashion_do_not_alias_at_root(tmp_path, rng):
    """MNIST and FashionMNIST ship IDENTICAL idx filenames: a complete
    pair at the bare data-dir root must raise loudly for BOTH loaders (a
    root fallback would resolve both datasets to the same files and score
    the OOD pair in-dist vs in-dist; a silent synthetic fallback would
    report results the user believes are real)."""
    import struct

    import pytest

    def write_idx(path, arr):
        arr = np.asarray(arr, np.uint8)
        with open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, arr.ndim))
            for d in arr.shape:
                f.write(struct.pack(">I", d))
            f.write(arr.tobytes())

    imgs = (rng.random((4, 28, 28)) * 255).astype(np.uint8)
    write_idx(tmp_path / "train-images-idx3-ubyte", imgs)
    write_idx(tmp_path / "train-labels-idx1-ubyte",
              np.zeros(4, np.uint8))
    for name, subdir in (("mnist", "mnist"),
                         ("fashion_mnist", "fashion_mnist")):
        with pytest.raises(FileNotFoundError, match=subdir):
            load_dataset(name, "train", data_dir=tmp_path)


def test_partial_real_dataset_raises(tmp_path, rng):
    """Half a real dataset (images without labels) is a broken mount and
    must raise — not silently fall back to synthetic data the user
    believes is real."""
    import struct

    import pytest

    d = tmp_path / "mnist"
    d.mkdir()
    imgs = (rng.random((4, 28, 28)) * 255).astype(np.uint8)
    with open(d / "train-images-idx3-ubyte", "wb") as fh:
        fh.write(struct.pack(">HBB", 0, 8, 3))
        for dim in imgs.shape:
            fh.write(struct.pack(">I", dim))
        fh.write(imgs.tobytes())
    with pytest.raises(FileNotFoundError, match="labels"):
        load_dataset("mnist", "train", data_dir=tmp_path)
