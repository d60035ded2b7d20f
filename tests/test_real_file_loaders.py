"""Real-file dataset readers (SURVEY.md §2.1): write standard-format files
into a tmp data dir and check the parsers — the paths that run when actual
MNIST/CIFAR/SVHN distributions are mounted."""

import gzip
import pickle
import struct

import numpy as np
import pytest

from apv_tpu.data import load_dataset


def _write_idx_images(path, images):
    n, h, w = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, n, h, w))
        f.write(images.tobytes())


def _write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path, rng):
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = rng.integers(0, 256, size=(50, 28, 28)).astype(np.uint8)
    labs = rng.integers(0, 10, size=50).astype(np.uint8)
    _write_idx_images(d / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(d / "train-labels-idx1-ubyte", labs)
    out_i, out_l = load_dataset("mnist", "train", data_dir=tmp_path,
                                allow_synthetic=False)
    np.testing.assert_array_equal(out_i[..., 0], imgs)
    np.testing.assert_array_equal(out_l, labs.astype(np.int32))


def test_mnist_idx_gzipped(tmp_path, rng):
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = rng.integers(0, 256, size=(10, 28, 28)).astype(np.uint8)
    labs = rng.integers(0, 10, size=10).astype(np.uint8)
    raw = struct.pack(">IIII", 0x00000803, 10, 28, 28) + imgs.tobytes()
    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(raw)
    rawl = struct.pack(">II", 0x00000801, 10) + labs.tobytes()
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(rawl)
    out_i, out_l = load_dataset("mnist", "test", data_dir=tmp_path,
                                allow_synthetic=False)
    np.testing.assert_array_equal(out_i[..., 0], imgs)
    np.testing.assert_array_equal(out_l, labs.astype(np.int32))


def test_cifar10_pickle_batches(tmp_path, rng):
    base = tmp_path / "cifar10" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    all_imgs, all_labs = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(20, 3072)).astype(np.uint8)
        labels = rng.integers(0, 10, size=20).tolist()
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_imgs.append(data)
        all_labs.extend(labels)
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": all_imgs[0], b"labels": all_labs[:20]}, f)

    out_i, out_l = load_dataset("cifar10", "train", data_dir=tmp_path,
                                allow_synthetic=False)
    assert out_i.shape == (100, 32, 32, 3)
    want = np.concatenate(all_imgs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(out_i, want)
    np.testing.assert_array_equal(out_l, np.asarray(all_labs, np.int32))

    out_i, _ = load_dataset("cifar10", "test", data_dir=tmp_path,
                            allow_synthetic=False)
    assert out_i.shape == (20, 32, 32, 3)


def test_cifar10_distribution_tarball(tmp_path, rng):
    """The unextracted ``cifar-10-python.tar.gz`` (what the download page
    serves, with the standard ``cifar-10-batches-py/`` member prefix)
    loads without extraction; a truncated archive fails loud."""
    import io
    import tarfile

    all_imgs, all_labs = [], []
    buf_members = []
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(20, 3072)).astype(np.uint8)
        labels = rng.integers(0, 10, size=20).tolist()
        buf_members.append((f"cifar-10-batches-py/data_batch_{i}",
                            pickle.dumps({b"data": data,
                                          b"labels": labels})))
        all_imgs.append(data)
        all_labs.extend(labels)
    buf_members.append(("cifar-10-batches-py/test_batch",
                        pickle.dumps({b"data": all_imgs[0],
                                      b"labels": all_labs[:20]})))
    with tarfile.open(tmp_path / "cifar-10-python.tar.gz", "w:gz") as tf:
        for name, payload in buf_members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    out_i, out_l = load_dataset("cifar10", "train", data_dir=tmp_path,
                                allow_synthetic=False)
    want = np.concatenate(all_imgs).reshape(-1, 3, 32, 32).transpose(
        0, 2, 3, 1)
    np.testing.assert_array_equal(out_i, want)
    np.testing.assert_array_equal(out_l, np.asarray(all_labs, np.int32))

    # missing members = corrupt archive: loud error, not synthetic data
    with tarfile.open(tmp_path / "cifar-10-python.tar.gz", "w:gz") as tf:
        name, payload = buf_members[0]
        info = tarfile.TarInfo(name)
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    with pytest.raises(FileNotFoundError, match="missing members"):
        load_dataset("cifar10", "train", data_dir=tmp_path,
                     allow_synthetic=False)


def test_svhn_mat(tmp_path, rng):
    from scipy.io import savemat
    d = tmp_path / "svhn"
    d.mkdir()
    x = rng.integers(0, 256, size=(32, 32, 3, 15)).astype(np.uint8)
    y = rng.integers(1, 11, size=(15, 1)).astype(np.uint8)   # SVHN: 10 = '0'
    savemat(str(d / "test_32x32.mat"), {"X": x, "y": y})
    out_i, out_l = load_dataset("svhn", "test", data_dir=tmp_path,
                                allow_synthetic=False)
    assert out_i.shape == (15, 32, 32, 3)
    np.testing.assert_array_equal(out_i, x.transpose(3, 0, 1, 2))
    np.testing.assert_array_equal(out_l, (y.reshape(-1) % 10).astype(np.int32))


def test_wrong_shape_rejected(tmp_path, rng):
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = rng.integers(0, 256, size=(5, 14, 14)).astype(np.uint8)
    labs = rng.integers(0, 10, size=5).astype(np.uint8)
    _write_idx_images(d / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(d / "train-labels-idx1-ubyte", labs)
    with pytest.raises(ValueError, match="shape"):
        load_dataset("mnist", "train", data_dir=tmp_path,
                     allow_synthetic=False)
