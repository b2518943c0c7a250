"""Round-trip tests for the raw dataset parsers (idx / cifar pickle / mat)."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from shotvae_tpu.data.datasets import (
    load_cifar10,
    load_cifar100,
    load_dataset,
    load_mnist,
    load_svhn,
)


def _write_mnist(root, prefix, images, labels):
    os.makedirs(root, exist_ok=True)
    n, h, w, _ = images.shape
    with open(os.path.join(root, f"{prefix}-images-idx3-ubyte"), "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w))
        f.write(images[..., 0].tobytes())
    with open(os.path.join(root, f"{prefix}-labels-idx1-ubyte"), "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.astype(np.uint8).tobytes())


class TestMnistParser:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (5, 28, 28, 1)).astype(np.uint8)
        labels = np.array([0, 1, 2, 3, 9], np.uint8)
        _write_mnist(str(tmp_path), "train", imgs, labels)
        ds = load_mnist(str(tmp_path), train=True)
        np.testing.assert_array_equal(ds.images, imgs)
        np.testing.assert_array_equal(ds.labels, labels)
        assert ds.labels.dtype == np.int32

    def test_gzip_fallback(self, tmp_path):
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, (3, 28, 28, 1)).astype(np.uint8)
        labels = np.array([5, 6, 7], np.uint8)
        root = str(tmp_path)
        os.makedirs(root, exist_ok=True)
        with gzip.open(os.path.join(root, "t10k-images-idx3-ubyte.gz"),
                       "wb") as f:
            f.write(struct.pack(">IIII", 2051, 3, 28, 28))
            f.write(imgs[..., 0].tobytes())
        with gzip.open(os.path.join(root, "t10k-labels-idx1-ubyte.gz"),
                       "wb") as f:
            f.write(struct.pack(">II", 2049, 3))
            f.write(labels.tobytes())
        ds = load_mnist(root, train=False)
        np.testing.assert_array_equal(ds.images, imgs)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_mnist(str(tmp_path), train=True)


class TestCifarParsers:
    def _write_cifar10(self, root, n_per_batch=4):
        base = os.path.join(root, "cifar-10-batches-py")
        os.makedirs(base, exist_ok=True)
        rng = np.random.default_rng(2)
        all_imgs, all_labels = [], []
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            data = rng.integers(0, 256, (n_per_batch, 3072)).astype(np.uint8)
            labels = rng.integers(0, 10, n_per_batch).tolist()
            with open(os.path.join(base, name), "wb") as f:
                pickle.dump({b"data": data, b"labels": labels}, f)
            if name.startswith("data"):
                all_imgs.append(data)
                all_labels.extend(labels)
        return np.concatenate(all_imgs), np.asarray(all_labels)

    def test_cifar10_round_trip(self, tmp_path):
        raw, labels = self._write_cifar10(str(tmp_path))
        ds = load_cifar10(str(tmp_path), train=True)
        assert ds.images.shape == (20, 32, 32, 3)
        want = raw.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(ds.images, want)
        np.testing.assert_array_equal(ds.labels, labels)

    def test_cifar100_round_trip(self, tmp_path):
        base = os.path.join(str(tmp_path), "cifar-100-python")
        os.makedirs(base, exist_ok=True)
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, (6, 3072)).astype(np.uint8)
        fine = rng.integers(0, 100, 6).tolist()
        with open(os.path.join(base, "train"), "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": fine}, f)
        ds = load_cifar100(str(tmp_path), train=True)
        assert ds.images.shape == (6, 32, 32, 3)
        np.testing.assert_array_equal(ds.labels, fine)


class TestSvhnParser:
    def test_round_trip_and_label_remap(self, tmp_path):
        import scipy.io

        rng = np.random.default_rng(4)
        x = rng.integers(0, 256, (32, 32, 3, 5)).astype(np.uint8)  # HWCN
        y = np.array([[1], [2], [10], [10], [5]], np.uint8)
        scipy.io.savemat(os.path.join(str(tmp_path), "train_32x32.mat"),
                         {"X": x, "y": y})
        ds = load_svhn(str(tmp_path), train=True)
        assert ds.images.shape == (5, 32, 32, 3)
        np.testing.assert_array_equal(ds.images[0], x[..., 0])
        # torchvision parity: label 10 -> 0
        np.testing.assert_array_equal(ds.labels, [1, 2, 0, 0, 5])
        ds_raw = load_svhn(str(tmp_path), train=True, remap_label_10=False)
        np.testing.assert_array_equal(ds_raw.labels, [1, 2, 10, 10, 5])


class TestLoadDataset:
    def test_synthetic_fallback_and_num_classes(self, tmp_path):
        ds, k = load_dataset("Cifar100", str(tmp_path), train=True,
                             synthetic_fallback=True, synthetic_size=300)
        assert k == 100 and len(ds.labels) == 300
        with pytest.raises(FileNotFoundError):
            load_dataset("Cifar10", str(tmp_path), train=True)
