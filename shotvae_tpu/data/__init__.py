"""Data layer: raw dataset parsers, SSL splits, on-device pipeline."""

from shotvae_tpu.data.datasets import (
    ArrayDataset,
    load_cifar10,
    load_cifar100,
    load_dataset,
    load_mnist,
    load_svhn,
    synthetic_dataset,
)
from shotvae_tpu.data.pipeline import (
    DeviceDataset,
    augment_batch,
    epoch_batches,
    infinite_batches,
)
from shotvae_tpu.data.splits import ssl_split, sl_split

__all__ = [
    "ArrayDataset",
    "DeviceDataset",
    "augment_batch",
    "epoch_batches",
    "infinite_batches",
    "load_cifar10",
    "load_cifar100",
    "load_dataset",
    "load_mnist",
    "load_svhn",
    "sl_split",
    "ssl_split",
    "synthetic_dataset",
]
