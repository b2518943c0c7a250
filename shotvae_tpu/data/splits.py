"""Seeded per-class valid/labeled/unlabeled SSL index splits.

Functional equivalent of the reference samplers
(/root/reference/lib/dataloader.py:73-193): for each class, shuffle its
indices, take the first ``valid_per_class`` as validation, the next
``annotated_per_class`` as labeled, and — deliberately, per the reference's
comment — let the unlabeled pool be *everything except valid* (it includes
the labeled samples, dataloader.py:131-135).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SSLSplit(NamedTuple):
    valid: np.ndarray
    labeled: np.ndarray
    unlabeled: np.ndarray


def ssl_split(labels: np.ndarray, valid_per_class: int, annotated_per_class: int,
              num_classes: int, *, seed: int = 1) -> SSLSplit:
    """Parity: lib/dataloader.py:115-193 (all three get_*_ssl_sampler variants
    are this same logic).

    Standard splits (SURVEY.md §2.5): CIFAR-10 (500 valid/class,
    4000*ratio labels total), CIFAR-100 (50/class, 400*ratio/class),
    SVHN (100/class valid, 100/class labeled).
    """
    rng = np.random.default_rng(seed)
    valid, labeled, unlabeled = [], [], []
    for c in range(num_classes):
        loc = np.flatnonzero(labels == c)
        loc = rng.permutation(loc)
        valid.extend(loc[:valid_per_class].tolist())
        labeled.extend(loc[valid_per_class:valid_per_class + annotated_per_class].tolist())
        # unlabeled includes the labeled part (reference comment & code)
        unlabeled.extend(loc[valid_per_class:].tolist())
    return SSLSplit(np.asarray(valid, np.int64), np.asarray(labeled, np.int64),
                    np.asarray(unlabeled, np.int64))


class SLSplit(NamedTuple):
    valid: np.ndarray
    train: np.ndarray


def sl_split(labels: np.ndarray, valid_per_class: int, num_classes: int, *,
             seed: int = 1) -> SLSplit:
    """Two-way per-class split. Parity: lib/dataloader.py:73-112."""
    rng = np.random.default_rng(seed)
    valid, train = [], []
    for c in range(num_classes):
        loc = rng.permutation(np.flatnonzero(labels == c))
        valid.extend(loc[:valid_per_class].tolist())
        train.extend(loc[valid_per_class:].tolist())
    return SLSplit(np.asarray(valid, np.int64), np.asarray(train, np.int64))


def labeled_subset_per_class(labels: np.ndarray, size_labeled_data: int,
                             num_classes: int = 10, *, seed: int = 1) -> np.ndarray:
    """One-stage loader's labeled pick: first n/K shuffled indices per class.

    Parity: lib/dataloader_one_stage_vae.py:59-68 (mask construction); the
    unlabeled pool there is the *entire* train set.
    """
    rng = np.random.default_rng(seed)
    indices = rng.permutation(len(labels))
    shuffled_labels = labels[indices]
    mask = np.zeros(len(labels), dtype=bool)
    per_class = int(size_labeled_data / num_classes)
    for c in range(num_classes):
        mask[indices[shuffled_labels == c][:per_class]] = True
    return np.flatnonzero(mask).astype(np.int64)
