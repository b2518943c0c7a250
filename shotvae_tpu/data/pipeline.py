"""On-device data pipeline: resident uint8 datasets, jitted augmentation.

TPU-native replacement for the reference's torchvision transform + DataLoader
worker stack (lib/dataloader.py:6-70): the *whole dataset* lives in HBM as
uint8 (CIFAR-10 train = 150 MB), per-step batches are gathered on device from
host-supplied index arrays, and reflect-pad / random-crop / horizontal-flip
run inside the jitted train step keyed by ``jax.random``. Only int32 index
arrays ever cross PCIe per step — essential here, where the host has a single
CPU core.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from shotvae_tpu.data.datasets import ArrayDataset


class DeviceDataset:
    """uint8 images + int32 labels resident on device (or sharded over a mesh)."""

    def __init__(self, dataset: ArrayDataset, *, device=None, sharding=None):
        put = lambda x: (
            jax.device_put(x, sharding) if sharding is not None
            else jax.device_put(x, device)
        )
        self.images = put(jnp.asarray(dataset.images))
        self.labels = put(jnp.asarray(dataset.labels))

    def __len__(self):
        return self.images.shape[0]

    def gather(self, indices):
        """Gather a batch by indices; returns (uint8 images, int32 labels).

        Call inside jit; conversion to float happens in ``to_float`` /
        ``augment_batch`` so the gather itself moves 4x fewer bytes.
        """
        return (jnp.take(self.images, indices, axis=0),
                jnp.take(self.labels, indices, axis=0))


def to_float(images, *, normalize: bool = False):
    """uint8 -> float32 in [0,1] (ToTensor parity) or [-1,1] (Normalize(0.5))."""
    x = images.astype(jnp.float32) / 255.0
    if normalize:
        x = x * 2.0 - 1.0
    return x


def augment_batch(key, images, *, pad: int = 4, crop: int = 32,
                  flip: bool = True):
    """Reflect-pad + per-sample random crop + per-sample horizontal flip.

    Parity: the train transforms of lib/dataloader.py:6-70
    (Pad(4, reflect) -> RandomCrop(32) -> RandomHorizontalFlip). Fully
    vectorised and jit-compatible; MNIST's 28x28 inputs come out 32x32 like
    the reference's pad-then-crop does.

    The per-sample crop SELECTS among the (2*pad+1) static row shifts and
    then the static col shifts with ``jnp.where`` chains, instead of a
    vmapped ``dynamic_slice``: batch-varying slice starts lower to a
    per-sample gather HLO, which measured ~22 ms/stream at B=768 on v5e —
    40%+ of the whole SHOT train step — while the select chains fuse into
    one elementwise pass (~1.5 ms/stream, docs/PERF.md round 2). Bit-exact
    vs the slice formulation on every backend (pure data movement — unlike
    a one-hot-matmul crop, which TPU matmul precision silently rounds
    through bfloat16).
    """
    b, h, w, c = images.shape
    key_y, key_x, key_f = jax.random.split(key, 3)
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")
    n_off_y = h + 2 * pad - crop + 1
    n_off_x = w + 2 * pad - crop + 1
    off_y = jax.random.randint(key_y, (b,), 0, n_off_y)
    off_x = jax.random.randint(key_x, (b,), 0, n_off_x)

    rows = padded[:, 0:crop]
    for k in range(1, n_off_y):
        rows = jnp.where((off_y == k)[:, None, None, None],
                         padded[:, k:k + crop], rows)
    out = rows[:, :, 0:crop]
    for k in range(1, n_off_x):
        out = jnp.where((off_x == k)[:, None, None, None],
                        rows[:, :, k:k + crop], out)
    if flip:
        do_flip = jax.random.bernoulli(key_f, 0.5, (b, 1, 1, 1))
        out = jnp.where(do_flip, out[:, :, ::-1, :], out)
    return out


def resize_batch(images, size: int = 32):
    """Bilinear resize (transforms.Resize parity for the one-stage loaders)."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, size, size, c), method="bilinear")


def epoch_batches(rng: np.random.Generator, indices: np.ndarray,
                  batch_size: int, *, drop_last: bool = True,
                  shuffle: bool = True) -> Iterator[np.ndarray]:
    """One shuffled epoch of index batches.

    TPU deviation (documented, SURVEY.md §7 risks): static shapes require
    drop_last on the unlabeled stream; the reference instead emits a ragged
    tail batch.
    """
    order = rng.permutation(indices) if shuffle else np.asarray(indices)
    limit = (len(order) // batch_size) * batch_size if drop_last else len(order)
    for start in range(0, limit, batch_size):
        yield order[start:start + batch_size]


def infinite_batches(rng: np.random.Generator, indices: np.ndarray,
                     batch_size: int) -> Iterator[np.ndarray]:
    """Endless reshuffled stream — the ``cycle(labeled_loader)`` equivalent
    (main_shot_vae.py:280). Wraps around with a reshuffle instead of
    repeating the epoch order, and pads by wrap-around so every batch is
    full-size (static shapes).
    """
    if len(indices) == 0:
        raise ValueError("infinite_batches needs a non-empty index set")
    pool = rng.permutation(indices)
    pos = 0
    while True:
        if pos + batch_size <= len(pool):
            yield pool[pos:pos + batch_size]
            pos += batch_size
        else:
            # wrap around with reshuffles; loops when the pool is smaller
            # than the batch (tiny labeled sets, e.g. --annotated-ratio 0.01)
            parts = [pool[pos:]]
            need = batch_size - len(parts[0])
            while need > 0:
                pool = rng.permutation(indices)
                take = min(need, len(pool))
                parts.append(pool[:take])
                need -= take
            pos = 0 if len(parts[-1]) == len(pool) else len(parts[-1])
            yield np.concatenate(parts)


def num_batches(n: int, batch_size: int, *, drop_last: bool = True) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
