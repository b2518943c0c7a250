"""Tests for dataset parsers (synthetic), SSL split invariants, pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from shotvae_tpu.data import (
    DeviceDataset,
    augment_batch,
    epoch_batches,
    infinite_batches,
    ssl_split,
    synthetic_dataset,
)
from shotvae_tpu.data.pipeline import num_batches, resize_batch, to_float
from shotvae_tpu.data.splits import labeled_subset_per_class, sl_split


class TestSyntheticDataset:
    def test_shapes_and_determinism(self):
        a = synthetic_dataset(128, (32, 32, 3), 10, seed=5)
        b = synthetic_dataset(128, (32, 32, 3), 10, seed=5)
        assert a.images.shape == (128, 32, 32, 3) and a.images.dtype == np.uint8
        assert a.labels.shape == (128,) and a.labels.dtype == np.int32
        np.testing.assert_array_equal(a.images, b.images)

    def test_classes_learnable(self):
        d = synthetic_dataset(512, (8, 8, 1), 4, seed=0)
        # class-conditional means must differ (structure exists to learn)
        means = [d.images[d.labels == c].mean() for c in range(4)]
        assert np.std(means) > 1.0


class TestSSLSplit:
    def test_reference_invariants(self):
        labels = np.repeat(np.arange(10), 100)  # 100 per class
        s = ssl_split(labels, valid_per_class=20, annotated_per_class=10,
                      num_classes=10, seed=1)
        assert len(s.valid) == 200
        assert len(s.labeled) == 100
        assert len(s.unlabeled) == 800  # everything except valid
        # labeled subset of unlabeled (reference semantics, dataloader.py:135)
        assert set(s.labeled) <= set(s.unlabeled)
        # valid disjoint from unlabeled
        assert not (set(s.valid) & set(s.unlabeled))
        # class balance in labeled
        counts = np.bincount(labels[s.labeled], minlength=10)
        np.testing.assert_array_equal(counts, 10)

    def test_seed_determinism(self):
        labels = np.repeat(np.arange(5), 40)
        a = ssl_split(labels, 5, 5, 5, seed=7)
        b = ssl_split(labels, 5, 5, 5, seed=7)
        c = ssl_split(labels, 5, 5, 5, seed=8)
        np.testing.assert_array_equal(a.labeled, b.labeled)
        assert not np.array_equal(a.labeled, c.labeled)

    def test_sl_split(self):
        labels = np.repeat(np.arange(4), 25)
        s = sl_split(labels, 5, 4, seed=1)
        assert len(s.valid) == 20 and len(s.train) == 80
        assert not (set(s.valid) & set(s.train))

    def test_one_stage_labeled_subset(self):
        labels = np.repeat(np.arange(10), 50)
        idx = labeled_subset_per_class(labels, size_labeled_data=100,
                                       num_classes=10, seed=1)
        assert len(idx) == 100
        np.testing.assert_array_equal(np.bincount(labels[idx], minlength=10), 10)


class TestPipeline:
    def test_to_float_ranges(self):
        x = jnp.array([[0, 255]], dtype=jnp.uint8)
        np.testing.assert_allclose(np.asarray(to_float(x)), [[0.0, 1.0]],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(to_float(x, normalize=True)),
                                   [[-1.0, 1.0]], atol=1e-6)

    def test_augment_preserves_shape_and_content(self):
        key = jax.random.key(0)
        imgs = jnp.arange(2 * 32 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 32, 3)
        out = augment_batch(key, imgs)
        assert out.shape == (2, 32, 32, 3)
        # values come from the (reflected) original value set
        assert set(np.unique(out)).issubset(set(np.unique(imgs)))

    def test_augment_mnist_28_to_32(self):
        key = jax.random.key(1)
        imgs = jnp.zeros((4, 28, 28, 1))
        out = augment_batch(key, imgs, pad=4, crop=32)
        assert out.shape == (4, 32, 32, 1)

    def test_augment_randomises_across_keys(self):
        imgs = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3))
        a = augment_batch(jax.random.key(3), imgs)
        b = augment_batch(jax.random.key(4), imgs)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_augment_flip_off_no_flip(self):
        imgs = jax.random.uniform(jax.random.key(5), (2, 32, 32, 3))
        out = augment_batch(jax.random.key(6), imgs, pad=0, crop=32, flip=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))

    def test_resize(self):
        imgs = jnp.ones((2, 28, 28, 1))
        assert resize_batch(imgs, 32).shape == (2, 32, 32, 1)

    def test_device_dataset_gather(self):
        d = DeviceDataset(synthetic_dataset(64, (8, 8, 1), 4))
        imgs, labels = jax.jit(d.gather)(jnp.array([0, 5, 9]))
        assert imgs.shape == (3, 8, 8, 1) and imgs.dtype == jnp.uint8
        assert labels.shape == (3,)

    def test_epoch_batches_drop_last(self):
        rng = np.random.default_rng(0)
        batches = list(epoch_batches(rng, np.arange(10), 3))
        assert len(batches) == 3 and all(len(b) == 3 for b in batches)
        assert num_batches(10, 3) == 3
        assert num_batches(10, 3, drop_last=False) == 4

    def test_infinite_batches_full_coverage(self):
        rng = np.random.default_rng(0)
        it = infinite_batches(rng, np.arange(7), 3)
        seen = np.concatenate([next(it) for _ in range(10)])
        assert len(seen) == 30 and set(seen) == set(range(7))
        # every batch full-size
        assert all(len(next(it)) == 3 for _ in range(5))

    def test_infinite_batches_pool_smaller_than_batch(self):
        # tiny labeled pools (e.g. --annotated-ratio 0.01) must still yield
        # full-size batches by wrapping multiple reshuffles
        rng = np.random.default_rng(1)
        it = infinite_batches(rng, np.arange(5), 12)
        for _ in range(8):
            b = next(it)
            assert len(b) == 12
            assert set(b) <= set(range(5))
        # all elements keep appearing
        seen = np.concatenate([next(it) for _ in range(5)])
        assert set(seen) == set(range(5))

    def test_infinite_batches_pool_equals_batch(self):
        rng = np.random.default_rng(2)
        it = infinite_batches(rng, np.arange(4), 4)
        for _ in range(6):
            b = next(it)
            assert sorted(b) == [0, 1, 2, 3]


class TestAugmentCropEquivalence:
    """The fused select-chain crop must stay bit-exact vs the slice form.

    augment_batch implements the per-sample random crop as jnp.where
    chains over the static shifts (22 ms -> 1.5 ms per stream at B=768 on
    v5e, docs/PERF.md round 2 — and, unlike a one-hot-matmul crop, exact
    under TPU matmul precision); this pins its output to the reference
    dynamic_slice semantics with identical keys.
    """

    @staticmethod
    def _augment_slice(key, images, pad=4, crop=32, flip=True):
        b, h, w, c = images.shape
        key_y, key_x, key_f = jax.random.split(key, 3)
        padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                         mode="reflect")
        off_y = jax.random.randint(key_y, (b,), 0, h + 2 * pad - crop + 1)
        off_x = jax.random.randint(key_x, (b,), 0, w + 2 * pad - crop + 1)
        out = jax.vmap(
            lambda img, oy, ox: jax.lax.dynamic_slice(
                img, (oy, ox, 0), (crop, crop, c)))(padded, off_y, off_x)
        if flip:
            do_flip = jax.random.bernoulli(key_f, 0.5, (b, 1, 1, 1))
            out = jnp.where(do_flip, out[:, :, ::-1, :], out)
        return out

    def test_bit_exact_vs_dynamic_slice(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.integers(0, 256, (16, 32, 32, 3)).astype(np.float32) / 255.0)
        key = jax.random.key(7)
        assert bool(jnp.all(augment_batch(key, x)
                            == self._augment_slice(key, x)))

    def test_bit_exact_mnist_28_to_32(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.integers(0, 256, (8, 28, 28, 1)).astype(np.float32) / 255.0)
        key = jax.random.key(3)
        got = augment_batch(key, x)
        assert got.shape == (8, 32, 32, 1)
        assert bool(jnp.all(got == self._augment_slice(key, x)))


class TestAugmentStaysGatherFree:
    def test_no_gather_in_lowered_hlo(self):
        """The crop must never regress to a per-sample gather.

        vmap(dynamic_slice) with batch-varying starts lowers to a gather
        HLO that cost ~22 ms/stream on v5e (43% of the SHOT step,
        docs/PERF.md round 2); the select-chain formulation lowers to pure
        selects. Pin that property at the HLO level.
        """
        import re

        x = jnp.zeros((16, 32, 32, 3), jnp.float32)
        txt = (jax.jit(augment_batch)
               .lower(jax.random.key(0), x)
               .compiler_ir(dialect="hlo").as_hlo_text())
        gathers = [l for l in txt.splitlines() if re.search(r"\bgather\(", l)]
        assert not gathers, f"augment_batch lowers to gather: {gathers[:2]}"
