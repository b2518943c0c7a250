"""Tests for meters, distance metrics, TB grid, checkpoint manager."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shotvae_tpu.io.tb import make_image_grid
from shotvae_tpu.utils import AverageMeter, MetricAccumulator
from shotvae_tpu.utils.dist_metrics import (
    pairwise_cosine,
    pairwise_euclidean_sq,
    pairwise_gaussian_wasserstein2,
)


class TestAverageMeter:
    def test_reference_semantics(self):
        m = AverageMeter()
        m.update(2.0, n=4)
        m.update(4.0, n=4)
        assert m.val == 4.0
        assert m.sum == 24.0
        assert m.count == 8
        assert m.avg == 3.0


class TestMetricAccumulator:
    def test_sum_and_rate_semantics(self):
        acc = MetricAccumulator()
        acc.update({"loss_sum": jnp.float32(10.0), "top1_count": jnp.float32(3),
                    "count": jnp.float32(5)})
        acc.update({"loss_sum": jnp.float32(20.0), "top1_count": jnp.float32(4),
                    "count": jnp.float32(5)})
        avg = acc.averages()
        assert avg["loss_avg"] == pytest.approx(3.0)
        assert avg["top1_rate"] == pytest.approx(0.7)
        assert avg["count"] == 10


class TestScoreLabelDict:
    """lib/utils/utils.py:8-21 parity: max-pool key-aligned score/label dicts."""

    def test_max_pooled_in_insertion_order(self):
        from shotvae_tpu.utils import get_score_label_array_from_dict

        score = {"a": [0.1, 0.9, 0.5], "b": [0.2], "c": [0.4, 0.3]}
        label = {"a": [0, 1], "b": [0], "c": [1, 1]}
        s, l = get_score_label_array_from_dict(score, label)
        np.testing.assert_allclose(s, [0.9, 0.2, 0.4])
        np.testing.assert_allclose(l, [1, 0, 1])

    def test_length_mismatch_raises(self):
        from shotvae_tpu.utils import get_score_label_array_from_dict

        with pytest.raises(AssertionError):
            get_score_label_array_from_dict({"a": [1.0]}, {})


class TestDistMetrics:
    def test_euclidean(self):
        a = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        d = np.asarray(pairwise_euclidean_sq(a, a))
        np.testing.assert_allclose(d, [[0, 2], [2, 0]], atol=1e-5)

    def test_cosine(self):
        a = jnp.array([[1.0, 0.0], [0.0, 2.0]])
        c = np.asarray(pairwise_cosine(a, a))
        np.testing.assert_allclose(c, [[1, 0], [0, 1]], atol=1e-5)

    def test_wasserstein_identical_zero(self):
        mean = jnp.array([[1.0, 2.0]])
        ls = jnp.array([[0.1, -0.2]])
        w = np.asarray(pairwise_gaussian_wasserstein2(mean, ls, mean, ls))
        np.testing.assert_allclose(w, [[0.0]], atol=1e-4)


class TestImageGrid:
    def test_2x2_grid(self):
        imgs = np.ones((4, 8, 8, 3), np.float32)
        grid = make_image_grid(imgs, nrow=2)
        assert grid.shape == (2 * 10 + 2, 2 * 10 + 2, 3)
        # padding rows are zero
        assert grid[0].sum() == 0
        assert grid[2, 2].sum() == 3


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        from shotvae_tpu.io import CheckpointManager
        from shotvae_tpu.train.state import TrainState, sgd_torch

        params = {"w": jnp.arange(4.0)}
        state = TrainState.create(apply_fn=lambda: None, params=params,
                                  batch_stats={"m": jnp.zeros(2)},
                                  tx=sgd_torch(0.1))
        ckpt = CheckpointManager(str(tmp_path), "Cifar10", 1)
        ckpt.save(state, epoch=5, config={"lr": 0.1})

        # mutate, then restore
        state2 = state.replace(params={"w": jnp.zeros(4)})
        restored, epoch, config = ckpt.restore(state2)
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(4.0))
        assert epoch == 5
        assert config["lr"] == 0.1

    def test_prewarm_leaves_no_residue(self, tmp_path):
        """The constructor's daemon-thread tensorstore prewarm (VERDICT r4
        #5) must not race the first real save (save joins it) and must not
        leave its scratch directory behind."""
        from shotvae_tpu.io import CheckpointManager
        from shotvae_tpu.train.state import TrainState, sgd_torch

        state = TrainState.create(apply_fn=lambda: None,
                                  params={"w": jnp.arange(3.0)},
                                  batch_stats={}, tx=sgd_torch(0.1))
        ckpt = CheckpointManager(str(tmp_path), "Cifar10", 3, prewarm=True)
        ckpt.save(state, epoch=1, config={})
        ckpt.wait_until_finished()
        assert ckpt._prewarm_thread is None  # writer joined it before writing
        assert ckpt._write_thread is None
        assert not os.path.exists(os.path.join(ckpt.folder, ".prewarm"))
        restored, epoch, _ = ckpt.restore(state)
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(3.0))
        assert epoch == 1

    def test_async_save_lands_after_wait(self, tmp_path):
        """Async save (default) returns after the host snapshot; the
        tensorstore write + meta + pointer land once wait_until_finished
        (or the next save/restore) joins the writer. Sync mode
        (async_save=False) must behave identically on-disk."""
        from shotvae_tpu.io import CheckpointManager
        from shotvae_tpu.train.state import TrainState, sgd_torch

        state = TrainState.create(apply_fn=lambda: None,
                                  params={"w": jnp.arange(5.0)},
                                  batch_stats={}, tx=sgd_torch(0.1))
        ckpt = CheckpointManager(str(tmp_path), "Cifar10", 7, prewarm=False)
        p = ckpt.save(state, epoch=2, config={"x": 1})
        ckpt.wait_until_finished()
        assert os.path.isdir(p) and os.path.isfile(p + ".meta.json")
        pointer = os.path.join(ckpt.folder, "checkpoint.current")
        assert open(pointer).read().strip() == p
        # second save alternates the slot and the restore joins the writer
        # implicitly (no explicit wait)
        state2 = state.replace(params={"w": jnp.arange(5.0) * 2})
        p2 = ckpt.save(state2, epoch=3, config={})
        assert p2 != p
        restored, epoch, _ = ckpt.restore(state)
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(5.0) * 2)
        assert epoch == 3

        sync = CheckpointManager(str(tmp_path), "Cifar10", 8, prewarm=False,
                                 async_save=False)
        ps = sync.save(state, epoch=4, config={})
        # no wait needed: everything landed before save returned
        assert os.path.isdir(ps) and os.path.isfile(ps + ".meta.json")

    def test_missing_raises_filenotfound(self, tmp_path):
        from shotvae_tpu.io import CheckpointManager
        from shotvae_tpu.train.state import TrainState, sgd_torch

        state = TrainState.create(apply_fn=lambda: None,
                                  params={"w": jnp.zeros(1)},
                                  batch_stats={}, tx=sgd_torch(0.1))
        ckpt = CheckpointManager(str(tmp_path), "Cifar10", 2)
        with pytest.raises(FileNotFoundError):
            ckpt.restore(state, path=str(tmp_path / "nope"))
