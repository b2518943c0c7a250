"""Tests for the classic-mixup helpers (reference inventory parity)."""

import numpy as np

import jax
import jax.numpy as jnp

from shotvae_tpu.ops import mixup

KEY = jax.random.key(0)


class TestMixupData:
    def test_convex_combination(self):
        img = jnp.arange(8.0)[:, None]
        label = jnp.arange(8)
        mixed, la, lb, lam = mixup.mixup_data(KEY, img, label, alpha=1.0)
        lam_f = float(lam)
        assert 0.0 <= lam_f <= 1.0
        # recover the permutation and verify the mix
        partner = (np.asarray(mixed)[:, 0] - lam_f * np.arange(8)) / (1 - lam_f)
        np.testing.assert_allclose(partner, np.asarray(lb), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(la), np.arange(8))

    def test_alpha_zero_identity(self):
        img = jnp.ones((4, 2))
        mixed, la, lb, lam = mixup.mixup_data(KEY, img, jnp.arange(4), alpha=0)
        assert float(lam) == 1.0
        np.testing.assert_array_equal(np.asarray(mixed), np.asarray(img))


class TestMixupRawLabeled:
    def test_shared_permutation(self):
        img = jnp.arange(6.0)[:, None]
        label = jnp.arange(6)
        weight = jnp.arange(6.0) * 10
        mixed, la, lb, wa, wb, lam = mixup.mixup_raw_labeled_data(
            KEY, img, label, weight, alpha=2.0)
        # weight_b must follow the same permutation as label_b
        np.testing.assert_allclose(np.asarray(wb), np.asarray(lb) * 10.0)
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(weight))


class TestMixupCriterion:
    def test_weighting(self):
        calls = []

        def crit(label, pred):
            calls.append(label)
            return float(label)

        out = mixup.mixup_criterion(crit, None, 2.0, 4.0, 0.25)
        assert np.isclose(float(out), 0.25 * 2.0 + 0.75 * 4.0)
        assert calls == [2.0, 4.0]
