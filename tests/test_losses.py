"""Golden tests for every loss term against independent numpy/torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from shotvae_tpu.ops import losses


RNG = np.random.default_rng(0)


def _rand(*shape, lo=-2.0, hi=2.0):
    return RNG.uniform(lo, hi, size=shape).astype(np.float32)


class TestReconstruction:
    def test_bce_with_logits_matches_torch(self):
        logits = _rand(8, 3, 32, 32)
        x = RNG.uniform(0, 1, size=(8, 3, 32, 32)).astype(np.float32)
        got = losses.reconstruction_loss(jnp.array(x), jnp.array(logits), bce=True)
        want = F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(x), reduction="sum"
        ).item() / 8
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_mse_sigmoid_form(self):
        logits = _rand(4, 1, 8, 8)
        x = RNG.uniform(0, 1, size=(4, 1, 8, 8)).astype(np.float32)
        x_sigma = 1.5
        got = losses.reconstruction_loss(
            jnp.array(x), jnp.array(logits), bce=False, x_sigma=x_sigma
        )
        want = ((1 / (1 + np.exp(-logits)) - x) ** 2).sum() / (2 * 4 * x_sigma**2)
        assert np.isclose(float(got), want, rtol=1e-4)


class TestGaussianKL:
    def test_closed_form_stdnormal(self):
        mean = _rand(16, 10)
        log_sigma = _rand(16, 10, lo=-1, hi=1)
        got = losses.gaussian_kl_stdnormal(jnp.array(mean), jnp.array(log_sigma))
        want = 0.5 * (mean**2 + np.exp(2 * log_sigma) - 2 * log_sigma - 1).sum() / 16
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_zero_at_prior(self):
        z = np.zeros((4, 7), np.float32)
        assert float(losses.gaussian_kl_stdnormal(jnp.array(z), jnp.array(z))) == pytest.approx(0.0, abs=1e-5)

    def test_general_matches_stdnormal_when_prior_standard(self):
        mean = _rand(5, 3)
        log_sigma = _rand(5, 3, lo=-0.5, hi=0.5)
        a = losses.gaussian_kl_general(jnp.array(mean), jnp.array(log_sigma))
        b = losses.gaussian_kl_stdnormal(jnp.array(mean), jnp.array(log_sigma))
        assert np.isclose(float(a), float(b), rtol=1e-6)

    def test_general_two_gaussians(self):
        mean_q, log_sigma_q = _rand(6, 4), _rand(6, 4, lo=-0.5, hi=0.5)
        mean_p, sigma_p = _rand(6, 4), RNG.uniform(0.5, 2.0, (6, 4)).astype(np.float32)
        got = losses.gaussian_kl_general(
            jnp.array(mean_q), jnp.array(log_sigma_q), jnp.array(mean_p), jnp.array(sigma_p)
        )
        var_q = np.exp(2 * log_sigma_q)
        var_p = sigma_p**2
        want = 0.5 * (
            2 * np.log(sigma_p + 1e-4) - 2 * log_sigma_q + var_q / var_p
            + (mean_q - mean_p) ** 2 / var_p - 1
        ).sum() / 6
        assert np.isclose(float(got), want, rtol=1e-4)


class TestCategoricalKL:
    def test_uniform_kl_closed_form(self):
        logits = _rand(12, 10)
        log_alpha = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        got = losses.categorical_kl_uniform(jnp.array(log_alpha), 10)
        alpha = np.exp(log_alpha)
        want = (alpha * (log_alpha - np.log(0.1))).sum() / 12
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_uniform_distribution_gives_zero(self):
        la = np.full((3, 10), np.log(0.1), np.float32)
        assert float(losses.categorical_kl_uniform(jnp.array(la), 10)) == pytest.approx(0.0, abs=1e-4)

    def test_general_both_orders(self):
        logits = _rand(7, 5)
        log_q = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        p = RNG.dirichlet(np.ones(5), size=7).astype(np.float32)
        got_qp = losses.categorical_kl(jnp.array(log_q), jnp.array(p), qp_order=True)
        got_pq = losses.categorical_kl(jnp.array(log_q), jnp.array(p), qp_order=False)
        log_p = np.log(p + 1e-4)
        want_qp = (np.exp(log_q) * (log_q - log_p)).sum() / 7
        want_pq = (p * (log_p - log_q)).sum() / 7
        assert np.isclose(float(got_qp), want_qp, rtol=1e-4)
        assert np.isclose(float(got_pq), want_pq, rtol=1e-4)


class TestClsNLL:
    def test_matches_manual_ce(self):
        logits = _rand(9, 10)
        log_probs = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        labels = RNG.integers(0, 10, 9)
        onehot = np.eye(10, dtype=np.float32)[labels]
        got = losses.cls_nll(jnp.array(log_probs), jnp.array(onehot))
        want = -np.mean(log_probs[np.arange(9), labels])
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_batch_weight(self):
        log_probs = np.log(np.full((4, 2), 0.5, np.float32))
        onehot = np.eye(2, dtype=np.float32)[[0, 1, 0, 1]]
        w = np.array([1, 0, 1, 0], np.float32)
        got = losses.cls_nll(jnp.array(log_probs), jnp.array(onehot), jnp.array(w))
        assert np.isclose(float(got), -np.log(0.5) / 2, rtol=1e-6)


class TestSmoothElboTerms:
    def test_smooth_recon_is_per_sample_sum_mse(self):
        x, r = _rand(5, 1, 32, 32), _rand(5, 1, 32, 32)
        got = losses.smooth_recon_loss(jnp.array(x), jnp.array(r))
        want = ((r - x) ** 2).mean() * (1 * 32 * 32)
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_kl_normal_loss_logvar_convention(self):
        mean, logvar = _rand(8, 10), _rand(8, 10, lo=-1, hi=1)
        got, per_dim = losses.kl_normal_loss(jnp.array(mean), jnp.array(logvar))
        kl_vals = -0.5 * (1 + logvar - mean**2 - np.exp(logvar))
        assert np.allclose(np.asarray(per_dim), kl_vals.mean(0), rtol=1e-4)
        assert np.isclose(float(got), kl_vals.mean(0).sum(), rtol=1e-4)

    def test_kl_discrete_loss(self):
        alpha = RNG.dirichlet(np.ones(10), size=6).astype(np.float32)
        got = losses.kl_discrete_loss(jnp.array(alpha))
        want = np.log(10) + (alpha * np.log(alpha + 1e-12)).sum(1).mean()
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_kl_multiple_discrete_sums_heads(self):
        a = RNG.dirichlet(np.ones(4), size=3).astype(np.float32)
        b = RNG.dirichlet(np.ones(6), size=3).astype(np.float32)
        got = losses.kl_multiple_discrete_loss([jnp.array(a), jnp.array(b)])
        want = float(losses.kl_discrete_loss(jnp.array(a))) + float(
            losses.kl_discrete_loss(jnp.array(b))
        )
        assert np.isclose(float(got), want, rtol=1e-6)

    def test_capacity_loss_ramp_and_cap(self):
        kl = jnp.float32(3.0)
        # mid-ramp: cap = (17-0) * 100/1000 = 1.7 -> 30*|1.7-3| = 39
        got = losses.capacity_loss(kl, 100, 0.0, 17.0, 1000, 30.0)
        assert np.isclose(float(got), 30 * abs(1.7 - 3.0), rtol=1e-4)
        # past num_iters: clamped at cap_max
        got = losses.capacity_loss(kl, 99999, 0.0, 17.0, 1000, 30.0)
        assert np.isclose(float(got), 30 * abs(17.0 - 3.0), rtol=1e-4)
        # theoretical max cap for discrete: log(10)
        got = losses.capacity_loss(kl, 99999, 0.0, 17.0, 1000, 30.0,
                                   theoretical_max=np.log(10))
        assert np.isclose(float(got), 30 * abs(np.log(10) - 3.0), rtol=1e-4)

    def test_bce_probs_matches_torch(self):
        p = RNG.uniform(0.01, 0.99, (6, 10)).astype(np.float32)
        t = np.eye(10, dtype=np.float32)[RNG.integers(0, 10, 6)]
        got = losses.bce_probs_mean(jnp.array(p), jnp.array(t))
        want = F.binary_cross_entropy(torch.tensor(p), torch.tensor(t)).item()
        assert np.isclose(float(got), want, rtol=1e-4)

    def test_bce_probs_grad_matches_torch_at_boundaries(self):
        # regression for the round-5 smooth-ELBO SVHN NaN: once a softmax
        # head saturates, non-max probs underflow to EXACTLY 0.0 in f32; the
        # naive VJP of the clamped forward gives 0 * (1/0) = NaN there.
        # torch's binary_cross_entropy_backward returns the finite
        # (p - t) / max(p*(1-p), 1e-12) instead — pin both value and grad.
        p = np.array([0.0, 1.0, 0.5, 1e-20, 0.25], dtype=np.float32)
        t = np.array([1.0, 0.0, 1.0, 1.0, 0.0], dtype=np.float32)
        import jax

        got_loss, got_grad = jax.value_and_grad(
            lambda q: losses.bce_probs_mean(q, jnp.array(t)))(jnp.array(p))
        tp = torch.tensor(p, requires_grad=True)
        want_loss = F.binary_cross_entropy(tp, torch.tensor(t))
        want_loss.backward()
        assert np.isclose(float(got_loss), want_loss.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_grad),
                                   tp.grad.numpy(), rtol=1e-5)
        assert np.isfinite(np.asarray(got_grad)).all()


class TestMonitoring:
    def test_smoothed_onehot_sums_to_one(self):
        s = losses.smoothed_onehot(jnp.array([0, 3]), 10)
        np.testing.assert_allclose(np.asarray(s).sum(1), 1.0, rtol=1e-6)
        assert np.isclose(float(s[0, 0]), 1 - 0.001, rtol=1e-6)
        assert np.isclose(float(s[0, 1]), 0.001 / 9, rtol=1e-6)

    def test_inference_kl_metric(self):
        logits = _rand(4, 10)
        log_alpha = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        labels = np.array([1, 2, 3, 4])
        got = losses.inference_kl_metric(jnp.array(log_alpha), jnp.array(labels), 10)
        smooth = np.full((4, 10), 0.001 / 9, np.float32)
        smooth[np.arange(4), labels] = 1 - 0.001
        alpha = np.exp(log_alpha)
        want = (alpha * log_alpha - alpha * np.log(smooth)).sum() / 4
        assert np.isclose(float(got), want, rtol=1e-4)


class TestMiHinge:
    def test_abs(self):
        assert float(losses.mi_hinge(jnp.float32(1.0), 2.3)) == pytest.approx(1.3)
        assert float(losses.mi_hinge(jnp.float32(4.0), 2.3)) == pytest.approx(1.7)
