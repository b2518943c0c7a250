"""Tests for reparameterised sampling and mixup/label-smoothing interpolation."""

import numpy as np
import jax
import jax.numpy as jnp

from shotvae_tpu.ops import mixup, sampling

KEY = jax.random.key(42)


class TestGaussianSample:
    def test_moments(self):
        mean = jnp.full((20000, 4), 1.5)
        log_sigma = jnp.full((20000, 4), np.log(0.5).astype(np.float32))
        z = sampling.sample_gaussian(KEY, mean, log_sigma)
        assert np.isclose(float(z.mean()), 1.5, atol=0.02)
        assert np.isclose(float(z.std()), 0.5, atol=0.02)

    def test_logvar_convention_halves_scale(self):
        logvar = jnp.full((20000, 4), np.log(0.25).astype(np.float32))
        z = sampling.sample_gaussian_logvar(KEY, jnp.zeros((20000, 4)), logvar)
        assert np.isclose(float(z.std()), 0.5, atol=0.02)

    def test_deterministic_given_key(self):
        mean, ls = jnp.ones((3, 2)), jnp.zeros((3, 2))
        a = sampling.sample_gaussian(KEY, mean, ls)
        b = sampling.sample_gaussian(KEY, mean, ls)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGumbelSoftmax:
    def test_simplex(self):
        log_alpha = jnp.log(jnp.full((64, 10), 0.1))
        y = sampling.sample_gumbel_softmax(KEY, log_alpha, 0.67)
        np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, rtol=1e-5)
        assert (np.asarray(y) >= 0).all()

    def test_low_temperature_concentrates(self):
        logits = jnp.array([[5.0, 0.0, 0.0]] * 256)
        log_alpha = jax.nn.log_softmax(logits, axis=1)
        y = sampling.sample_gumbel_softmax(KEY, log_alpha, 0.1)
        # with strong logit and tiny temperature, argmax is class 0 mostly
        assert (np.asarray(y).argmax(1) == 0).mean() > 0.9

    def test_probs_variant_matches_log_variant(self):
        alpha = jnp.array([[0.7, 0.2, 0.1]] * 4)
        a = sampling.sample_gumbel_softmax_probs(KEY, alpha, 0.67)
        b = sampling.sample_gumbel_softmax(KEY, jnp.log(alpha + 1e-12), 0.67)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestDiscreteLatent:
    def test_labeled_path_is_onehot(self):
        la = jnp.zeros((4, 10))
        y = sampling.discrete_latent(KEY, la, 0.67, labels=jnp.array([2, 5, 0, 9]))
        want = np.eye(10, dtype=np.float32)[[2, 5, 0, 9]]
        np.testing.assert_array_equal(np.asarray(y), want)

    def test_labeled_mixup_convex_combo(self):
        la = jnp.zeros((2, 4))
        y = sampling.discrete_latent(
            KEY, la, 0.67, labels=jnp.array([0, 1]),
            labels_mixup=jnp.array([2, 3]), mixup_lam=jnp.float32(0.3),
        )
        want = 0.3 * np.eye(4)[[0, 1]] + 0.7 * np.eye(4)[[2, 3]]
        np.testing.assert_allclose(np.asarray(y), want.astype(np.float32), rtol=1e-6)

    def test_joint_latent_shape(self):
        z = sampling.joint_latent(
            KEY, jnp.zeros((8, 128)), jnp.zeros((8, 128)), jnp.zeros((8, 10)), 0.67
        )
        assert z.shape == (8, 138)

    def test_eval_onehot(self):
        alpha = jnp.array([[0.1, 0.8, 0.1], [0.6, 0.2, 0.2]])
        y = sampling.eval_discrete_onehot(alpha)
        np.testing.assert_array_equal(np.asarray(y), [[0, 1, 0], [1, 0, 0]])


class TestPairwiseKL:
    def test_matches_per_pair_formula(self):
        rng = np.random.default_rng(1)
        mean = rng.normal(size=(6, 5)).astype(np.float32)
        ls = rng.uniform(-0.5, 0.5, size=(6, 5)).astype(np.float32)
        got = np.asarray(mixup.pairwise_gaussian_kl(jnp.array(mean), jnp.array(ls)))

        def kl_pair(i, j):
            s_i, s_j = np.exp(ls[i]), np.exp(ls[j])
            return (
                (ls[j] - ls[i]).sum()
                + 0.5 * (s_i**2 / s_j**2).sum()
                + 0.5 * ((mean[i] - mean[j]) ** 2 / s_j**2).sum()
                - 0.5 * 5
            )

        want = np.array([[kl_pair(i, j) for j in range(6)] for i in range(6)])
        # the matmul expansion of (mu_i - mu_j)^2 has ~1e-2 f32 cancellation
        # noise; fine for match *selection*, reflected in the tolerance here
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=0.05)

    def test_diagonal_near_zero(self):
        rng = np.random.default_rng(2)
        mean = rng.normal(size=(4, 3)).astype(np.float32)
        ls = rng.uniform(-0.3, 0.3, size=(4, 3)).astype(np.float32)
        kl = np.asarray(mixup.pairwise_gaussian_kl(jnp.array(mean), jnp.array(ls)))
        np.testing.assert_allclose(np.diag(kl), 0.0, atol=0.05)

    def test_optimal_match_picks_nearest_other(self):
        # three tight clusters; each sample's match must be its cluster twin
        mean = jnp.array([[0.0], [0.1], [5.0], [5.1], [10.0], [10.1]])
        ls = jnp.zeros((6, 1))
        idx = np.asarray(mixup.optimal_match_index(mean, ls))
        np.testing.assert_array_equal(idx, [1, 0, 3, 2, 5, 4])


class TestMixupVaeData:
    def _inputs(self, b=16):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (b, 8, 8, 3)).astype(np.float32)
        mean = rng.normal(size=(b, 4)).astype(np.float32)
        ls = rng.uniform(-0.3, 0.3, (b, 4)).astype(np.float32)
        logits = rng.normal(size=(b, 10)).astype(np.float32)
        la = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        return img, mean, ls, la

    def test_interpolation_identity(self):
        img, mean, ls, la = self._inputs()
        out = mixup.mixup_vae_data(KEY, jnp.array(img), jnp.array(mean),
                                   jnp.array(ls), jnp.array(la))
        lam = float(out.lam)
        assert 0.0 < lam < 1.0
        # recover the permutation from the image mix and verify all fields agree
        # mixed = lam*x + (1-lam)*x[perm]
        resid = (np.asarray(out.image) - lam * img) / (1 - lam)
        perm = np.array([
            np.argmin(np.abs(resid[i].ravel()[0] - img[:, 0, 0, 0])) for i in range(16)
        ])
        np.testing.assert_allclose(
            np.asarray(out.z_sigma), lam * np.exp(ls) + (1 - lam) * np.exp(ls)[perm],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.disc_alpha), lam * np.exp(la) + (1 - lam) * np.exp(la)[perm],
            rtol=1e-4,
        )
        assert out.partner_labels is None

    def test_alpha_stays_on_simplex(self):
        img, mean, ls, la = self._inputs()
        out = mixup.mixup_vae_data(KEY, jnp.array(img), jnp.array(mean),
                                   jnp.array(ls), jnp.array(la))
        np.testing.assert_allclose(np.asarray(out.disc_alpha).sum(1), 1.0, rtol=1e-5)

    def test_optimal_match_variant_runs_large_batch(self):
        img, mean, ls, la = self._inputs(b=256)
        out = jax.jit(
            lambda k, *a: mixup.mixup_vae_data(k, *a, optimal_match=True)
        )(KEY, jnp.array(img), jnp.array(mean), jnp.array(ls), jnp.array(la))
        assert out.image.shape == (256, 8, 8, 3)


class TestLabelSmoothing:
    def test_partner_labels_and_lambda_distribution(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (32, 4, 4, 1)).astype(np.float32)
        mean = rng.normal(size=(32, 4)).astype(np.float32)
        ls = np.zeros((32, 4), np.float32)
        la = np.log(np.full((32, 10), 0.1, np.float32))
        labels = jnp.arange(32) % 10
        out = mixup.label_smoothing(KEY, jnp.array(img), jnp.array(mean),
                                    jnp.array(ls), jnp.array(la), labels,
                                    epsilon=0.1)
        assert out.partner_labels is not None and out.partner_labels.shape == (32,)
        # Beta(0.1, 0.1) concentrates near 0 and 1
        lams = [
            float(mixup.label_smoothing(jax.random.key(i), jnp.array(img),
                                        jnp.array(mean), jnp.array(ls),
                                        jnp.array(la), labels, epsilon=0.1).lam)
            for i in range(50)
        ]
        assert np.mean([(l < 0.2) or (l > 0.8) for l in lams]) > 0.8

    def test_epsilon_zero_is_identity(self):
        img = jnp.ones((4, 2, 2, 1))
        mean = jnp.zeros((4, 3))
        ls = jnp.zeros((4, 3))
        la = jnp.log(jnp.full((4, 10), 0.1))
        out = mixup.label_smoothing(KEY, img, mean, ls, la, jnp.arange(4),
                                    epsilon=0)
        assert float(out.lam) == 1.0
        np.testing.assert_allclose(np.asarray(out.image), np.asarray(img))
