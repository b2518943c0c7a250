"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _on_tpu():
    return jax.devices()[0].platform == "tpu"


@pytest.fixture(autouse=True)
def interpret_mode():
    """Run kernels in the Pallas interpreter unless on real TPU."""
    if _on_tpu():
        yield
    else:
        with pltpu.force_tpu_interpret_mode():
            yield


class TestFusedBNLeaky:
    def _data(self, m=300, c=32, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32)) * 2 + 1
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
        beta = jnp.asarray(rng.normal(size=c).astype(np.float32))
        return x, gamma, beta

    def test_forward_matches_reference(self):
        from shotvae_tpu.ops.pallas.fused_bn_act import (
            bn_leaky_train,
            bn_leaky_train_reference,
        )

        x, gamma, beta = self._data()
        y, mean, var = bn_leaky_train(x, gamma, beta)
        y_ref, mean_ref, var_ref = bn_leaky_train_reference(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_reference(self):
        from shotvae_tpu.ops.pallas.fused_bn_act import (
            bn_leaky_train,
            bn_leaky_train_reference,
        )

        x, gamma, beta = self._data(m=129, c=16, seed=1)

        def loss_pallas(x, gamma, beta):
            y, _, _ = bn_leaky_train(x, gamma, beta)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

        def loss_ref(x, gamma, beta):
            y, _, _ = bn_leaky_train_reference(x, gamma, beta)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b, name in zip(gp, gr, ("dx", "dgamma", "dbeta")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_inference_kernel(self):
        from shotvae_tpu.ops.pallas.fused_bn_act import bn_act_inference

        x, gamma, beta = self._data(m=64, c=8, seed=2)
        rm = jnp.zeros(8) + 0.3
        rv = jnp.ones(8) * 1.7
        y = bn_act_inference(x, gamma, beta, rm, rv)
        ref = (x - rm) * jax.lax.rsqrt(rv + 1e-5) * gamma + beta
        ref = jnp.where(ref >= 0, ref, 0.01 * ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_input(self):
        from shotvae_tpu.ops.pallas.fused_bn_act import (
            bn_leaky_train,
            bn_leaky_train_reference,
        )

        x, gamma, beta = self._data(m=128, c=16, seed=3)
        y, _, _ = bn_leaky_train(x.astype(jnp.bfloat16), gamma, beta)
        y_ref, _, _ = bn_leaky_train_reference(x.astype(jnp.bfloat16), gamma,
                                               beta)
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestFusedSample:
    @pytest.mark.skipif(not _on_tpu(),
                        reason="hardware PRNG needs a real TPU "
                               "(prng_random_bits unsupported in interpreter)")
    def test_moments_and_simplex(self):
        from shotvae_tpu.ops.pallas.fused_sample import fused_joint_sample

        b, dc, dd = 4096, 16, 10
        mean = jnp.full((b, dc), 1.5)
        log_sigma = jnp.full((b, dc), float(np.log(0.5)))
        log_alpha = jnp.log(jnp.full((b, dd), 0.1))
        out = fused_joint_sample(jnp.int32(7), mean, log_sigma, log_alpha)
        z, y = out[:, :dc], out[:, dc:]
        assert np.isclose(float(z.mean()), 1.5, atol=0.05)
        assert np.isclose(float(z.std()), 0.5, atol=0.05)
        np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, rtol=1e-4)
        assert (np.asarray(y) >= 0).all()


class TestFusedBnActConv:
    """Pallas fused BN-affine + LeakyReLU + conv3x3 (ops/pallas/fused_conv)."""

    def _data(self, b=8, h=8, w=8, cin=128, cout=128, seed=3,
              dtype=jnp.float32):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), dtype)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, cin), jnp.float32)
        shift = jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32)
        wk = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                         jnp.float32)
        return x, scale, shift, wk

    def test_forward_matches_xla(self):
        from shotvae_tpu.ops.pallas.fused_conv import (
            fused_bn_act_conv, reference_bn_act_conv)

        for shape in ((8, 8, 8, 128, 128), (4, 16, 16, 64, 64),
                      (2, 32, 32, 32, 32), (6, 8, 8, 128, 64)):
            x, scale, shift, wk = self._data(*shape)
            got = fused_bn_act_conv(x, scale, shift, wk)
            want = reference_bn_act_conv(x, scale, shift, wk)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

    def test_backward_matches_xla(self):
        from shotvae_tpu.ops.pallas.fused_conv import (
            fused_bn_act_conv, reference_bn_act_conv)

        x, scale, shift, wk = self._data(b=4)

        def loss(fn, x, scale, shift, wk):
            return jnp.sum(jnp.square(fn(x, scale, shift, wk)))

        g1 = jax.grad(lambda *a: loss(fused_bn_act_conv, *a),
                      argnums=(0, 1, 2, 3))(x, scale, shift, wk)
        g2 = jax.grad(lambda *a: loss(reference_bn_act_conv, *a),
                      argnums=(0, 1, 2, 3))(x, scale, shift, wk)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_bn_affine_fold(self):
        from shotvae_tpu.ops.pallas.fused_conv import bn_affine_from_stats

        rng = np.random.default_rng(5)
        mean = jnp.asarray(rng.normal(size=16), jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2.0, 16), jnp.float32)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
        beta = jnp.asarray(rng.normal(size=16), jnp.float32)
        scale, shift = bn_affine_from_stats(mean, var, gamma, beta)
        x = jnp.asarray(rng.normal(size=(7, 16)), jnp.float32)
        got = x * scale + shift
        want = (x - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
