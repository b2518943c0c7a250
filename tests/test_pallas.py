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
