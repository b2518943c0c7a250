"""Tests for the inference/serving API."""

import numpy as np

import jax
import jax.numpy as jnp

from shotvae_tpu.api import ShotVaeInference
from shotvae_tpu.io import CheckpointManager
from shotvae_tpu.models import VariationalAutoEncoder
from shotvae_tpu.train.state import TrainState, init_model, sgd_torch


def _build():
    model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    return model, params, bs


class TestInferenceAPI:
    def test_classify_probs(self):
        model, params, bs = _build()
        api = ShotVaeInference(model, params, bs)
        imgs = jax.random.randint(jax.random.key(1), (4, 32, 32, 3), 0, 256,
                                  dtype=jnp.int32).astype(jnp.uint8)
        probs = api.classify(imgs)
        assert probs.shape == (4, 10)
        np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, rtol=1e-5)
        # deterministic endpoint
        np.testing.assert_array_equal(np.asarray(probs),
                                      np.asarray(api.classify(imgs)))

    def test_encode_reconstruct_generate(self):
        model, params, bs = _build()
        api = ShotVaeInference(model, params, bs)
        imgs = jax.random.randint(jax.random.key(2), (2, 32, 32, 3), 0, 256,
                                  dtype=jnp.int32).astype(jnp.uint8)
        mean, log_sigma, log_alpha = api.encode(imgs)
        assert mean.shape == (2, 8) and log_alpha.shape == (2, 10)
        recon = api.reconstruct(imgs, key=jax.random.key(3))
        assert recon.shape == (2, 32, 32, 3)
        assert 0.0 <= float(recon.min()) and float(recon.max()) <= 1.0
        gen = api.generate(jnp.array([0, 5, 9]), key=jax.random.key(4))
        assert gen.shape == (3, 32, 32, 3)

    def test_from_checkpoint(self, tmp_path):
        model, params, bs = _build()
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=bs, tx=sgd_torch(0.1))
        ckpt = CheckpointManager(str(tmp_path), "Cifar10", 1)
        ckpt.save(state, epoch=3)
        api = ShotVaeInference.from_checkpoint(model, ckpt)
        leaves_a = jax.tree_util.tree_leaves(api.variables["params"])
        leaves_b = jax.tree_util.tree_leaves(params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
