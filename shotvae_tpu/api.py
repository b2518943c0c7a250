"""Inference/serving convenience API over a trained SHOT-VAE.

The reference exposes no inference surface beyond the training scripts; this
wraps a checkpointed model in jitted, fixed-shape endpoints for deployment:

  classify(images)     -> class probabilities from q(y|x) (deterministic)
  encode(images)       -> (z_mean, z_log_sigma, disc_log_alpha)
  reconstruct(images)  -> sigmoid reconstruction (stochastic z/y, like the
                          reference's eval-time behaviour, vae.py:23-56)
  generate(labels,key) -> decoder samples from the prior p(z) with a chosen
                          class one-hot

All endpoints take uint8 NHWC batches and run as single compiled programs.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import nn as jnn

from shotvae_tpu.data.pipeline import to_float
from shotvae_tpu.ops import sampling


class ShotVaeInference:
    def __init__(self, model, params, batch_stats):
        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self._classify = jax.jit(self._classify_impl)
        self._encode = jax.jit(self._encode_impl)
        self._reconstruct = jax.jit(self._reconstruct_impl)
        self._generate = jax.jit(self._generate_impl)

    @classmethod
    def from_checkpoint(cls, model, ckpt_manager, *, best: bool = False,
                        sample_input=None):
        """Restore params/batch_stats via an io.CheckpointManager."""
        from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

        if sample_input is None:
            sample_input = jnp.zeros((2, 32, 32, model.num_input_channels))
        params, batch_stats = init_model(model, jax.random.key(0), sample_input)
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=batch_stats, tx=sgd_torch(0.1))
        state, _, _ = ckpt_manager.restore(state, best=best)
        return cls(model, state.params, state.batch_stats)

    # --- impls (jitted in __init__) ---

    def _forward(self, x, key):
        return self.model.apply(self.variables, x, train=False,
                                rngs={"sample": key})

    def _classify_impl(self, images_u8):
        x = to_float(images_u8)
        # accuracy path only needs disc_log_alpha, which is deterministic;
        # a fixed key keeps the whole endpoint deterministic
        _, _, _, log_alpha = self._forward(x, jax.random.key(0))
        return jnp.exp(log_alpha)

    def _encode_impl(self, images_u8):
        x = to_float(images_u8)
        _, mean, log_sigma, log_alpha = self._forward(x, jax.random.key(0))
        return mean, log_sigma, log_alpha

    def _reconstruct_impl(self, images_u8, key):
        x = to_float(images_u8)
        recon, _, _, _ = self._forward(x, key)
        return jnn.sigmoid(recon)

    def _generate_impl(self, labels, key):
        dc = self.model.continuous_latent_dim
        z = jax.random.normal(key, (labels.shape[0], dc))
        y = sampling.label_onehot(labels, self.model.disc_latent_dim)
        latent = jnp.concatenate([z, y], axis=1)
        # apply only the decoder submodule on the prior sample
        recon = self.model.apply(self.variables, latent.astype(jnp.float32),
                                 train=False, method="decode")
        return jnn.sigmoid(recon)

    # --- public endpoints ---

    def classify(self, images_u8):
        """(B,H,W,C) uint8 -> (B, K) class probabilities."""
        return self._classify(images_u8)

    def encode(self, images_u8):
        return self._encode(images_u8)

    def reconstruct(self, images_u8, key=None):
        return self._reconstruct(images_u8,
                                 key if key is not None else jax.random.key(0))

    def generate(self, labels, key=None):
        """Class-conditional samples from the prior."""
        return self._generate(jnp.asarray(labels),
                              key if key is not None else jax.random.key(0))
