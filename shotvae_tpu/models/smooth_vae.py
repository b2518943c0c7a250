"""One-stage smooth-ELBO conv VAEs for MNIST / SVHN.

TPU-native rebuild of /root/reference/smooth_vae_model/mnist_vae.py:8-267 and
svhn_vae.py:8-297 (same architecture, widened): 3x conv(k4,s2) encoder ->
hidden FC -> heads (mean, logvar, one softmax-probability head per discrete
variable) -> reparameterise -> FC -> reshape -> 3x ConvTranspose(k4,s2) ->
Tanh (inputs are normalised to [-1, 1]).

Conventions that differ from the SHOT VAE (and are preserved): continuous
latent parameterised by log *variance*; discrete heads emit *probabilities*;
eval mode uses z = mean and y = argmax one-hot (mnist_vae.py:200-240);
labeled reparameterisation substitutes the one-hot label for the sampled y
(mnist_vae.py:169-178).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import nn as jnn

from shotvae_tpu.models.layers import TorchConv, TorchConvTranspose, TorchDense, relu
from shotvae_tpu.ops import sampling


def mnist_vae_config() -> dict:
    """mnist_VAE hyperparameters (mnist_vae.py:21-22,48-65,95-105)."""
    return dict(img_channels=1, encoder_channels=(32, 64, 64), hidden_dim=256,
                reshape_channels=64, decoder_channels=(32, 32),
                latent_cont_dim=10, disc_dims=(10,))


def svhn_vae_config() -> dict:
    """svhn_VAE hyperparameters (svhn_vae.py:21-22,67,77,96,124-132).

    The svhn decoder is wider than mnist's: ConvT 128->64->32->3
    (svhn_vae.py:125-129) vs mnist's 64->32->32->1 (mnist_vae.py:97-101).
    """
    return dict(img_channels=3, encoder_channels=(32, 64, 128), hidden_dim=512,
                reshape_channels=128, decoder_channels=(64, 32),
                latent_cont_dim=32, disc_dims=(10,))


class SmoothVAE(nn.Module):
    img_channels: int = 1
    encoder_channels: Sequence[int] = (32, 64, 64)
    hidden_dim: int = 256
    reshape_channels: int = 64
    decoder_channels: Sequence[int] = (32, 32)
    latent_cont_dim: int = 10
    disc_dims: Sequence[int] = (10,)
    temperature: float = 0.67
    dtype: Optional[jnp.dtype] = None

    @property
    def latent_dim(self) -> int:
        return self.latent_cont_dim + sum(self.disc_dims)

    @nn.compact
    def __call__(self, x, labels=None, train: bool = True, noise=None):
        batch = x.shape[0]
        h = x.astype(self.dtype or jnp.float32)
        for i, ch in enumerate(self.encoder_channels):
            h = relu(TorchConv(ch, (4, 4), strides=2, padding=1,
                               dtype=self.dtype, name=f"enc_conv{i}")(h))
        h = h.reshape(batch, -1)
        hidden = relu(TorchDense(self.hidden_dim, dtype=self.dtype,
                                 name="features_to_hidden")(h)).astype(jnp.float32)

        mean = TorchDense(self.latent_cont_dim, name="fc_mean")(hidden)
        logvar = TorchDense(self.latent_cont_dim, name="fc_log_var")(hidden)
        alphas = [
            jnn.softmax(TorchDense(d, name=f"fc_alpha{i}")(hidden), axis=1)
            for i, d in enumerate(self.disc_dims)
        ]
        latent_dist = {"cont": (mean, logvar), "disc": alphas}

        # --- reparameterise (mnist_vae.py:139-240) ---
        parts = []
        disc_samples = []
        if train:
            # ``noise`` optionally injects pre-drawn randomness ({"eps": arr,
            # "unif": [arr per disc var]}) for the cross-framework lockstep
            # tests; None (default) draws from the "sample" rng stream.
            nz = noise or {}
            key = self.make_rng("sample")
            key_z, *keys_y = jax.random.split(key, 1 + len(alphas))
            parts.append(sampling.sample_gaussian_logvar(
                key_z, mean, logvar, eps=nz.get("eps")))
            unifs = nz.get("unif") or [None] * len(alphas)
            disc_samples = [
                sampling.sample_gumbel_softmax_probs(k, a, self.temperature,
                                                     unif=u)
                for k, a, u in zip(keys_y, alphas, unifs)
            ]
        else:
            parts.append(mean)
            disc_samples = [sampling.eval_discrete_onehot(a) for a in alphas]
        if labels is not None:
            # labeled path: ground-truth one-hot replaces the y sample
            parts.append(sampling.label_onehot(labels, self.disc_dims[0]))
            parts.extend(disc_samples[1:])
        else:
            parts.extend(disc_samples)
        latent_sample = jnp.concatenate(parts, axis=1)

        # --- decode (mnist_vae.py:79-105,242-253) ---
        d = relu(TorchDense(self.hidden_dim, dtype=self.dtype,
                            name="latent_to_hidden")(latent_sample))
        d = relu(TorchDense(self.reshape_channels * 16, dtype=self.dtype,
                            name="hidden_to_features")(d))
        d = d.reshape(batch, 4, 4, self.reshape_channels)
        for i, ch in enumerate(self.decoder_channels):
            d = relu(TorchConvTranspose(ch, (4, 4), strides=(2, 2),
                                        padding="SAME", dtype=self.dtype,
                                        name=f"dec_convt{i}")(d))
        d = TorchConvTranspose(self.img_channels, (4, 4), strides=(2, 2),
                               padding="SAME", dtype=self.dtype,
                               name=f"dec_convt{len(self.decoder_channels)}")(d)
        recon = jnp.tanh(d.astype(jnp.float32))
        return recon, latent_dist, latent_sample, disc_samples
