"""The SHOT / M2 VariationalAutoEncoder composition.

TPU-native rebuild of /root/reference/shot_vae_model/vae.py:89-151:
encoder backbone -> global average pool -> three linear inference heads
(z-mean, z-log-sigma, y-log-alpha via log-softmax) -> reparameterised
[z ; y] sample -> DCGAN decoder. Returns
(reconstruction_logits, norm_mean, norm_log_sigma, disc_log_alpha), all heads
in float32 regardless of the trunk's compute dtype.

The reference wraps each submodule in nn.DataParallel (vae.py:96-132); here
parallelism is external — the whole apply is sharded over the mesh by the
caller (shotvae_tpu.parallel), which is the TPU-native equivalent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import nn as jnn

from shotvae_tpu.models.decoder import Decoder
from shotvae_tpu.models.densenet import DenseNet, densenet_dict
from shotvae_tpu.models.layers import TorchDense, global_avg_pool
from shotvae_tpu.models.preactresnet import PreActResNet, preactresnet_dict
from shotvae_tpu.models.wideresnet import WideResNet, parse_wideresnet_name
from shotvae_tpu.ops import sampling


def build_encoder(encoder_name: str, *, drop_rate: float = 0.0,
                  small_input: bool = True, efficient: bool = False,
                  dtype=None, axis_name=None,
                  name: Optional[str] = "feature_extractor") -> nn.Module:
    """Resolve an encoder by name. Parity: vae.py:92-104 name dispatch.

    ``name=None`` for use inside ``setup()`` (flax forbids explicit names
    there; the attribute name becomes the scope).
    """
    kw = {} if name is None else {"name": name}
    if "densenet" in encoder_name:
        cfg = densenet_dict[encoder_name]
        return DenseNet(growth_rate=cfg["growth_rate"],
                        block_config=cfg["block_config"],
                        num_init_features=cfg["num_init_features"],
                        drop_rate=drop_rate, efficient=efficient,
                        small_input=small_input, dtype=dtype,
                        axis_name=axis_name, **kw)
    if "wideresnet" in encoder_name:
        depth, width = parse_wideresnet_name(encoder_name)
        return WideResNet(depth=depth, width=width, drop_rate=drop_rate,
                          small_input=small_input, dtype=dtype,
                          axis_name=axis_name, **kw)
    if "preactresnet" in encoder_name:
        cfg = preactresnet_dict[encoder_name]
        return PreActResNet(expansion=cfg["expansion"],
                            block_config=cfg["block_config"],
                            drop_rate=drop_rate, small_input=small_input,
                            dtype=dtype, axis_name=axis_name, **kw)
    raise NotImplementedError(f"{encoder_name} not implemented")


class VariationalAutoEncoder(nn.Module):
    """Parity: shot_vae_model/vae.py:89-151 (composition + forward contract)."""

    encoder_name: str = "wideresnet-28-2"
    num_input_channels: int = 3
    drop_rate: float = 0.0
    img_size: Tuple[int, int] = (32, 32)
    continuous_latent_dim: int = 128
    disc_latent_dim: int = 10
    sample_temperature: float = 0.67
    small_input: bool = True
    efficient: bool = False  # densenet remat
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    def setup(self):
        self.feature_extractor = build_encoder(
            self.encoder_name, drop_rate=self.drop_rate,
            small_input=self.small_input, efficient=self.efficient,
            dtype=self.dtype, axis_name=self.axis_name, name=None)
        # three inference heads (vae.py:10-15,111-129); f32 for stable heads
        self.cont_mean = TorchDense(self.continuous_latent_dim)
        self.cont_log_sigma = TorchDense(self.continuous_latent_dim)
        self.disc_inference = TorchDense(self.disc_latent_dim)
        kernel = (self.img_size[0] // 32, self.img_size[1] // 32)
        self.feature_reconstructor = Decoder(
            num_channel=self.num_input_channels, kernel_size=kernel,
            dtype=self.dtype, axis_name=self.axis_name)

    def encode(self, x, train: bool = True):
        """features -> pooled -> (mean, log_sigma, log_alpha), all f32."""
        features = self.feature_extractor(x, train=train)
        avg = global_avg_pool(features).astype(jnp.float32)
        norm_mean = self.cont_mean(avg)
        norm_log_sigma = self.cont_log_sigma(avg)
        disc_log_alpha = jnn.log_softmax(self.disc_inference(avg), axis=1)
        return norm_mean, norm_log_sigma, disc_log_alpha

    def decode(self, latent, train: bool = True):
        """Decoder only — used by the serving API's prior-sample generation."""
        recon = self.feature_reconstructor(
            latent.astype(self.dtype or jnp.float32), train=train)
        return recon.astype(jnp.float32)

    def __call__(self, x, *, labels=None, mixup: bool = False,
                 labels_mixup=None, mixup_lam=None, train: bool = True,
                 noise=None):
        """``noise`` optionally injects pre-drawn sampling randomness
        ({"eps", "unif"}, see ops.sampling.joint_latent) for deterministic
        replay — e.g. the cross-framework lockstep tests."""
        norm_mean, norm_log_sigma, disc_log_alpha = self.encode(x, train=train)
        key = self.make_rng("sample")
        latent = sampling.joint_latent(
            key, norm_mean, norm_log_sigma, disc_log_alpha,
            self.sample_temperature,
            labels=labels,
            labels_mixup=labels_mixup if mixup else None,
            mixup_lam=mixup_lam if mixup else None,
            noise=noise,
        )
        recon = self.decode(latent, train=train)
        return recon, norm_mean, norm_log_sigma, disc_log_alpha
