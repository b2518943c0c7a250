"""WideResNet-d-w encoder (WRN-28-2 / WRN-28-10 headline configs).

TPU-native rebuild of /root/reference/shot_vae_model/wideresnet.py:8-114:
pre-activation BN->LeakyReLU->conv3x3 residual units, 3 groups of widths
(16w, 32w, 64w) with depth (d-4)/6 each, stride-2 downsampling at group 2/3,
and a final BN+LeakyReLU transition. Emits NHWC feature maps; the VAE head
global-average-pools them.
"""

from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from shotvae_tpu.models.layers import BatchNorm, TorchConv, leaky_relu


class PreProcess(nn.Module):
    """3x3 s1 conv for 32x32 inputs; 7x7 s2 conv + 3x3 s2 maxpool otherwise.

    Parity: shot_vae_model/wideresnet.py:8-20.
    """

    num_init_features: int = 16
    small_input: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.small_input:
            return TorchConv(self.num_init_features, (3, 3), padding=1,
                             dtype=self.dtype, name="conv0")(x)
        x = TorchConv(self.num_init_features, (7, 7), strides=2, padding=3,
                      dtype=self.dtype, name="conv0")(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class WideResUnit(nn.Module):
    """BN->LeakyReLU->conv3x3->dropout->BN->LeakyReLU->conv3x3 (+1x1 shortcut).

    Parity: shot_vae_model/wideresnet.py:23-49. The 1x1 projection shortcut
    applies when channels or stride change, fed from the *pre-activation*
    input through its own BN+LeakyReLU.
    """

    features: int
    stride: int = 1
    drop_rate: float = 0.0
    train: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      axis_name=self.axis_name, name="norm1")(x)
        h = leaky_relu(h)
        h = TorchConv(self.features, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not self.train)(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      axis_name=self.axis_name, name="norm2")(h)
        h = leaky_relu(h)
        h = TorchConv(self.features, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(h)
        if in_features != self.features or self.stride != 1:
            x = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                          axis_name=self.axis_name, name="shortcut_norm")(x)
            x = leaky_relu(x)
            x = TorchConv(self.features, (1, 1), strides=self.stride,
                          use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
        return h + x


class WideResNet(nn.Module):
    """The full encoder trunk. Parity: shot_vae_model/wideresnet.py:68-114."""

    depth: int = 28
    width: int = 2
    num_init_features: int = 16
    drop_rate: float = 0.0
    small_input: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @property
    def num_feature_channel(self) -> int:
        return 64 * self.width

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert (self.depth - 4) % 6 == 0, "depth should be 6n+4"
        block_depth = (self.depth - 4) // 6
        widths = [16 * self.width, 32 * self.width, 64 * self.width]
        x = PreProcess(self.num_init_features, self.small_input,
                       dtype=self.dtype, name="pre_process")(x)
        for group, features in enumerate(widths):
            for i in range(block_depth):
                stride = 2 if (group > 0 and i == 0) else 1
                x = WideResUnit(features, stride, self.drop_rate, train,
                                self.dtype, self.axis_name,
                                name=f"block{group + 1}_unit{i + 1}")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      axis_name=self.axis_name, name="transition_norm")(x)
        return leaky_relu(x)


def parse_wideresnet_name(name: str) -> tuple[int, int]:
    """'wideresnet-28-2' -> (28, 2). Parity: wideresnet.py:110-112 (sans eval)."""
    depth, width = re.findall(r"\d+", name)
    return int(depth), int(width)
