"""Pre-activation ResNet-18/34/50/101/152 encoders.

TPU-native rebuild of /root/reference/shot_vae_model/preactresnet.py:4-133:
basic (expansion 1) and bottleneck (expansion 4) pre-activation units, four
block groups doubling width, downsampling at every group except the first,
and a final BN+ReLU transition (ReLU here, not LeakyReLU).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from shotvae_tpu.models.layers import BatchNorm, TorchConv, relu
from shotvae_tpu.models.wideresnet import PreProcess


class PreActUnit(nn.Module):
    """Basic or bottleneck pre-activation unit (preactresnet.py:19-65).

    The projection shortcut (when shape changes) goes through BN (but no
    ReLU — the reference comments it out) then a strided 1x1 conv.
    """

    features: int
    expansion: int = 1
    stride: int = 1
    drop_rate: float = 0.0
    train: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out_features = self.features * self.expansion
        in_features = x.shape[-1]

        def bn(name):
            return BatchNorm(use_running_average=not self.train,
                             dtype=self.dtype, axis_name=self.axis_name, name=name)

        if self.expansion == 1:
            h = relu(bn("norm1")(x))
            h = TorchConv(self.features, (3, 3), strides=self.stride, padding=1,
                          use_bias=False, dtype=self.dtype, name="conv1")(h)
            if self.drop_rate > 0:
                h = nn.Dropout(self.drop_rate, deterministic=not self.train)(h)
            h = relu(bn("norm2")(h))
            h = TorchConv(self.features, (3, 3), padding=1, use_bias=False,
                          dtype=self.dtype, name="conv2")(h)
        else:
            h = relu(bn("norm1")(x))
            h = TorchConv(self.features, (1, 1), use_bias=False,
                          dtype=self.dtype, name="conv1")(h)
            h = relu(bn("norm2")(h))
            h = TorchConv(self.features, (3, 3), strides=self.stride, padding=1,
                          use_bias=False, dtype=self.dtype, name="conv2")(h)
            if self.drop_rate > 0:
                h = nn.Dropout(self.drop_rate, deterministic=not self.train)(h)
            h = relu(bn("norm3")(h))
            h = TorchConv(out_features, (1, 1), use_bias=False,
                          dtype=self.dtype, name="conv3")(h)

        if self.stride != 1 or in_features != out_features:
            x = bn("shortcut_norm")(x)
            x = TorchConv(out_features, (1, 1), strides=self.stride,
                          use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
        return h + x


class PreActResNet(nn.Module):
    """Full encoder. Parity: preactresnet.py:85-133."""

    expansion: int = 1
    block_config: Sequence[int] = (2, 2, 2, 2)
    num_init_features: int = 64
    drop_rate: float = 0.0
    small_input: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @property
    def num_feature_channel(self) -> int:
        return int(self.num_init_features * (2 ** (len(self.block_config) - 1))
                   * self.expansion)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PreProcess(self.num_init_features, self.small_input,
                       dtype=self.dtype, name="pre_process")(x)
        features = self.num_init_features
        for group, block_depth in enumerate(self.block_config):
            for i in range(block_depth):
                # the reference downsamples at unit 0 of groups 2..4 and keeps
                # stride 1 inside a group (preactresnet.py:71-80,97-99)
                stride = 2 if (group != 0 and i == 0) else 1
                x = PreActUnit(features, self.expansion, stride, self.drop_rate,
                               train, self.dtype, self.axis_name,
                               name=f"block{group + 1}_unit{i + 1}")(x)
            features *= 2
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      axis_name=self.axis_name, name="transition_norm")(x)
        return relu(x)


preactresnet_dict = {
    "preactresnet18": {"expansion": 1, "block_config": (2, 2, 2, 2)},
    "preactresnet34": {"expansion": 1, "block_config": (3, 4, 6, 3)},
    "preactresnet50": {"expansion": 4, "block_config": (3, 4, 6, 3)},
    "preactresnet101": {"expansion": 4, "block_config": (3, 4, 23, 3)},
    "preactresnet152": {"expansion": 4, "block_config": (3, 8, 36, 3)},
}
