"""Shared building blocks: torch-matched initialisers, norm+act helpers.

The reference relies on torch's *default* layer init for the VAE trunk
(shot_vae_model/* has no explicit init) and explicit kaiming/xavier init for
the classifier (classifier_model/wideresnet.py:104-118). Training dynamics at
lr=0.1 are sensitive to these scales, so we reproduce them exactly:

  torch default Conv2d/Linear: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
  for the weight, U(+-1/sqrt(fan_in)) for the bias;
  explicit kaiming_uniform(a=0):  U(+-sqrt(6/fan_in));
  xavier_uniform: U(+-sqrt(6/(fan_in+fan_out))).

All modules take ``dtype`` (compute precision — bfloat16 by default on TPU)
with float32 ``param_dtype``; BatchNorm statistics are always float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import nn as jnn
from jax.nn import initializers

# torch default init for Conv2d / Linear weights:
# uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_default_init = initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_uniform_(a=0): uniform(+-sqrt(6/fan_in))
kaiming_uniform_init = initializers.variance_scaling(2.0, "fan_in", "uniform")
xavier_uniform_init = initializers.xavier_uniform()
# Documented deviation: torch also draws *biases* from U(+-1/sqrt(fan_in));
# fan_in is not derivable from a 1-D bias shape in flax, and nearly every conv
# in the zoo is bias-free under BatchNorm, so biases start at zero here.
torch_bias_init = initializers.zeros

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default negative_slope


def leaky_relu(x):
    return jnn.leaky_relu(x, LEAKY_SLOPE)


def relu(x):
    return jnn.relu(x)


class TorchConv(nn.Conv):
    """nn.Conv with torch-default init and NHWC layout (the flax default)."""

    kernel_init: Callable = torch_default_init
    bias_init: Callable = torch_bias_init


class TorchDense(nn.Dense):
    kernel_init: Callable = torch_default_init
    bias_init: Callable = torch_bias_init


class TorchConvTranspose(nn.ConvTranspose):
    kernel_init: Callable = torch_default_init
    bias_init: Callable = torch_bias_init


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (momentum 0.1, eps 1e-5), f32 stats.

    ``axis_name`` optionally syncs batch statistics across a mesh axis
    (cross-replica BN). The default (None) computes stats over the local
    batch — under GSPMD jit the "local batch" is the global batch, which is
    the sync-BN behaviour; under shard_map it is per-replica, matching
    nn.DataParallel's never-synced BN stats (SURVEY.md §2.6).
    """

    use_running_average: bool = False
    momentum: float = 0.9  # flax momentum = 1 - torch momentum(0.1)
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
            name="bn",
        )(x)


def global_avg_pool(x):
    """AdaptiveAvgPool2d((1,1)) + flatten for NHWC features (vae.py:107,146)."""
    return jnp.mean(x, axis=(1, 2))
