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
    """nn.ConvTranspose with torch-default init; k4/s2/SAME runs subpixel.

    ``lax.conv_transpose`` lowers stride-2 upsampling to a conv with
    ``lhs_dilation=2`` — 3/4 of the MXU multiplies hit interleaved zeros,
    measured ~11 TFLOP/s on the decoder stack (docs/PERF.md round 2). The
    upsample factors exactly into FOUR 2x2 sub-kernel convs (one per output
    parity (a,b): row taps [a, a+2], col taps [b, b+2] of the 4x4 kernel),
    evaluated here as ONE dense k2 conv with 4x output channels on a
    (1,1)-padded input, followed by shifted slices + depth-to-space. Same
    parameters ("kernel" (4,4,in,out), "bias"), same math to float rounding;
    other kernel/stride/padding combos fall through to flax.
    """

    kernel_init: Callable = torch_default_init
    bias_init: Callable = torch_bias_init
    subpixel: bool = True

    @nn.compact
    def __call__(self, inputs):
        from flax.linen.dtypes import promote_dtype
        from jax import lax

        k = tuple(self.kernel_size) if not isinstance(self.kernel_size, int) \
            else (self.kernel_size,) * 2
        s = ((self.strides,) * 2 if isinstance(self.strides, int)
             else tuple(self.strides) if self.strides else (1, 1))
        kd = self.kernel_dilation
        no_dilation = kd is None or all(d == 1 for d in (
            (kd,) * 2 if isinstance(kd, int) else tuple(kd)))
        if not (self.subpixel and k == (4, 4) and s == (2, 2)
                and self.padding == "SAME" and not self.transpose_kernel
                and no_dilation and inputs.ndim == 4):
            return super().__call__(inputs)

        cin, cout = inputs.shape[-1], self.features
        kernel = self.param("kernel", self.kernel_init, (4, 4, cin, cout),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (cout,), self.param_dtype)
                if self.use_bias else None)
        inputs, kernel, bias = promote_dtype(inputs, kernel, bias,
                                             dtype=self.dtype)
        # (2,2,cin,4*cout): output-channel blocks ordered (a,b) = parity of
        # the output row/col each block fills
        subk = jnp.concatenate(
            [kernel[a::2, b::2] for a in (0, 1) for b in (0, 1)], axis=-1)
        xp = jnp.pad(inputs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        o = lax.conv_general_dilated(
            xp, subk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision)
        b_, h, w = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        parts = [o[:, a:h + a, b2:w + b2, i * cout:(i + 1) * cout]
                 for i, (a, b2) in enumerate(
                     [(0, 0), (0, 1), (1, 0), (1, 1)])]
        t = jnp.stack(parts, axis=3).reshape(b_, h, w, 2, 2, cout)
        out = t.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, cout)
        if bias is not None:
            out = out + bias.reshape((1,) * 3 + (-1,))
        return out


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
