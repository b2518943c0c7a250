"""DCGAN-style transposed-convolution decoder.

TPU-native rebuild of /root/reference/shot_vae_model/decoder.py:4-69: a
ConvTranspose from the (B, latent) sample to ``16*num_feature`` channels at
``img_size/32`` resolution, then four ConvTranspose(k4, s2) + BN + ReLU
stages halving channels 1024->512->256->128->64, and a final ConvTranspose to
``num_channel`` with NO output activation — the decoder emits logits; sigmoid
is applied in the loss / visualisation only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from shotvae_tpu.models.layers import BatchNorm, TorchConvTranspose, relu


class Decoder(nn.Module):
    num_channel: int = 3
    num_feature: int = 64
    kernel_size: Tuple[int, int] = (1, 1)  # img_size / 32 (vae.py:134)
    train_flag_name: str = "train"
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, latent_sample, train: bool = True):
        # (B, D) -> (B, 1, 1, D): the "deconv from a 1x1 map" DCGAN idiom
        x = latent_sample[:, None, None, :]

        def up(feats, kernel, strides, padding, name):
            return TorchConvTranspose(
                feats, kernel, strides=strides, padding=padding,
                use_bias=False, dtype=self.dtype, name=name,
            )

        def bn(name):
            return BatchNorm(use_running_average=not train, dtype=self.dtype,
                             axis_name=self.axis_name, name=name)

        # stage 0: 1x1 -> kernel_size map (torch ConvT k=ks, s=1, p=0 == VALID)
        x = up(self.num_feature * 16, self.kernel_size, (1, 1), "VALID", "up0")(x)
        x = relu(bn("norm0")(x))
        # stages 1-4: spatial x2 each (torch ConvT k4 s2 p1 == SAME here)
        feats = [self.num_feature * 8, self.num_feature * 4,
                 self.num_feature * 2, self.num_feature]
        for i, f in enumerate(feats, start=1):
            x = up(f, (4, 4), (2, 2), "SAME", f"up{i}")(x)
            x = relu(bn(f"norm{i}")(x))
        # output logits, no activation (decoder.py:55-62)
        return up(self.num_channel, (4, 4), (2, 2), "SAME", "up5")(x)
