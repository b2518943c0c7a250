"""Supervised WideResNet classifier baseline.

TPU-native rebuild of /root/reference/classifier_model/wideresnet.py:68-141:
the same WRN trunk as the VAE encoder plus a BN + LeakyReLU + global-avg-pool
head and a linear classification layer, with the reference's *explicit* init
scheme (kaiming-uniform convs, xavier FC, BN gamma=1 beta=0,
classifier_model/wideresnet.py:104-118). Emits raw logits (the reference
comments out the LogSoftmax; CE is applied in the loss).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from shotvae_tpu.models.layers import global_avg_pool, kaiming_uniform_init, xavier_uniform_init
from shotvae_tpu.models.wideresnet import WideResNet, parse_wideresnet_name


class WideResNetClassifier(nn.Module):
    depth: int = 28
    width: int = 2
    num_classes: int = 10
    drop_rate: float = 0.0
    small_input: bool = True
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        # The reference classifier's head BN+LeakyReLU+avgpool
        # (classifier_model/wideresnet.py:90-96) is the same computation as
        # the shared WRN trunk's final transition + pooling, so the trunk is
        # reused whole.
        trunk = WideResNet(depth=self.depth, width=self.width,
                           drop_rate=self.drop_rate,
                           small_input=self.small_input, dtype=self.dtype,
                           axis_name=self.axis_name, name="encoder")
        features = trunk(x, train=train)
        avg = global_avg_pool(features).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, kernel_init=xavier_uniform_init,
                          bias_init=initializers.zeros, name="fc")(avg)
        return logits


class MLPClassifier(nn.Module):
    """Small conv classifier (reference classifier_model/mlp.py:7-44).

    Dead code in the reference (no driver imports it); ported for inventory
    completeness. Despite the name it is a 3-conv encoder (1->32->64->64,
    k4 s2 p1, ReLU) followed by flatten -> Dense(256) -> ReLU ->
    Dense(num_classes). The reference ctor's ``num_input_channels``,
    ``hidden_unit`` and ``drop_rate`` args are unused there (the commented-out
    true-MLP path) and are not reproduced here.
    """

    num_classes: int = 10
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from shotvae_tpu.models.layers import TorchConv, TorchDense, relu

        for i, ch in enumerate((32, 64, 64)):
            x = relu(TorchConv(ch, (4, 4), strides=2, padding=1,
                               dtype=self.dtype, name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        h = relu(TorchDense(256, dtype=self.dtype, name="fc0")(x))
        return TorchDense(self.num_classes, name="fc1")(
            h.astype(jnp.float32))


def build_classifier(net_name: str, num_classes: int, *, drop_rate: float = 0.0,
                     small_input: bool = True, dtype=None, axis_name=None):
    """'wideresnet-28-2' -> WideResNetClassifier (classifier get_wide_resnet parity)."""
    depth, width = parse_wideresnet_name(net_name)
    return WideResNetClassifier(depth=depth, width=width,
                                num_classes=num_classes, drop_rate=drop_rate,
                                small_input=small_input, dtype=dtype,
                                axis_name=axis_name)


def apply_classifier_init(key, params):
    """Re-initialise conv kernels kaiming-uniform, conv biases to 0.

    The reference's post-construction loop (classifier_model/
    wideresnet.py:104-118) overrides torch defaults: conv weights
    kaiming_uniform(a=0) == U(+-sqrt(6/fan_in)), conv biases 0 (FC and BN are
    already handled by our module definitions). Walks the param pytree and
    re-samples matching leaves.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(flat))
    new_leaves = []
    for k, (path, leaf) in zip(keys, flat):
        names = [getattr(p, "key", "") for p in path]
        is_conv = any("conv" in n or n.startswith("up") for n in names)
        if is_conv and names[-1] == "kernel":
            new_leaves.append(kaiming_uniform_init(k, leaf.shape, leaf.dtype))
        elif is_conv and names[-1] == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
