"""Pallas TPU kernels for hot fused ops.

fused_bn_act: training-mode BatchNorm + LeakyReLU as two-pass Pallas
kernels with a custom VJP (the conv+BN+activation epilogue of every WRN /
PreActResNet / DenseNet block).
fused_sample: joint Gaussian + Gumbel-softmax latent sampling using the
TPU hardware PRNG (pltpu.prng_random_bits) in one kernel.

Each kernel has a jnp reference implementation it is tested against
(tests/test_pallas.py) and is integrated behind an opt-in flag; the jnp/XLA
path remains the default wherever XLA's fusion is already at parity.
"""

from shotvae_tpu.ops.pallas.fused_bn_act import bn_leaky_train, bn_act_inference
from shotvae_tpu.ops.pallas.fused_sample import fused_joint_sample

__all__ = ["bn_leaky_train", "bn_act_inference", "fused_joint_sample"]
