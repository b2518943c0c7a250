"""shotvae_tpu — a TPU-native JAX/Flax/Pallas framework for SHOT-VAE.

A from-scratch rebuild of the capabilities of FengHZ/SHOT-VAE
(arXiv 2011.10684): semi-supervised VAEs with smooth-ELBO and
optimal-interpolation mixup on MNIST / SVHN / CIFAR-10 / CIFAR-100.

Design principles (TPU-first, not a port):
  * all compute paths are pure functions compiled once under ``jax.jit``;
    the reference's 4-forward/2-backward python loop collapses into a single
    ``value_and_grad`` step (see ``shotvae_tpu.train.steps``).
  * NHWC layout, bfloat16 matmul/conv compute with float32 params & losses.
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding (GSPMD);
    XLA inserts the gradient all-reduce over ICI.
  * augmentation (pad/crop/flip, mixup, label smoothing) is executed
    on-device inside the jitted step, keyed by ``jax.random``.
  * hot elementwise chains have Pallas TPU kernels in ``shotvae_tpu.ops.pallas``.

Layering (mirrors reference layer map, SURVEY.md §1):
  cli/       training drivers (argparse surfaces match main_*.py flag-for-flag)
  train/     jitted train & eval steps, epoch loop, schedules
  models/    Flax modules: WideResNet/PreActResNet/DenseNet encoders,
             DCGAN decoder, SHOT/M2 VAE, smooth VAEs, classifier
  ops/       pure losses, sampling, mixup, schedules (+ pallas kernels)
  data/      dataset parsers, SSL splits, host pipeline
  parallel/  mesh construction and sharding policy
  io/        orbax checkpointing, tensorboard logging
  utils/     meters, pairwise-distance metrics
"""

__version__ = "0.1.0"

import jax as _jax

# TPU-native PRNG: the default threefry2x32 is a software counter-based
# generator that costs milliseconds per fused draw on TPU (measured 23 ms
# for the augmentation RNG of one batch); 'rbg' uses the hardware RNG
# instructions and is ~1000x faster for the same draws. Trade-off
# (documented): rbg streams are stable per seed but not bit-identical
# across backends — irrelevant here (the reference has no cross-platform
# RNG contract either).
_jax.config.update("jax_default_prng_impl", "rbg")

# Persistent XLA compile cache, shared by every entry point (CLI mains,
# scripts, tests, the driver contract). The full b768 train step costs
# 40-500 s to compile over the axon tunnel; a process restart (crash
# recovery, resume, repeated benchmarks) pays it again without this.
# Cache failures are non-fatal inside jax (it falls back to compiling).
# Override the location — or disable with an empty value — via
# SHOTVAE_COMPILE_CACHE.
import os as _os

_cache_dir = _os.environ.get("SHOTVAE_COMPILE_CACHE", "/tmp/shotvae_jax_cache")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
