"""Fused joint latent sampling with the TPU hardware PRNG.

One kernel draws the Gaussian reparameterisation z = mu + sigma * eps
(Box-Muller over hardware random bits) AND the Gumbel-softmax y
(vae.py:58-86 semantics) and writes the concatenated [z ; y] decoder input —
replacing four separate RNG + elementwise ops and their HBM round-trips.

Used on the unlabeled path; labeled one-hot substitution remains a where()
in the caller (ops.sampling.discrete_latent). Matching jnp reference:
``fused_joint_sample_reference`` (identical distributions, different
bitstreams — tests compare moments, not bits).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shotvae_tpu.ops.sampling import GUMBEL_EPS

_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)


def _uniform(shape):
    """U[0,1) from the 24 high bits of hardware random words.

    Mosaic cannot cast uint32->f32 directly; the >>8 result fits int32.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV_2_24


def _sample_kernel(temperature, cont_dim, seed_ref, mean_ref, log_sigma_ref,
                   log_alpha_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    # Gaussian: Box-Muller (r*cos(theta)); u1 nudged off zero
    u1 = _uniform(mean_ref.shape)
    u2 = _uniform(mean_ref.shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1 + 1e-12))
    eps = r * jnp.cos(_TWO_PI * u2)
    z = mean_ref[:] + jnp.exp(log_sigma_ref[:]) * eps
    out_ref[:, :cont_dim] = z
    # Gumbel-softmax (vae.py:58-73 construction incl. EPS placement)
    u = _uniform(log_alpha_ref.shape)
    gumbel = -jnp.log(-jnp.log(u + GUMBEL_EPS) + GUMBEL_EPS)
    logit = (log_alpha_ref[:] + gumbel) / temperature
    logit = logit - jnp.max(logit, axis=1, keepdims=True)
    e = jnp.exp(logit)
    out_ref[:, cont_dim:] = e / jnp.sum(e, axis=1, keepdims=True)


def fused_joint_sample(seed, mean, log_sigma, log_alpha,
                       temperature: float = 0.67):
    """[z ; y] sample, shape (B, Dc + Dd). ``seed``: int32 scalar array."""
    b, dc = mean.shape
    dd = log_alpha.shape[1]
    return pl.pallas_call(
        partial(_sample_kernel, float(temperature), dc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dc + dd), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1), mean.astype(jnp.float32),
      log_sigma.astype(jnp.float32), log_alpha.astype(jnp.float32))


def fused_joint_sample_reference(key, mean, log_sigma, log_alpha,
                                 temperature: float = 0.67):
    """jax.random equivalent (ops.sampling.joint_latent, unlabeled path)."""
    from shotvae_tpu.ops import sampling

    return sampling.joint_latent(key, mean, log_sigma, log_alpha, temperature)
