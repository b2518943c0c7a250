"""Batched pairwise distribution/vector distances.

Counterpart of /root/reference/lib/utils/calculate_dist.py:5-160 (pairwise
Gaussian-KL / Wasserstein-2 / Euclidean / cosine). Dead code in the
reference (imported nowhere) but part of its public component inventory;
here the Gaussian-KL variant is *live* — it backs optimal-match mixup
(shotvae_tpu.ops.mixup.pairwise_gaussian_kl). Everything is vectorised as
matmuls for the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from shotvae_tpu.ops.mixup import pairwise_gaussian_kl  # noqa: F401  re-export


def pairwise_euclidean_sq(a, b):
    """||a_i - b_j||^2 for (N,D),(M,D) -> (N,M), matmul-expanded."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    aa = jnp.sum(a * a, axis=1)[:, None]
    bb = jnp.sum(b * b, axis=1)[None, :]
    return jnp.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def pairwise_euclidean(a, b):
    return jnp.sqrt(pairwise_euclidean_sq(a, b) + 1e-12)


def pairwise_cosine(a, b):
    """Cosine *similarity* matrix (N,M)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
    b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-12)
    return a @ b.T


def pairwise_gaussian_wasserstein2(mean_a, log_sigma_a, mean_b, log_sigma_b):
    """Squared W2 between diagonal Gaussians for every ordered pair.

    W2^2 = ||mu_a - mu_b||^2 + sum_d (sigma_a_d - sigma_b_d)^2.
    """
    w_mean = pairwise_euclidean_sq(mean_a, mean_b)
    w_sigma = pairwise_euclidean_sq(jnp.exp(log_sigma_a), jnp.exp(log_sigma_b))
    return w_mean + w_sigma
