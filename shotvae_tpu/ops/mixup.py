"""On-device mixup and label-smoothing interpolation for SHOT-VAE.

Functional equivalent of ``/root/reference/lib/utils/mixup.py:5-99``, with the
O(B^2) python double loop of optimal-match mixup replaced by a fully
vectorised pairwise-Gaussian-KL (three MXU matmuls) + ``lax.top_k`` — identical
math, feasible at B=768 on TPU. Everything takes an explicit PRNG key and runs
inside the jitted train step (the reference sampled lambda on the host with
numpy; here it is a traced scalar).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixupBatch(NamedTuple):
    """Interpolated inputs and posterior targets (all stop-gradient targets)."""

    image: jax.Array        # lam * x + (1-lam) * x[perm]
    z_mean: jax.Array       # interpolated posterior mean
    z_sigma: jax.Array      # interpolated posterior *sigma* (not log-sigma)
    disc_alpha: jax.Array   # interpolated posterior *probabilities* (not log)
    partner_labels: jax.Array | None  # labels[perm] (label_smoothing only)
    lam: jax.Array          # scalar interpolation weight


def pairwise_gaussian_kl(z_mean, z_log_sigma):
    """KL[N_i || N_j] for every ordered pair, shape (B, B).

    Identical math to the reference's per-pair helper
    (lib/utils/mixup.py:93-99) — sum(ls_j - ls_i) + 0.5 sum(s_i^2/s_j^2)
    + 0.5 sum((mu_i-mu_j)^2/s_j^2) - 0.5 d — vectorised as matmuls so XLA
    tiles it onto the MXU (the dead-code prototype lived in
    lib/utils/calculate_dist.py:94-107).
    """
    z_mean = jnp.asarray(z_mean, jnp.float32)
    z_log_sigma = jnp.asarray(z_log_sigma, jnp.float32)
    dim = z_mean.shape[1]
    var = jnp.exp(2.0 * z_log_sigma)          # sigma_i^2        (B, D)
    inv_var = jnp.exp(-2.0 * z_log_sigma)     # 1 / sigma_j^2    (B, D)
    ls_row = jnp.sum(z_log_sigma, axis=1)     # (B,)
    term_logdet = ls_row[None, :] - ls_row[:, None]
    term_trace = 0.5 * (var @ inv_var.T)
    mu_sq = z_mean * z_mean
    term_mahal = 0.5 * (
        mu_sq @ inv_var.T
        - 2.0 * (z_mean @ (z_mean * inv_var).T)
        + jnp.sum(mu_sq * inv_var, axis=1)[None, :]
    )
    return term_logdet + term_trace + term_mahal - 0.5 * dim


def optimal_match_index(z_mean, z_log_sigma):
    """Partner = the smallest-KL *other* sample per row (mixup.py:10-18).

    The reference takes the second-smallest entry because the diagonal
    KL(i,i)=0 is always the smallest. The matmul-expanded pairwise KL has
    ~1e-2 float32 cancellation noise on the diagonal, so we mask self out
    explicitly instead — identical semantics, robust numerics.
    """
    kl = pairwise_gaussian_kl(z_mean, z_log_sigma)
    batch = kl.shape[0]
    kl = kl + jnp.eye(batch, dtype=kl.dtype) * jnp.float32(3.4e38)
    return jnp.argmin(kl, axis=1)


def mixup_vae_data(key, image, z_mean, z_log_sigma, disc_log_alpha, *,
                   optimal_match: bool = False, lam=None,
                   index=None) -> MixupBatch:
    """Posterior-interpolation mixup for the unlabeled stream.

    Parity: lib/utils/mixup.py:5-26 — lam ~ Beta(2,2); partner from a random
    permutation or the optimal KL match; interpolates the image, z-mean,
    z-*sigma* and y-*alpha* (probability space, not log space).
    ``lam``/``index`` override the draws (deterministic replay).
    """
    key_lam, key_perm = jax.random.split(key)
    if lam is None:
        lam = jax.random.beta(key_lam, 2.0, 2.0, dtype=jnp.float32)
    if index is None:
        # an injected ``index`` wins even under optimal_match — replay must
        # pin the partner, never silently recompute it
        if optimal_match:
            index = optimal_match_index(z_mean, z_log_sigma)
        else:
            index = jax.random.permutation(key_perm, image.shape[0])
    return _interpolate(image, z_mean, z_log_sigma, disc_log_alpha, index, lam,
                        labels=None)


def label_smoothing(key, image, z_mean, z_log_sigma, disc_log_alpha, labels, *,
                    epsilon: float = 0.1, lam=None,
                    index=None) -> MixupBatch:
    """Label-smoothing-strength interpolation for the labeled stream.

    Parity: lib/utils/mixup.py:29-41 — lam ~ Beta(eps, eps) (near 0/1 for
    small eps), random-permutation partner, and additionally returns the
    partner's hard label. ``lam``/``index`` override the draws
    (deterministic replay).
    """
    key_lam, key_perm = jax.random.split(key)
    if lam is None:
        if epsilon > 0:
            lam = jax.random.beta(key_lam, epsilon, epsilon,
                                  dtype=jnp.float32)
        else:
            lam = jnp.float32(1.0)
    if index is None:
        index = jax.random.permutation(key_perm, image.shape[0])
    return _interpolate(image, z_mean, z_log_sigma, disc_log_alpha, index, lam,
                        labels=labels)


def _classic_mix(key, image, alpha):
    key_lam, key_perm = jax.random.split(key)
    if alpha > 0:
        lam = jax.random.beta(key_lam, alpha, alpha, dtype=jnp.float32)
    else:
        lam = jnp.float32(1.0)
    index = jax.random.permutation(key_perm, image.shape[0])
    mixed = lam * image + (1.0 - lam) * jnp.take(image, index, axis=0)
    return mixed, index, lam


def mixup_data(key, image, label, alpha: float = 1.0):
    """Classic input mixup: returns (mixed_image, label_a, label_b, lam).

    Parity: lib/utils/mixup.py:77-90 — unused by the reference drivers but
    part of its public surface.
    """
    mixed, index, lam = _classic_mix(key, image, alpha)
    return mixed, label, jnp.take(label, index, axis=0), lam


def mixup_raw_labeled_data(key, image, label, label_weight, alpha: float = 1.0):
    """Input mixup carrying per-item label weights (mixup.py:44-64); one
    shared permutation for labels and weights."""
    mixed, index, lam = _classic_mix(key, image, alpha)
    return (mixed, label, jnp.take(label, index, axis=0), label_weight,
            jnp.take(label_weight, index, axis=0), lam)


def mixup_criterion(criterion, prediction, label_a, label_b, lam):
    """lam * criterion(label_a, pred) + (1-lam) * criterion(label_b, pred).

    Parity: lib/utils/mixup.py:67-75 (note the reference's argument order —
    labels first — is preserved).
    """
    return lam * criterion(label_a, prediction) + (1.0 - lam) * criterion(
        label_b, prediction)


def _interpolate(image, z_mean, z_log_sigma, disc_log_alpha, index, lam, *, labels):
    lam = jnp.asarray(lam, jnp.float32)
    index = jnp.asarray(index)
    lam_img = lam.astype(image.dtype)
    mixed_image = lam_img * image + (1.0 - lam_img) * jnp.take(image, index, axis=0)
    mixed_z_mean = lam * z_mean + (1.0 - lam) * jnp.take(z_mean, index, axis=0)
    sigma = jnp.exp(z_log_sigma)
    mixed_sigma = lam * sigma + (1.0 - lam) * jnp.take(sigma, index, axis=0)
    alpha = jnp.exp(disc_log_alpha)
    mixed_alpha = lam * alpha + (1.0 - lam) * jnp.take(alpha, index, axis=0)
    partner = None if labels is None else jnp.take(labels, index, axis=0)
    return MixupBatch(mixed_image, mixed_z_mean, mixed_sigma, mixed_alpha,
                      partner, lam)
