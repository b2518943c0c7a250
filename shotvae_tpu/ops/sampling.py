"""Reparameterised sampling: Gaussian, Gumbel-softmax, label substitution.

Functional equivalent of the reference ``Sample`` module
(/root/reference/shot_vae_model/vae.py:18-86) and the smooth-VAE
reparameterisers (/root/reference/smooth_vae_model/mnist_vae.py:139-240),
with explicit ``jax.random`` key threading instead of stateful torch RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn

GUMBEL_EPS = 1e-12  # parity: vae.py:68 / mnist_vae.py:6


def sample_gaussian(key, mean, log_sigma, *, eps=None):
    """z = mu + exp(log_sigma) * eps,  eps ~ N(0, I). Parity: vae.py:75-86.

    ``eps`` overrides the draw (deterministic replay / cross-framework
    lockstep testing).
    """
    if eps is None:
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(log_sigma) * eps.astype(mean.dtype)


def sample_gaussian_logvar(key, mean, logvar, *, eps=None):
    """z = mu + exp(0.5*logvar) * eps — smooth-VAE convention (mnist_vae.py:192-208).

    ``eps`` overrides the gaussian draw (deterministic replay / lockstep).
    """
    if eps is None:
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(0.5 * logvar) * eps.astype(mean.dtype)


def sample_gumbel_softmax(key, log_alpha, temperature, *, unif=None):
    """Gumbel-softmax sample from log-probabilities. Parity: vae.py:58-73.

    Uses the reference's exact construction: u ~ U[0,1),
    g = -log(-log(u + EPS) + EPS), softmax((log_alpha + g) / T).
    ``unif`` overrides the uniform draw (deterministic replay).
    """
    if unif is None:
        unif = jax.random.uniform(key, log_alpha.shape, dtype=log_alpha.dtype)
    unif = unif.astype(log_alpha.dtype)
    gumbel = -jnp.log(-jnp.log(unif + GUMBEL_EPS) + GUMBEL_EPS)
    return jnn.softmax((log_alpha + gumbel) / temperature, axis=1)


def sample_gumbel_softmax_probs(key, alpha, temperature, *, unif=None):
    """Gumbel-softmax from probabilities (smooth-VAE convention, mnist_vae.py:210-228)."""
    return sample_gumbel_softmax(key, jnp.log(alpha + GUMBEL_EPS), temperature,
                                 unif=unif)


def label_onehot(labels, num_classes: int, dtype=jnp.float32):
    return jnn.one_hot(labels, num_classes, dtype=dtype)


def discrete_latent(key, disc_log_alpha, temperature, *, labels=None,
                    labels_mixup=None, mixup_lam=None, unif=None):
    """The discrete half of ``Sample.forward`` (vae.py:38-52).

    labeled:          ground-truth one-hot replaces the sample;
    labeled + mixup:  convex combo of the two one-hots with ``mixup_lam``;
    unlabeled:        gumbel-softmax sample.

    A label of ``-1`` marks an unlabeled sample within a mixed batch (used by
    the fused two-stream step): those rows fall back to the gumbel sample.
    jnn.one_hot maps out-of-range labels to all-zero rows, so the mask is
    exactly "any one-hot bit set".
    """
    num_classes = disc_log_alpha.shape[1]
    if labels is None:
        return sample_gumbel_softmax(key, disc_log_alpha, temperature,
                                     unif=unif)
    c = label_onehot(labels, num_classes, disc_log_alpha.dtype)
    if labels_mixup is not None:
        c_b = label_onehot(labels_mixup, num_classes, disc_log_alpha.dtype)
        c = mixup_lam * c + (1.0 - mixup_lam) * c_b
    labeled_mask = jnp.asarray(labels) >= 0
    gumbel = sample_gumbel_softmax(key, disc_log_alpha, temperature, unif=unif)
    return jnp.where(labeled_mask[:, None], c, gumbel)


def joint_latent(key, norm_mean, norm_log_sigma, disc_log_alpha, temperature, *,
                 labels=None, labels_mixup=None, mixup_lam=None, noise=None):
    """[z ; y] concatenation fed to the decoder. Parity: vae.py:36-56.

    Returns shape (B, D_cont + D_disc); the decoder reshapes to (B,1,1,D) in
    NHWC itself. ``noise`` optionally injects pre-drawn randomness for
    deterministic replay: a dict with "eps" (gaussian, shape of mean) and/or
    "unif" (gumbel uniforms, shape of log_alpha).
    """
    noise = noise or {}
    key_z, key_y = jax.random.split(key)
    z = sample_gaussian(key_z, norm_mean, norm_log_sigma,
                        eps=noise.get("eps"))
    y = discrete_latent(key_y, disc_log_alpha, temperature, labels=labels,
                        labels_mixup=labels_mixup, mixup_lam=mixup_lam,
                        unif=noise.get("unif"))
    return jnp.concatenate([z, y], axis=1)


def eval_discrete_onehot(alpha):
    """Eval-mode discrete sample: argmax one-hot (mnist_vae.py:230-240)."""
    idx = jnp.argmax(alpha, axis=1)
    return label_onehot(idx, alpha.shape[1], alpha.dtype)
