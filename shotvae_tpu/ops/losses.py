"""ELBO / classification loss terms as pure jnp functions.

Functional equivalent of the reference criterion library
(``/root/reference/lib/criterion.py:8-177``) and the smooth-ELBO trainer's
embedded loss math (``/root/reference/main_smooth_ELBO_mnist.py:227-386``),
re-designed for TPU: every function is shape-polymorphic, side-effect free,
float32 (sum-reductions over 768x3x32x32 tensors would lose precision in
bf16), and safe to call inside one jitted train step.

Reduction convention follows the reference exactly: *sum over elements,
mean over batch* unless stated otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn

# EPS conventions preserved from the reference:
#   1e-12 gumbel / smooth-ELBO entropy (main_smooth_ELBO_mnist.py:13)
#   1e-4 in general KL helpers (lib/criterion.py:154,172)
EPS_ENTROPY = 1e-12
EPS_KL = 1e-4


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def bce_with_logits_sum(logits, targets):
    """Numerically-stable sum-reduced binary cross entropy with logits.

    Same math as ``F.binary_cross_entropy_with_logits(..., reduction="sum")``
    used by the reference (lib/criterion.py:46).
    """
    logits, targets = _f32(logits), _f32(targets)
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.sum(per_elem)


def reconstruction_loss(x, x_recon_logits, *, bce: bool = True, x_sigma: float = 1.0):
    """-log p(x|z,y): BCE-with-logits or Gaussian (MSE of sigmoid) form.

    Parity: lib/criterion.py:44-48 — sum over pixels, mean over batch; the
    MSE branch divides by ``2 * x_sigma**2`` (Gaussian likelihood scale).
    """
    batch = x.shape[0]
    if bce:
        return bce_with_logits_sum(x_recon_logits, x) / batch
    diff = jnn.sigmoid(_f32(x_recon_logits)) - _f32(x)
    return jnp.sum(diff * diff) / (2.0 * batch * (x_sigma**2))


def gaussian_kl_stdnormal(mean, log_sigma):
    """KL[N(mean, sigma^2) || N(0, I)], sum over dims, mean over batch.

    Parity: lib/criterion.py:50-53 (note: parameterised by log *sigma*, not
    log variance).
    """
    mean, log_sigma = _f32(mean), _f32(log_sigma)
    batch = mean.shape[0]
    log_sigma_sq = 2.0 * log_sigma
    return 0.5 * jnp.sum(mean * mean + jnp.exp(log_sigma_sq) - log_sigma_sq - 1.0) / batch


def categorical_kl_uniform(disc_log_alpha, num_classes: int):
    """KL[q(y|x) || Uniform(K)] with q given by log-probabilities.

    Parity: lib/criterion.py:29-30,56 — ``sum exp(la) * (la - log(1/K)) / B``.
    """
    disc_log_alpha = _f32(disc_log_alpha)
    batch = disc_log_alpha.shape[0]
    log_prior = jnp.log(1.0 / num_classes)
    return jnp.sum(jnp.exp(disc_log_alpha) * (disc_log_alpha - log_prior)) / batch


def elbo_terms(x, x_recon_logits, z_mean, z_log_sigma, disc_log_alpha, *,
               num_classes: int, bce: bool = True, x_sigma: float = 1.0):
    """The three VAECriterion outputs: (recon, continuous KL, discrete KL).

    Parity: lib/criterion.py:32-57 (VAECriterion.forward).
    """
    recon = reconstruction_loss(x, x_recon_logits, bce=bce, x_sigma=x_sigma)
    cont_kl = gaussian_kl_stdnormal(z_mean, z_log_sigma)
    disc_kl = categorical_kl_uniform(disc_log_alpha, num_classes)
    return recon, cont_kl, disc_kl


def mi_hinge(kl, mutual_info):
    """|KL - mi| mutual-information hinge (main_shot_vae.py:293-294)."""
    return jnp.abs(kl - mutual_info)


def cls_nll(log_probs, onehot, batch_weight=None):
    """Cross entropy of log-softmax predictions vs (soft) one-hot labels.

    Parity: lib/criterion.py:93-108 (ClsCriterion) including the optional
    per-item 0/1 batch weight.
    """
    log_probs, onehot = _f32(log_probs), _f32(onehot)
    per_item = jnp.sum(log_probs * onehot, axis=1)
    if batch_weight is not None:
        per_item = per_item * _f32(batch_weight)
    return -jnp.mean(per_item)


def gaussian_kl_general(mean_q, log_sigma_q, mean_p=None, sigma_p=None):
    """KL[N_q || N(0,I)] or KL[N_q || N_p] with sigma_p given as *sigma*.

    Parity: lib/criterion.py:134-158 (KLNormCriterion) including the 1e-4
    stabiliser inside ``log(sigma_p + 1e-4)``.
    """
    mean_q, log_sigma_q = _f32(mean_q), _f32(log_sigma_q)
    batch = mean_q.shape[0]
    if mean_p is None or sigma_p is None:
        return gaussian_kl_stdnormal(mean_q, log_sigma_q)
    mean_p, sigma_p = _f32(mean_p), _f32(sigma_p)
    log_var_q = 2.0 * log_sigma_q
    var_q = jnp.exp(log_var_q)
    log_var_p = 2.0 * jnp.log(sigma_p + EPS_KL)
    var_p = sigma_p**2
    kl = 0.5 * jnp.sum(
        log_var_p - log_var_q + var_q / var_p + (mean_q - mean_p) ** 2 / var_p - 1.0
    )
    return kl / batch


def categorical_kl(disc_log_q, disc_p, qp_order: bool = True):
    """KL between categoricals; q given in log space, p in probabilities.

    Parity: lib/criterion.py:161-177 (KLDiscCriterion) including 1e-4.
    qp_order=True computes KL[q||p]; False computes KL[p||q].
    """
    disc_log_q, disc_p = _f32(disc_log_q), _f32(disc_p)
    batch = disc_log_q.shape[0]
    disc_log_p = jnp.log(disc_p + EPS_KL)
    if qp_order:
        return jnp.sum(jnp.exp(disc_log_q) * (disc_log_q - disc_log_p)) / batch
    return jnp.sum(disc_p * (disc_log_p - disc_log_q)) / batch


def smoothed_onehot(labels, num_classes: int, smoothing: float = 0.001):
    """One-hot with the reference's monitoring smoothing (main_shot_vae.py:331-337).

    Label position gets ``1 - smoothing``; the rest share
    ``smoothing / (K - 1)`` each.
    """
    off = smoothing / (num_classes - 1)
    onehot = jnn.one_hot(labels, num_classes, dtype=jnp.float32)
    return onehot * (1.0 - smoothing - off) + off


def inference_kl_metric(disc_log_alpha, labels, num_classes: int):
    """Monitoring-only KL(q(y|x) || smoothed true label), mean over batch.

    Parity: main_shot_vae.py:331-339 (uses the labels of "unlabeled" data —
    a metric, never a gradient).
    """
    disc_log_alpha = _f32(disc_log_alpha)
    batch = disc_log_alpha.shape[0]
    smooth = smoothed_onehot(labels, num_classes)
    alpha = jnp.exp(disc_log_alpha)
    return jnp.sum(alpha * disc_log_alpha - alpha * jnp.log(smooth)) / batch


# ---------------------------------------------------------------------------
# Smooth-ELBO (JointVAE-style) loss terms.
# Reference: main_smooth_ELBO_mnist.py:227-386 (Trainer._loss_function etc.)
# Conventions differ from VAECriterion: continuous latent is parameterised by
# log *variance*; the discrete head emits *probabilities* (post-softmax).
# ---------------------------------------------------------------------------


def smooth_recon_loss(x, x_recon):
    """Per-sample-sum MSE: mse_mean * num_pixels (main_smooth_ELBO_mnist.py:256-259).

    ``x_recon`` is the decoder output (already tanh-activated in the smooth
    VAEs), not logits.
    """
    x, x_recon = _f32(x), _f32(x_recon)
    batch = x.shape[0]
    num_pixels = x.size // batch
    return jnp.mean((x_recon - x) ** 2) * num_pixels


def kl_normal_loss(mean, logvar):
    """KL[N||N(0,I)] from (mean, log-variance): mean over batch, sum over dims.

    Parity: main_smooth_ELBO_mnist.py:303-330 (_kl_normal_loss). Also returns
    the per-dimension batch-mean KL for observability (the reference records
    kl_loss_cont_i per dimension).
    """
    mean, logvar = _f32(mean), _f32(logvar)
    kl_values = -0.5 * (1.0 + logvar - mean**2 - jnp.exp(logvar))
    kl_means = jnp.mean(kl_values, axis=0)
    return jnp.sum(kl_means), kl_means


def kl_discrete_loss(alpha):
    """KL[Cat(alpha) || Uniform]: log(K) + mean-over-batch negative entropy.

    Parity: main_smooth_ELBO_mnist.py:361-386 (_kl_discrete_loss); alpha are
    probabilities, EPS=1e-12.
    """
    alpha = _f32(alpha)
    disc_dim = alpha.shape[-1]
    neg_entropy = jnp.sum(alpha * jnp.log(alpha + EPS_ENTROPY), axis=1)
    return jnp.log(float(disc_dim)) + jnp.mean(neg_entropy)


def kl_multiple_discrete_loss(alphas):
    """Sum of uniform-KLs over a list of categorical heads.

    Parity: main_smooth_ELBO_mnist.py:332-359.
    """
    return sum(kl_discrete_loss(a) for a in alphas)


def capacity_loss(kl, step, cap_min, cap_max, num_iters, gamma, theoretical_max=None):
    """gamma * |C(t) - KL| with linearly annealed capacity C(t).

    Parity: main_smooth_ELBO_mnist.py:262-282; ``theoretical_max`` caps the
    discrete capacity at sum(log K_i).
    """
    cap = (cap_max - cap_min) * _f32(step) / float(num_iters) + cap_min
    cap = jnp.minimum(cap, cap_max)
    if theoretical_max is not None:
        cap = jnp.minimum(cap, theoretical_max)
    return gamma * jnp.abs(cap - kl)


@jax.custom_vjp
def _bce_probs_elem(probs, targets):
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1mp)


def _bce_probs_elem_fwd(probs, targets):
    return _bce_probs_elem(probs, targets), (probs, targets)


def _bce_probs_elem_bwd(res, g):
    # torch binary_cross_entropy_backward: grad * (p - t) / max(p*(1-p), 1e-12)
    # — finite (huge, not NaN) at p in {0, 1}. The naive VJP of the clamped
    # forward is 0 * (1/0) = NaN there, which silently NaN'd the params the
    # first time a softmax head saturated (confident q(y|x) underflows the
    # non-max probs to exactly 0 in f32).
    probs, targets = res
    denom = jnp.maximum(probs * (1.0 - probs), 1e-12)
    d_p = g * (probs - targets) / denom
    d_t = g * (jnp.maximum(jnp.log1p(-probs), -100.0)
               - jnp.maximum(jnp.log(probs), -100.0))
    return d_p, d_t


_bce_probs_elem.defvjp(_bce_probs_elem_fwd, _bce_probs_elem_bwd)


def bce_probs_mean(probs, targets):
    """Mean-reduced BCE on probabilities (main_smooth_ELBO_svhn.py / mnist:288-290).

    Matches ``F.binary_cross_entropy`` semantics in BOTH directions: the
    forward clamps log terms at -100 like torch, and the backward uses
    torch's ``(p - t) / max(p*(1-p), 1e-12)`` so saturated probabilities
    (p == 0 or 1) produce torch's large-but-finite gradient instead of NaN.
    """
    return jnp.mean(_bce_probs_elem(_f32(probs), _f32(targets)))
