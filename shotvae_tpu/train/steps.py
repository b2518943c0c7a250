"""Jitted train & eval steps for all four trainer families.

Each ``make_*_step`` returns a pure function suitable for ``jax.jit`` (the
callers in ``shotvae_tpu.parallel``/``shotvae_tpu.train.loop`` jit it with
mesh shardings). The SHOT-VAE step fuses the reference's per-iteration
4 forwards + 2 backwards (main_shot_vae.py:280-366) into ONE
``value_and_grad`` over ``loss_supervised + loss_unsupervised`` — same math
(gradient accumulation of two .backward() calls == gradient of the sum), one
compiled program, no host round-trips. Augmentation (uint8 -> float,
pad/crop/flip) happens inside the step.

BatchNorm running stats are threaded through the 4 forwards sequentially,
matching the reference's 4 train-mode forwards each updating BN stats.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import nn as jnn

from shotvae_tpu.data.pipeline import augment_batch, to_float
from shotvae_tpu.ops import losses, mixup
from shotvae_tpu.train.state import TrainState


class AugmentConfig(NamedTuple):
    """On-device train-time augmentation policy (lib/dataloader.py parity)."""

    pad: int = 4
    crop: int = 32
    flip: bool = True
    enabled: bool = True
    normalize: bool = False  # [-1,1] for the smooth (tanh) pipeline


def _prepare(key, images_u8, aug: AugmentConfig, train: bool):
    x = to_float(images_u8, normalize=aug.normalize)
    if train and aug.enabled:
        x = augment_batch(key, x, pad=aug.pad, crop=aug.crop, flip=aug.flip)
    return x


def _fold_replica_key(key, axis_name):
    """Decorrelate per-replica randomness (noise, augment, mixup draws)."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def _cross_replica(grads, new_bs, metrics, axis_name, bn_stats):
    """Per-replica-BN collectives: ONE gradient pmean; BN stats per policy.

    ``nn.DataParallel`` (shot_vae_model/vae.py:96-132) never syncs BatchNorm:
    each replica normalises with its own local-batch statistics, and the
    running stats that survive are those of replica 0 (the live module).
    ``bn_stats='replica0'`` reproduces that exactly; ``'mean'`` averages the
    per-replica EMA updates instead (a lower-variance, still-unsynced-forward
    alternative). Gradients are pmean'd — identical math to DataParallel's
    gather-loss-then-backward since every per-stream reduction divides by the
    (equal) local batch size.
    """
    grads = jax.lax.pmean(grads, axis_name)
    metrics = jax.tree_util.tree_map(
        lambda m: jax.lax.pmean(m, axis_name), metrics)
    if bn_stats == "replica0":
        idx = jax.lax.axis_index(axis_name)
        new_bs = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(
                jnp.where(idx == 0, x, jnp.zeros_like(x)), axis_name),
            new_bs)
    elif bn_stats == "mean":
        new_bs = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis_name), new_bs)
    else:
        raise ValueError(f"unknown bn_stats policy {bn_stats!r}")
    return grads, new_bs, metrics


def gather_mixup(axis_name, fn, key, arrays, local_batch, **kw):
    """Run a mixup/label-smoothing draw over the GLOBAL batch under shard_map.

    DataParallel parity for the per-replica-BN mode: the reference's mixup
    operates on tensors nn.DataParallel has gathered to device 0, so lambda
    and the partner permutation span the GLOBAL batch
    (main_shot_vae.py:297-322); the mixed batch is then re-scattered by the
    next forward. Equivalent here: ``all_gather`` the (small) inputs along
    ``axis_name``, compute the interpolation with a replica-SHARED key
    (identical draw on every replica), and slice this replica's rows back
    out. ``fn`` is ``mixup.label_smoothing`` or ``mixup.mixup_vae_data``.
    """
    g = [jax.lax.all_gather(a, axis_name, axis=0, tiled=True) for a in arrays]
    out = fn(key, *g, **kw)
    r = jax.lax.axis_index(axis_name)

    def sl(t):
        if t is None:
            return None
        return jax.lax.dynamic_slice_in_dim(t, r * local_batch, local_batch,
                                            axis=0)

    return mixup.MixupBatch(sl(out.image), sl(out.z_mean), sl(out.z_sigma),
                            sl(out.disc_alpha), sl(out.partner_labels),
                            out.lam)


def _inject_noise(inject, eps_key, unif_key=None):
    """Assemble the per-forward ``noise`` dict from a replay-injection dict.

    ``inject`` maps draw-site names (SHOT: eps_1..eps_4, unif_3/unif_4,
    lam_sm, perm_sm, lam_mx, perm_mx; M2: eps_1/eps_2, unif_2) to
    pre-drawn arrays; used by the
    cross-framework lockstep tests to feed IDENTICAL randomness to this step
    and the torch reference. None (the default everywhere) draws normally.
    """
    if not inject:
        return None
    d = {}
    if eps_key in inject:
        d["eps"] = inject[eps_key]
    if unif_key is not None and unif_key in inject:
        d["unif"] = inject[unif_key]
    return d or None


def _apply_vae(model, params, batch_stats, x, key, *, train=True, **kwargs):
    """One VAE forward, returning outputs + updated BN stats."""
    key_s, key_d = jax.random.split(key)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, updates = model.apply(
            variables, x, train=True, rngs={"sample": key_s, "dropout": key_d},
            mutable=["batch_stats"], **kwargs)
        return out, updates["batch_stats"]
    out = model.apply(variables, x, train=False, rngs={"sample": key_s}, **kwargs)
    return out, batch_stats


# ---------------------------------------------------------------------------
# SHOT-VAE (main_shot_vae.py:261-384)
# ---------------------------------------------------------------------------


def make_shot_vae_train_step(model, *, num_classes: int, bce: bool,
                             x_sigma: float, epsilon: float,
                             optimal_match: bool,
                             fused_streams: bool = False,
                             axis_name: str | None = None,
                             bn_stats: str = "replica0",
                             global_mixup: bool = False,
                             aug: AugmentConfig = AugmentConfig()):
    """The SHOT-VAE hot loop as one jittable function.

    Call signature: ``step(state, img_l, lab_l, img_u, lab_u, sched, key)``
    where ``sched`` is the dict from
    ``shotvae_tpu.ops.schedules.shot_vae_epoch_schedules`` (traced scalars —
    changing them does not recompile).

    ``axis_name`` switches to the DataParallel-faithful per-replica-BN mode:
    the step is meant to run under ``shard_map`` over that mesh axis
    (``DataParallel.shard_map_step``), each replica computes BatchNorm with
    its LOCAL batch statistics, gradients are pmean'd, and running stats
    follow ``bn_stats`` (see ``_cross_replica``). Deviation vs the
    reference in this mode: the mixup/label-smoothing partner permutations
    are drawn within each replica's shard rather than over the global batch
    (DataParallel mixes globally because mixup happens on the gathered
    device-0 tensors, main_shot_vae.py:297-322) — same distribution, no
    cross-replica pairs. ``global_mixup=True`` restores the DataParallel
    behavior exactly: the partner draws run over the all_gathered global
    batch with a replica-shared key (see ``gather_mixup``), at the cost of
    one image+posterior all_gather per interpolation site. Default
    (``axis_name=None``) is sync-BN GSPMD, where the batch is already
    global and the flag is meaningless (rejected).

    ``fused_streams`` runs the labeled and unlabeled streams through TWO
    double-batch forwards ([x_l|x_u] and [smoothed_l|mixed_u]) instead of the
    reference's four single-batch ones — identical loss math (per-stream
    reductions are computed on slices); train-mode BatchNorm statistics pool
    over the combined 2B batch instead of per-stream B. Measured on v5e the
    two variants are within 1% (the step is conv-FLOP-bound), so the default
    stays False for strict 4-forward parity.
    """

    def fused_loss_fn(params, batch_stats, key, x_l, lab_l, x_u, lab_u, sched):
        keys = jax.random.split(key, 4)
        bs = batch_stats
        batch_l = x_l.shape[0]
        batch_u = x_u.shape[0]
        onehot_l = jnn.one_hot(lab_l, num_classes, dtype=jnp.float32)
        sg = jax.lax.stop_gradient
        no_label_u = jnp.full((batch_u,), -1, lab_l.dtype)

        # ---- forward A: [labeled(one-hot) | unlabeled(gumbel)] ----
        x_a = jnp.concatenate([x_l, x_u], axis=0)
        labels_a = jnp.concatenate([lab_l, no_label_u])
        (recon_a, mean_a, ls_a, la_a), bs = _apply_vae(
            model, params, bs, x_a, keys[0], labels=labels_a)
        recon_l, recon_u = recon_a[:batch_l], recon_a[batch_l:]
        mean_l, mean_u = mean_a[:batch_l], mean_a[batch_l:]
        ls_l, ls_u = ls_a[:batch_l], ls_a[batch_l:]
        la_l, la_u = la_a[:batch_l], la_a[batch_l:]

        def elbo(x, recon, mean, ls, la):
            r, ckl, dkl = losses.elbo_terms(
                x, recon, mean, ls, la, num_classes=num_classes, bce=bce,
                x_sigma=x_sigma)
            e = (r + sched["kl_beta_c"] * losses.mi_hinge(ckl, sched["cmi"])
                 + sched["kl_beta_d"] * losses.mi_hinge(dkl, sched["dmi"]))
            return e, (r, ckl, dkl)

        elbo_l, (r_l, ckl_l, dkl_l) = elbo(x_l, recon_l, mean_l, ls_l, la_l)
        elbo_u, (r_u, ckl_u, dkl_u) = elbo(x_u, recon_u, mean_u, ls_u, la_u)
        inference_kl = losses.inference_kl_metric(sg(la_u), lab_u, num_classes)

        # ---- stop-grad interpolation targets (per stream) ----
        sm = mixup.label_smoothing(keys[1], sg(x_l), sg(mean_l), sg(ls_l),
                                   sg(la_l), lab_l, epsilon=epsilon)
        mx = mixup.mixup_vae_data(keys[2], sg(x_u), sg(mean_u), sg(ls_u),
                                  sg(la_u), optimal_match=optimal_match)

        # ---- forward B: [smoothed-labeled(mixup one-hot) | mixed-unlabeled] ----
        x_b = jnp.concatenate([sm.image, mx.image], axis=0)
        labels_b = jnp.concatenate([lab_l, no_label_u])
        labels_mixup_b = jnp.concatenate([sm.partner_labels, no_label_u])
        (_, mean_b, ls_b, la_b), bs = _apply_vae(
            model, params, bs, x_b, keys[3], labels=labels_b, mixup=True,
            labels_mixup=labels_mixup_b, mixup_lam=sm.lam)
        mean_sm, mean_mx = mean_b[:batch_l], mean_b[batch_l:]
        ls_sm, ls_mx = ls_b[:batch_l], ls_b[batch_l:]
        la_sm, la_mx = la_b[:batch_l], la_b[batch_l:]

        onehot_partner = jnn.one_hot(sm.partner_labels, num_classes,
                                     dtype=jnp.float32)
        disc_post_l = (sm.lam * losses.cls_nll(la_sm, onehot_l)
                       + (1.0 - sm.lam) * losses.cls_nll(la_sm, onehot_partner))
        cont_post_l = (jnp.sum((mean_sm - sm.z_mean) ** 2)
                       + jnp.sum((jnp.exp(ls_sm) - sm.z_sigma) ** 2)) / batch_l
        loss_supervised = (sched["ew"] * (elbo_l + sched["kl_beta_c"]
                                          * sched["pwm"] * cont_post_l)
                           + disc_post_l)

        disc_post_u = losses.cls_nll(la_mx, mx.disc_alpha)
        cont_post_u = (jnp.sum((mean_mx - mx.z_mean) ** 2)
                       + jnp.sum((jnp.exp(ls_mx) - mx.z_sigma) ** 2)) / batch_u
        loss_unsupervised = (sched["ew"] * (elbo_u + sched["kl_beta_c"]
                                            * sched["pwm"] * cont_post_u)
                             + sched["ucw"] * disc_post_u)

        total = loss_supervised + loss_unsupervised
        metrics = {
            "loss": total,
            "loss_supervised": loss_supervised,
            "loss_unsupervised": loss_unsupervised,
            "recon_l": r_l, "cont_kl_l": ckl_l, "disc_kl_l": dkl_l,
            "recon_u": r_u, "cont_kl_u": ckl_u, "disc_kl_u": dkl_u,
            "kl_inference": inference_kl,
        }
        return total, (bs, metrics)

    def loss_fn(params, batch_stats, key, x_l, lab_l, x_u, lab_u, sched,
                inject=None, shared_keys=None):
        keys = jax.random.split(key, 6)
        bs = batch_stats
        batch_l = x_l.shape[0]
        batch_u = x_u.shape[0]
        inj = inject or {}
        onehot_l = jnn.one_hot(lab_l, num_classes, dtype=jnp.float32)

        # ---- labeled forward 1: ground-truth label path (":285-295") ----
        (recon_l, mean_l, ls_l, la_l), bs = _apply_vae(
            model, params, bs, x_l, keys[0], labels=lab_l,
            noise=_inject_noise(inject, "eps_1"))
        r_l, ckl_l, dkl_l = losses.elbo_terms(
            x_l, recon_l, mean_l, ls_l, la_l, num_classes=num_classes,
            bce=bce, x_sigma=x_sigma)
        elbo_l = (r_l
                  + sched["kl_beta_c"] * losses.mi_hinge(ckl_l, sched["cmi"])
                  + sched["kl_beta_d"] * losses.mi_hinge(dkl_l, sched["dmi"]))

        # ---- labeled forward 2: label-smoothing interpolation (":297-322") ----
        sg = jax.lax.stop_gradient
        if shared_keys is not None:
            sm = gather_mixup(axis_name, mixup.label_smoothing, shared_keys[0],
                              (sg(x_l), sg(mean_l), sg(ls_l), sg(la_l), lab_l),
                              batch_l, epsilon=epsilon,
                              lam=inj.get("lam_sm"), index=inj.get("perm_sm"))
        else:
            sm = mixup.label_smoothing(keys[1], sg(x_l), sg(mean_l), sg(ls_l),
                                       sg(la_l), lab_l, epsilon=epsilon,
                                       lam=inj.get("lam_sm"),
                                       index=inj.get("perm_sm"))
        (_, mean_sm, ls_sm, la_sm), bs = _apply_vae(
            model, params, bs, sm.image, keys[2], labels=lab_l, mixup=True,
            labels_mixup=sm.partner_labels, mixup_lam=sm.lam,
            noise=_inject_noise(inject, "eps_2"))
        onehot_partner = jnn.one_hot(sm.partner_labels, num_classes,
                                     dtype=jnp.float32)
        disc_post_l = (sm.lam * losses.cls_nll(la_sm, onehot_l)
                       + (1.0 - sm.lam) * losses.cls_nll(la_sm, onehot_partner))
        cont_post_l = (jnp.sum((mean_sm - sm.z_mean) ** 2)
                       + jnp.sum((jnp.exp(ls_sm) - sm.z_sigma) ** 2)) / batch_l
        elbo_l = elbo_l + sched["kl_beta_c"] * sched["pwm"] * cont_post_l
        loss_supervised = sched["ew"] * elbo_l + disc_post_l

        # ---- unlabeled forward 3: gumbel-softmax path (":327-346") ----
        (recon_u, mean_u, ls_u, la_u), bs = _apply_vae(
            model, params, bs, x_u, keys[3],
            noise=_inject_noise(inject, "eps_3", "unif_3"))
        r_u, ckl_u, dkl_u = losses.elbo_terms(
            x_u, recon_u, mean_u, ls_u, la_u, num_classes=num_classes,
            bce=bce, x_sigma=x_sigma)
        elbo_u = (r_u
                  + sched["kl_beta_c"] * losses.mi_hinge(ckl_u, sched["cmi"])
                  + sched["kl_beta_d"] * losses.mi_hinge(dkl_u, sched["dmi"]))
        # monitoring only (":331-339"): KL vs smoothed true label
        inference_kl = losses.inference_kl_metric(sg(la_u), lab_u, num_classes)

        # ---- unlabeled forward 4: posterior mixup (":348-362") ----
        if shared_keys is not None:
            mx = gather_mixup(axis_name, mixup.mixup_vae_data, shared_keys[1],
                              (sg(x_u), sg(mean_u), sg(ls_u), sg(la_u)),
                              batch_u, optimal_match=optimal_match,
                              lam=inj.get("lam_mx"), index=inj.get("perm_mx"))
        else:
            mx = mixup.mixup_vae_data(keys[4], sg(x_u), sg(mean_u), sg(ls_u),
                                      sg(la_u), optimal_match=optimal_match,
                                      lam=inj.get("lam_mx"),
                                      index=inj.get("perm_mx"))
        (_, mean_mx, ls_mx, la_mx), bs = _apply_vae(
            model, params, bs, mx.image, keys[5],
            noise=_inject_noise(inject, "eps_4", "unif_4"))
        disc_post_u = losses.cls_nll(la_mx, mx.disc_alpha)
        cont_post_u = (jnp.sum((mean_mx - mx.z_mean) ** 2)
                       + jnp.sum((jnp.exp(ls_mx) - mx.z_sigma) ** 2)) / batch_u
        elbo_u = elbo_u + sched["kl_beta_c"] * sched["pwm"] * cont_post_u
        loss_unsupervised = sched["ew"] * elbo_u + sched["ucw"] * disc_post_u

        total = loss_supervised + loss_unsupervised
        metrics = {
            "loss": total,
            "loss_supervised": loss_supervised,
            "loss_unsupervised": loss_unsupervised,
            "recon_l": r_l, "cont_kl_l": ckl_l, "disc_kl_l": dkl_l,
            "recon_u": r_u, "cont_kl_u": ckl_u, "disc_kl_u": dkl_u,
            "kl_inference": inference_kl,
        }
        return total, (bs, metrics)

    chosen_loss_fn = fused_loss_fn if fused_streams else loss_fn
    if global_mixup and axis_name is None:
        raise ValueError("global_mixup requires the per-replica-BN shard_map "
                         "mode (axis_name); the GSPMD batch is already global")
    if global_mixup and fused_streams:
        raise NotImplementedError(
            "global_mixup is only supported on the 4-forward path")

    def step(state: TrainState, img_l, lab_l, img_u, lab_u, sched, key,
             inject=None):
        if inject is not None and fused_streams:
            raise NotImplementedError(
                "replay injection is only supported on the 4-forward path")
        shared_keys = None
        if axis_name is not None:
            if global_mixup:
                # pre-fold key: IDENTICAL on every replica, so the global
                # lambda/partner draws agree across the mesh. The fold
                # constant just separates this stream from the per-replica
                # fold_in(key, axis_index) stream below.
                shared_keys = jax.random.split(
                    jax.random.fold_in(key, 987_654_321), 2)
            key = _fold_replica_key(key, axis_name)
        key_aug_l, key_aug_u, key_loss = jax.random.split(key, 3)
        x_l = _prepare(key_aug_l, img_l, aug, train=True)
        x_u = _prepare(key_aug_u, img_u, aug, train=True)
        grad_fn = jax.value_and_grad(chosen_loss_fn, has_aux=True)
        extra = () if fused_streams else (inject, shared_keys)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, key_loss, x_l, lab_l, x_u, lab_u,
            sched, *extra)
        if axis_name is not None:
            grads, new_bs, metrics = _cross_replica(
                grads, new_bs, metrics, axis_name, bn_stats)
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


# ---------------------------------------------------------------------------
# M2 VAE (main_M2_vae.py:242-330)
# ---------------------------------------------------------------------------


def make_m2_train_step(model, *, num_classes: int, bce: bool, x_sigma: float,
                       axis_name: str | None = None,
                       bn_stats: str = "replica0",
                       aug: AugmentConfig = AugmentConfig()):
    """M2 baseline: no mixup, no posterior terms; CE on q(y|x) directly.

    ``axis_name``/``bn_stats``: per-replica-BN shard_map mode, see
    ``make_shot_vae_train_step``.
    """

    def loss_fn(params, batch_stats, key, x_l, lab_l, x_u, lab_u, sched,
                inject=None):
        keys = jax.random.split(key, 2)
        bs = batch_stats
        onehot_l = jnn.one_hot(lab_l, num_classes, dtype=jnp.float32)

        (recon_l, mean_l, ls_l, la_l), bs = _apply_vae(
            model, params, bs, x_l, keys[0], labels=lab_l,
            noise=_inject_noise(inject, "eps_1"))
        r_l, ckl_l, dkl_l = losses.elbo_terms(
            x_l, recon_l, mean_l, ls_l, la_l, num_classes=num_classes,
            bce=bce, x_sigma=x_sigma)
        elbo_l = (r_l
                  + sched["kl_beta_c"] * losses.mi_hinge(ckl_l, sched["cmi"])
                  + sched["kl_beta_d"] * losses.mi_hinge(dkl_l, sched["dmi"]))
        disc_post_l = losses.cls_nll(la_l, onehot_l)
        loss_supervised = sched["ew"] * elbo_l + disc_post_l

        (recon_u, mean_u, ls_u, la_u), bs = _apply_vae(
            model, params, bs, x_u, keys[1],
            noise=_inject_noise(inject, "eps_2", "unif_2"))
        r_u, ckl_u, dkl_u = losses.elbo_terms(
            x_u, recon_u, mean_u, ls_u, la_u, num_classes=num_classes,
            bce=bce, x_sigma=x_sigma)
        elbo_u = (r_u
                  + sched["kl_beta_c"] * losses.mi_hinge(ckl_u, sched["cmi"])
                  + sched["kl_beta_d"] * losses.mi_hinge(dkl_u, sched["dmi"]))
        loss_unsupervised = sched["ew"] * elbo_u
        inference_kl = losses.inference_kl_metric(
            jax.lax.stop_gradient(la_u), lab_u, num_classes)

        total = loss_supervised + loss_unsupervised
        metrics = {
            "loss": total,
            "loss_supervised": loss_supervised,
            "loss_unsupervised": loss_unsupervised,
            "recon_l": r_l, "cont_kl_l": ckl_l, "disc_kl_l": dkl_l,
            "recon_u": r_u, "cont_kl_u": ckl_u, "disc_kl_u": dkl_u,
            "kl_inference": inference_kl,
        }
        return total, (bs, metrics)

    def step(state: TrainState, img_l, lab_l, img_u, lab_u, sched, key,
             inject=None):
        if axis_name is not None:
            key = _fold_replica_key(key, axis_name)
        key_aug_l, key_aug_u, key_loss = jax.random.split(key, 3)
        x_l = _prepare(key_aug_l, img_l, aug, train=True)
        x_u = _prepare(key_aug_u, img_u, aug, train=True)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, key_loss, x_l, lab_l, x_u, lab_u,
            sched, inject)
        if axis_name is not None:
            grads, new_bs, metrics = _cross_replica(
                grads, new_bs, metrics, axis_name, bn_stats)
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


# ---------------------------------------------------------------------------
# Shared VAE evaluation (main_shot_vae.py:409-510 valid/test)
# ---------------------------------------------------------------------------


def make_vae_eval_step(model, *, num_classes: int, bce: bool, x_sigma: float,
                       aug: AugmentConfig = AugmentConfig()):
    """Eval pass: BN uses running stats, dropout off, but z and gumbel-y are
    still *sampled* — the reference ``Sample`` has no eval switch
    (vae.py:23-56); accuracy only uses the deterministic disc_log_alpha.

    ``weight`` is a per-sample 0/1 mask so ragged tail batches can be padded
    to the static batch size without biasing any metric. Returns per-batch
    weighted SUMS plus the effective count — host meters divide exactly like
    the reference AverageMeters — and the sigmoid reconstruction for image
    logging.

    ``inject`` optionally replays pre-drawn sampling randomness
    ({"eps", "unif"}) — the eval lockstep goldens feed the same draws to the
    torch reference's valid()/test() math.
    """

    def step(state: TrainState, img, lab, weight, key, inject=None):
        x = to_float(img, normalize=aug.normalize)
        (recon, mean, ls, la), _ = _apply_vae(
            model, state.params, state.batch_stats, x, key, train=False,
            noise=_inject_noise(inject, "eps", "unif"))
        w = weight.astype(jnp.float32)
        flat = lambda t: t.reshape(t.shape[0], -1)
        if bce:
            logits = flat(recon)
            tgt = flat(x)
            per = (jnp.maximum(logits, 0) - logits * tgt
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            recon_per = jnp.sum(per, axis=1)
        else:
            recon_per = jnp.sum((jnn.sigmoid(flat(recon)) - flat(x)) ** 2,
                                axis=1) / (2 * x_sigma**2)
        lss = 2.0 * ls
        ckl_per = 0.5 * jnp.sum(mean**2 + jnp.exp(lss) - lss - 1.0, axis=1)
        dkl_per = jnp.sum(jnp.exp(la) * (la - jnp.log(1.0 / num_classes)),
                          axis=1)
        recon_sig = jnn.sigmoid(recon)
        mse_per = jnp.sum(flat(recon_sig - x) ** 2, axis=1) / (2 * x_sigma**2)
        # the reference's ad-hoc "ELBO" metric (":435")
        elbo_per = mse_per + 0.01 * (ckl_per + dkl_per)
        probs = jnp.exp(la)
        top1_per = (jnp.argmax(probs, axis=1) == lab)
        k = min(5, num_classes)
        _, topk_idx = jax.lax.top_k(probs, k)
        top5_per = jnp.any(topk_idx == lab[:, None], axis=1)
        metrics = {
            "recon_sum": jnp.sum(recon_per * w),
            "cont_kl_sum": jnp.sum(ckl_per * w),
            "disc_kl_sum": jnp.sum(dkl_per * w),
            "mse_sum": jnp.sum(mse_per * w),
            "elbo_sum": jnp.sum(elbo_per * w),
            "top1_count": jnp.sum(top1_per * w),
            "top5_count": jnp.sum(top5_per * w),
            "count": jnp.sum(w),
        }
        return metrics, recon_sig

    return step


# ---------------------------------------------------------------------------
# Supervised classifier (main_classifier.py:181-278)
# ---------------------------------------------------------------------------


def softmax_ce(logits, labels):
    """F.cross_entropy parity: mean over batch of -log_softmax[label]."""
    log_probs = jnn.log_softmax(logits.astype(jnp.float32), axis=1)
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))


def make_classifier_train_step(model, *, axis_name: str | None = None,
                               bn_stats: str = "replica0",
                               aug: AugmentConfig = AugmentConfig()):
    def loss_fn(params, batch_stats, key, x, lab):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, updates = model.apply(
            variables, x, train=True, rngs={"dropout": key},
            mutable=["batch_stats"])
        loss = softmax_ce(logits, lab)
        return loss, (updates["batch_stats"], {"cls_loss": loss})

    def step(state: TrainState, img, lab, key):
        if axis_name is not None:
            key = _fold_replica_key(key, axis_name)
        key_aug, key_loss = jax.random.split(key)
        x = _prepare(key_aug, img, aug, train=True)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, key_loss, x, lab)
        if axis_name is not None:
            grads, new_bs, metrics = _cross_replica(
                grads, new_bs, metrics, axis_name, bn_stats)
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


def make_classifier_eval_step(model, *, num_classes: int,
                              aug: AugmentConfig = AugmentConfig()):
    def step(state: TrainState, img, lab, weight):
        x = to_float(img, normalize=aug.normalize)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False)
        w = weight.astype(jnp.float32)
        log_probs = jnn.log_softmax(logits.astype(jnp.float32), axis=1)
        nll_per = -jnp.take_along_axis(log_probs, lab[:, None], axis=1)[:, 0]
        probs = jnn.softmax(logits, axis=1)
        top1_per = (jnp.argmax(probs, axis=1) == lab)
        k = min(5, num_classes)
        _, topk_idx = jax.lax.top_k(probs, k)
        top5_per = jnp.any(topk_idx == lab[:, None], axis=1)
        return {"cls_loss_sum": jnp.sum(nll_per * w),
                "top1_count": jnp.sum(top1_per * w),
                "top5_count": jnp.sum(top5_per * w),
                "count": jnp.sum(w)}

    return step


# ---------------------------------------------------------------------------
# Smooth-ELBO one-stage trainer (main_smooth_ELBO_mnist.py:125-290)
# ---------------------------------------------------------------------------


def make_smooth_elbo_train_step(model, *, alpha: float, cont_capacity,
                                disc_capacity, disc_dims,
                                aug: AugmentConfig = AugmentConfig(
                                    enabled=False, normalize=True)):
    """Capacity-annealed joint loss on (unlabeled + labeled) batches.

    ``cont_capacity`` / ``disc_capacity`` are the reference 4-tuples
    (min, max, num_iters, gamma). The capacity ramp uses the *global step*
    (state.step + 1, matching the reference's pre-incremented num_steps).
    """
    import numpy as np

    disc_theoretical_max = float(sum(np.log(d) for d in disc_dims))

    def one_loss(params, bs, key, x, labels, step, noise=None):
        (recon, dist, _, _), bs = _smooth_apply(params, bs, x, key, labels,
                                                noise)
        r = losses.smooth_recon_loss(x, recon)
        mean, logvar = dist["cont"]
        kl_cont, kl_cont_per_dim = losses.kl_normal_loss(mean, logvar)
        c_min, c_max, c_iters, c_gamma = cont_capacity
        cont_cap_loss = losses.capacity_loss(kl_cont, step, c_min, c_max,
                                             c_iters, c_gamma)
        kl_disc = losses.kl_multiple_discrete_loss(dist["disc"])
        d_min, d_max, d_iters, d_gamma = disc_capacity
        disc_cap_loss = losses.capacity_loss(
            kl_disc, step, d_min, d_max, d_iters, d_gamma,
            theoretical_max=disc_theoretical_max)
        loss = r + cont_cap_loss + disc_cap_loss
        cls = jnp.float32(0.0)
        if labels is not None:
            onehot = jnn.one_hot(labels, disc_dims[0], dtype=jnp.float32)
            cls = alpha * losses.bce_probs_mean(dist["disc"][0], onehot)
            loss = loss + cls
        return loss, (bs, r, cont_cap_loss, disc_cap_loss, cls,
                      kl_cont, kl_cont_per_dim, kl_disc)

    def _smooth_apply(params, bs, x, key, labels, noise=None):
        out, updates = model.apply(
            {"params": params, "batch_stats": bs}, x, labels=labels,
            train=True, noise=noise, rngs={"sample": key},
            mutable=["batch_stats"])
        return out, updates.get("batch_stats", bs)

    def loss_fn(params, batch_stats, key, x_u, x_l, lab_l, step, inject=None):
        k_u, k_l = jax.random.split(key)
        bs = batch_stats
        inj = inject or {}
        loss_u, (bs, r_u, cc_u, dc_u, _, klc_u, klc_dim_u, kld_u) = one_loss(
            params, bs, k_u, x_u, None, step, noise=inj.get("u"))
        loss_l, (bs, r_l, cc_l, dc_l, cls, _, _, _) = one_loss(
            params, bs, k_l, x_l, lab_l, step, noise=inj.get("l"))
        total = loss_u + loss_l
        metrics = {
            "loss": total,
            "u_recon": r_u, "u_cont_cap": cc_u, "u_disc_cap": dc_u,
            "l_recon": r_l, "l_cont_cap": cc_l, "l_disc_cap": dc_l,
            "classification": cls,
            # observability parity with the reference's recorded losses dict
            # (main_smooth_ELBO_mnist.py:303-359: kl_loss_cont[_i], kl_loss_disc)
            "kl_cont": klc_u, "kl_disc": kld_u,
            "kl_cont_per_dim": klc_dim_u,
        }
        return total, (bs, metrics)

    def step(state: TrainState, img_u, img_l, lab_l, key, inject=None):
        x_u = to_float(img_u, normalize=True)
        x_l = to_float(img_l, normalize=True)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, key, x_u, x_l, lab_l,
            state.step + 1, inject)
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


def make_smooth_elbo_eval_step(model):
    """Accuracy from argmax q(y|x) (main_smooth_ELBO_mnist.py:213-225)."""

    def step(state: TrainState, img, lab, weight):
        x = to_float(img, normalize=True)
        _, dist, _, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False)
        w = weight.astype(jnp.float32)
        pred = jnp.argmax(dist["disc"][0], axis=1)
        return {"correct_count": jnp.sum((pred == lab) * w),
                "count": jnp.sum(w)}

    return step


