"""Cross-framework LOCKSTEP training-dynamics golden tests.

The strongest accuracy-parity proxy available without CIFAR on disk
(VERDICT.md round-1 #2): build the ACTUAL reference torch models, import
their weights, inject IDENTICAL randomness (gaussian eps, gumbel uniforms,
mixup lambdas/permutations) into both frameworks, and assert that loss and
post-SGD-step parameters INCLUDING BatchNorm running stats stay matched over
5 full steps of the composed SHOT / M2 / classifier training math
(main_shot_vae.py:280-366, main_M2_vae.py:256-308, main_classifier.py:181-211).
Gradients are pinned implicitly: each step's post-update params equal
p - lr*(momentum-buffer of grad + wd*p), so any gradient divergence shows up
in the very next parameter comparison.

The torch side reuses the reference MODEL classes verbatim (forward
compositions from vae.py:142-151) and re-evaluates the reference's loss
formulas inline, because the reference's Sample/VAECriterion call `.cuda()`
unconditionally and its train() lives in an unimportable script. Known
deviation absorbed by tolerance: torch tracks the UNBIASED batch variance in
BN running stats, flax the biased one (~n/(n-1), documented in README §7).

Skipped when /root/reference is not mounted.
"""

import math
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

B = 8       # per-stream batch
LDC = 8     # continuous latent dim
K = 10      # classes
T = 0.67    # gumbel temperature
LR, MOM, WD = 0.1, 0.9, 5e-4
N_STEPS = 5
SCHED = dict(cmi=0.4, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
             pwm=1.0, ucw=1.0)


@pytest.fixture(scope="module")
def torch():
    torch = pytest.importorskip("torch")
    return torch


def _fresh_ref_import(dir_name, mod_name, siblings):
    """Import a reference module with ITS directory first on sys.path.

    The reference packages import siblings by bare name (shot_vae_model and
    classifier_model both define ``wideresnet``), and other test modules
    (test_torch_compat) may have left the WRONG variant in sys.modules —
    purge the bare names and re-import fresh so module identity is
    deterministic regardless of test order.
    """
    import importlib

    path = os.path.join(REF, dir_name)
    sys.path.insert(0, path)
    for m in (mod_name, *siblings):
        sys.modules.pop(m, None)
    return importlib.import_module(mod_name)


def _ref_vae_module():
    return _fresh_ref_import(
        "shot_vae_model", "vae",
        ["wideresnet", "preactresnet", "densenet", "decoder", "mlpvae"])


def _ref_classifier_module():
    return _fresh_ref_import("classifier_model", "wideresnet", ["mlp"])


# ---------------------------------------------------------------------------
# torch-side reference math (main_shot_vae.py:280-366 with injected draws)
# ---------------------------------------------------------------------------


def _ref_forward(torch, ref, x, eps, *, onehot=None, unif=None):
    """vae.py:142-151 with Sample's math inlined (Sample calls .cuda())."""
    bsz = x.size(0)
    feats = ref.feature_extractor(x)
    avg = ref.global_avg(feats).view(bsz, -1)
    mean = ref.continuous_inference.mean(avg)
    log_sigma = ref.continuous_inference.log_sigma(avg)
    log_alpha = ref.disc_latent_inference(avg)
    z = mean + torch.exp(log_sigma) * eps          # vae.py:75-86
    if onehot is not None:                          # vae.py:38-50
        y = onehot
    else:                                           # vae.py:58-73
        gumbel = -torch.log(-torch.log(unif + 1e-12) + 1e-12)
        y = torch.softmax((log_alpha + gumbel) / T, dim=1)
    latent = torch.cat([z, y], dim=1).view(bsz, -1, 1, 1)
    recon = ref.feature_reconstructor(latent)
    return recon, mean, log_sigma, log_alpha


def _elbo_terms(torch, x, recon, mean, log_sigma, log_alpha):
    """lib/criterion.py:44-57 (bce path) without the .cuda() prior ctor."""
    bsz = x.size(0)
    F = torch.nn.functional
    r = F.binary_cross_entropy_with_logits(recon, x, reduction="sum") / bsz
    lss = 2 * log_sigma
    ckl = 0.5 * torch.sum(mean * mean + torch.exp(lss) - lss - 1) / bsz
    dkl = torch.sum(torch.exp(log_alpha)
                    * (log_alpha - math.log(1.0 / K))) / bsz
    return r, ckl, dkl


def _ce(torch, log_probs, target):
    """lib/criterion.py:104-107: -mean(sum(log_probs * target, dim=1))."""
    return -torch.mean(torch.sum(log_probs * target, dim=1))


def _onehot(torch, labels):
    return torch.zeros(labels.size(0), K).scatter_(1, labels.view(-1, 1), 1)


def _mix(torch, a, b, lam):
    return lam * a + (1 - lam) * b


def _torch_pairwise_kl(torch, z_mean, z_log_sigma):
    """The reference's per-pair Gaussian KL, O(B^2) loop verbatim-in-spirit
    (lib/utils/mixup.py:10-18 + :93-99): kl[i,j] = KL(N_i || N_j)."""
    bsz = z_mean.size(0)
    kl = torch.zeros(bsz, bsz)
    for i in range(bsz):
        for j in range(bsz):
            s1 = torch.exp(z_log_sigma[i])
            s2 = torch.exp(z_log_sigma[j])
            kl[i, j] = (torch.sum(z_log_sigma[j] - z_log_sigma[i])
                        + 0.5 * torch.sum(s1 ** 2 / s2 ** 2)
                        + 0.5 * torch.sum((z_mean[i] - z_mean[j]) ** 2
                                          / s2 ** 2)
                        - 0.5 * z_mean.size(1))
    return kl


def _torch_optimal_index(torch, z_mean, z_log_sigma):
    """topk(2, largest=False)[:, 1] — 2nd-smallest KL partner
    (mixup.py:17-18; the smallest is the self-pair diagonal)."""
    kl = _torch_pairwise_kl(torch, z_mean, z_log_sigma)
    _, index = torch.topk(kl, 2, largest=False)
    return index[:, 1]


def _torch_shot_losses(torch, ref, x_l, lab_l, x_u, n, optimal_match=False):
    """The two SHOT-VAE loss halves (main_shot_vae.py:283-364), no update.

    ``optimal_match`` replaces the injected unlabeled-mixup permutation with
    the reference's O(B^2) pairwise-KL 2nd-smallest partner (the ``--om``
    path, main_shot_vae.py:348-355) computed from the live posteriors.
    Batch divisors use the LOCAL batch size (x_l.size(0)) so the same math
    serves the full-batch step and the per-replica DataParallel simulation."""
    F = torch.nn.functional
    s = SCHED
    bsz = x_l.size(0)
    onehot_l = _onehot(torch, lab_l)
    # labeled fwd 1 (":288-295")
    rec_l, mean_l, ls_l, la_l = _ref_forward(
        torch, ref, x_l, n["eps_1"], onehot=onehot_l)
    r_l, ckl_l, dkl_l = _elbo_terms(torch, x_l, rec_l, mean_l, ls_l, la_l)
    elbo_l = r_l + s["kl_beta_c"] * torch.abs(ckl_l - s["cmi"]) \
        + s["kl_beta_d"] * torch.abs(dkl_l - s["dmi"])
    # label smoothing, no grad (":297-310" + lib/utils/mixup.py:29-41)
    with torch.no_grad():
        lam, perm = n["lam_sm"], n["perm_sm"]
        x_sm = _mix(torch, x_l, x_l[perm], lam)
        zm_sm = _mix(torch, mean_l, mean_l[perm], lam)
        zs_sm = _mix(torch, torch.exp(ls_l), torch.exp(ls_l)[perm], lam)
        partner = lab_l[perm]
        onehot_p = _onehot(torch, partner)
        onehot_mix = _mix(torch, onehot_l, onehot_p, lam)
    # labeled fwd 2 (":311-315", mixup one-hot path)
    _, mean_sm, ls_sm, la_sm = _ref_forward(
        torch, ref, x_sm, n["eps_2"], onehot=onehot_mix)
    disc_post_l = lam * _ce(torch, la_sm, onehot_l) \
        + (1 - lam) * _ce(torch, la_sm, onehot_p)
    cont_post_l = (F.mse_loss(mean_sm, zm_sm, reduction="sum")
                   + F.mse_loss(torch.exp(ls_sm), zs_sm,
                                reduction="sum")) / bsz
    elbo_l = elbo_l + s["kl_beta_c"] * s["pwm"] * cont_post_l
    loss_sup = s["ew"] * elbo_l + disc_post_l

    # unlabeled fwd 3 (":327-346", gumbel path)
    rec_u, mean_u, ls_u, la_u = _ref_forward(
        torch, ref, x_u, n["eps_3"], unif=n["unif_3"])
    r_u, ckl_u, dkl_u = _elbo_terms(torch, x_u, rec_u, mean_u, ls_u, la_u)
    elbo_u = r_u + s["kl_beta_c"] * torch.abs(ckl_u - s["cmi"]) \
        + s["kl_beta_d"] * torch.abs(dkl_u - s["dmi"])
    # posterior mixup, no grad (":348-355" + mixup.py:5-26)
    with torch.no_grad():
        lam = n["lam_mx"]
        perm = (_torch_optimal_index(torch, mean_u, ls_u)
                if optimal_match else n["perm_mx"])
        x_mx = _mix(torch, x_u, x_u[perm], lam)
        zm_mx = _mix(torch, mean_u, mean_u[perm], lam)
        zs_mx = _mix(torch, torch.exp(ls_u), torch.exp(ls_u)[perm], lam)
        al_mx = _mix(torch, torch.exp(la_u), torch.exp(la_u)[perm], lam)
    # unlabeled fwd 4 (":356-362")
    _, mean_o, ls_o, la_o = _ref_forward(
        torch, ref, x_mx, n["eps_4"], unif=n["unif_4"])
    disc_post_u = _ce(torch, la_o, al_mx)
    cont_post_u = (F.mse_loss(mean_o, zm_mx, reduction="sum")
                   + F.mse_loss(torch.exp(ls_o), zs_mx,
                                reduction="sum")) / bsz
    elbo_u = elbo_u + s["kl_beta_c"] * s["pwm"] * cont_post_u
    loss_unsup = s["ew"] * elbo_u + s["ucw"] * disc_post_u
    return loss_sup, loss_unsup


def _torch_shot_step(torch, ref, opt, x_l, lab_l, x_u, n,
                     optimal_match=False):
    """One reference SHOT-VAE iteration (main_shot_vae.py:280-366): the two
    loss halves backwarded in accumulation, one optimizer step."""
    loss_sup, loss_unsup = _torch_shot_losses(torch, ref, x_l, lab_l, x_u, n,
                                              optimal_match=optimal_match)
    (loss_sup + loss_unsup).backward()
    opt.step()
    opt.zero_grad()
    return float(loss_sup.detach()) + float(loss_unsup.detach())


def _torch_m2_step(torch, ref, opt, x_l, lab_l, x_u, n):
    """One reference M2 iteration (main_M2_vae.py:268-308)."""
    s = SCHED
    onehot_l = _onehot(torch, lab_l)
    rec_l, mean_l, ls_l, la_l = _ref_forward(
        torch, ref, x_l, n["eps_1"], onehot=onehot_l)
    r_l, ckl_l, dkl_l = _elbo_terms(torch, x_l, rec_l, mean_l, ls_l, la_l)
    elbo_l = r_l + s["kl_beta_c"] * torch.abs(ckl_l - s["cmi"]) \
        + s["kl_beta_d"] * torch.abs(dkl_l - s["dmi"])
    loss_sup = s["ew"] * elbo_l + _ce(torch, la_l, onehot_l)
    loss_sup.backward()
    rec_u, mean_u, ls_u, la_u = _ref_forward(
        torch, ref, x_u, n["eps_2"], unif=n["unif_2"])
    r_u, ckl_u, dkl_u = _elbo_terms(torch, x_u, rec_u, mean_u, ls_u, la_u)
    elbo_u = r_u + s["kl_beta_c"] * torch.abs(ckl_u - s["cmi"]) \
        + s["kl_beta_d"] * torch.abs(dkl_u - s["dmi"])
    loss_unsup = s["ew"] * elbo_u
    loss_unsup.backward()
    opt.step()
    opt.zero_grad()
    return float(loss_sup.detach()) + float(loss_unsup.detach())


# ---------------------------------------------------------------------------
# shared harness
# ---------------------------------------------------------------------------


def _draw_noise(rng, with_mixup: bool, m2: bool = False):
    """One step's injected randomness, as numpy (shared by both sides)."""
    n = {}
    if m2:
        n["eps_1"] = rng.standard_normal((B, LDC)).astype(np.float32)
        n["eps_2"] = rng.standard_normal((B, LDC)).astype(np.float32)
        n["unif_2"] = rng.random((B, K)).astype(np.float32)
        return n
    for i in range(1, 5):
        n[f"eps_{i}"] = rng.standard_normal((B, LDC)).astype(np.float32)
    n["unif_3"] = rng.random((B, K)).astype(np.float32)
    n["unif_4"] = rng.random((B, K)).astype(np.float32)
    if with_mixup:
        n["lam_sm"] = np.float32(rng.beta(0.1, 0.1))
        n["perm_sm"] = rng.permutation(B).astype(np.int32)
        n["lam_mx"] = np.float32(rng.beta(2.0, 2.0))
        n["perm_mx"] = rng.permutation(B).astype(np.int32)
    return n


def _to_torch_noise(torch, n):
    out = {}
    for k, v in n.items():
        if k.startswith("lam"):
            out[k] = float(v)
        elif k.startswith("perm"):
            out[k] = torch.tensor(np.asarray(v, dtype=np.int64))
        else:
            out[k] = torch.tensor(v)
    return out


def _compare_with_torch(torch, ref, state, model_kind, step_idx, *,
                        param_tol=6e-3, stat_tol=6e-3):
    """Post-step params + BN running stats: torch state_dict vs our trees.

    Tolerances: the per-step divergence starts at ~1e-4 (conv-backend f32
    differences between XLA CPU and torch CPU) and compounds ~2x per step
    through the momentum buffer, while the loss stays matched to ~1e-5 rel —
    measured drift, not semantic error. 6e-3 bounds step 5 with margin;
    a real composition bug (wrong term, wrong weight, wrong BN ordering)
    shows up orders of magnitude above this on step 0/1.
    """
    from shotvae_tpu.io.torch_compat import (import_torch_state_dict,
                                             merge_imported)

    imported_p, imported_s = import_torch_state_dict(
        {k: v for k, v in ref.state_dict().items()}, model_kind)
    want_p, want_s = merge_imported(state.params, state.batch_stats,
                                    imported_p, imported_s)

    def max_diff(got_tree, want_tree):
        diffs = [float(jnp.max(jnp.abs(g - w))) for g, w in zip(
            jax.tree_util.tree_leaves(got_tree),
            jax.tree_util.tree_leaves(want_tree))]
        return max(diffs)
    dp = max_diff(state.params, want_p)
    ds = max_diff(state.batch_stats, want_s)
    assert dp < param_tol, f"step {step_idx}: param max diff {dp}"
    assert ds < stat_tol, f"step {step_idx}: BN stat max diff {ds}"
    return dp, ds


def _make_jax_side(model_kind, seed=0):
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    model = VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        continuous_latent_dim=LDC, disc_latent_dim=K, sample_temperature=T)
    params, stats = init_model(model, jax.random.key(seed),
                               jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=stats,
                              tx=sgd_torch(LR, momentum=MOM, weight_decay=WD))
    return model, state


def _import_ref_weights(ref, state, model_kind):
    from shotvae_tpu.io.torch_compat import (import_torch_state_dict,
                                             merge_imported)

    imported_p, imported_s = import_torch_state_dict(
        {k: v for k, v in ref.state_dict().items()}, model_kind)
    p, s = merge_imported(state.params, state.batch_stats, imported_p,
                          imported_s)
    return state.replace(params=p, batch_stats=s,
                         opt_state=state.tx.init(p))


def _data(rng):
    img_l = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
    img_u = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
    lab_l = rng.integers(0, K, (B,)).astype(np.int32)
    lab_u = rng.integers(0, K, (B,)).astype(np.int32)
    return img_l, lab_l, img_u, lab_u


def _torch_inputs(torch, img_l, lab_l, img_u):
    x_l = torch.tensor(img_l.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    x_u = torch.tensor(img_u.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    return x_l, torch.tensor(lab_l.astype(np.int64)), x_u


# ---------------------------------------------------------------------------
# the lockstep tests
# ---------------------------------------------------------------------------


class TestShotVaeLockstep:
    def test_five_steps_match_reference(self, torch):
        ref_vae = _ref_vae_module()

        from shotvae_tpu.train import steps as steps_lib

        torch.manual_seed(0)
        ref = ref_vae.VariationalAutoEncoder(
            encoder_name="wideresnet-10-1", num_input_channels=3,
            img_size=(32, 32), data_parallel=False,
            continuous_latent_dim=LDC, disc_latent_dim=K,
            sample_temperature=T, small_input=True)
        ref.train()
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=MOM,
                              weight_decay=WD)

        model, state = _make_jax_side("vae")
        state = _import_ref_weights(ref, state, "vae")
        raw_step = steps_lib.make_shot_vae_train_step(
            model, num_classes=K, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False,
            aug=steps_lib.AugmentConfig(enabled=False))
        step_jit = jax.jit(raw_step)
        sched = {k: jnp.float32(v) for k, v in SCHED.items()}

        rng = np.random.default_rng(7)
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)

        for it in range(N_STEPS):
            n = _draw_noise(rng, with_mixup=True)
            torch_loss = _torch_shot_step(torch, ref, opt, x_l_t, lab_l_t,
                                          x_u_t, _to_torch_noise(torch, n))
            inject = {k: jnp.asarray(v) for k, v in n.items()}
            state, metrics = step_jit(
                state, jnp.asarray(img_l), jnp.asarray(lab_l),
                jnp.asarray(img_u), jnp.asarray(lab_u), sched,
                jax.random.key(it), inject)
            our_loss = float(metrics["loss"])
            assert np.isclose(our_loss, torch_loss, rtol=2e-3, atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {torch_loss}")
            dp, ds = _compare_with_torch(torch, ref, state, "vae", it)
            print(f"shot step {it}: loss Δ={abs(our_loss - torch_loss):.2e} "
                  f"param Δ={dp:.2e} stat Δ={ds:.2e}")


class TestM2Lockstep:
    def test_five_steps_match_reference(self, torch):
        ref_vae = _ref_vae_module()

        from shotvae_tpu.train import steps as steps_lib

        torch.manual_seed(1)
        ref = ref_vae.VariationalAutoEncoder(
            encoder_name="wideresnet-10-1", num_input_channels=3,
            img_size=(32, 32), data_parallel=False,
            continuous_latent_dim=LDC, disc_latent_dim=K,
            sample_temperature=T, small_input=True)
        ref.train()
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=MOM,
                              weight_decay=WD)

        model, state = _make_jax_side("vae")
        state = _import_ref_weights(ref, state, "vae")
        raw_step = steps_lib.make_m2_train_step(
            model, num_classes=K, bce=True, x_sigma=1.0,
            aug=steps_lib.AugmentConfig(enabled=False))
        step_jit = jax.jit(raw_step)
        sched = {k: jnp.float32(v) for k, v in SCHED.items()}

        rng = np.random.default_rng(8)
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)

        for it in range(N_STEPS):
            n = _draw_noise(rng, with_mixup=False, m2=True)
            torch_loss = _torch_m2_step(torch, ref, opt, x_l_t, lab_l_t,
                                        x_u_t, _to_torch_noise(torch, n))
            inject = {k: jnp.asarray(v) for k, v in n.items()}
            state, metrics = step_jit(
                state, jnp.asarray(img_l), jnp.asarray(lab_l),
                jnp.asarray(img_u), jnp.asarray(lab_u), sched,
                jax.random.key(it), inject)
            our_loss = float(metrics["loss"])
            assert np.isclose(our_loss, torch_loss, rtol=2e-3, atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {torch_loss}")
            dp, ds = _compare_with_torch(torch, ref, state, "vae", it)
            print(f"m2 step {it}: loss Δ={abs(our_loss - torch_loss):.2e} "
                  f"param Δ={dp:.2e} stat Δ={ds:.2e}")


class TestClassifierLockstep:
    def test_five_steps_match_reference(self, torch):
        maybe_cls = _ref_classifier_module()

        from shotvae_tpu.models import WideResNetClassifier
        from shotvae_tpu.train import steps as steps_lib
        from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

        torch.manual_seed(2)
        ref = maybe_cls.WideResNet(num_input_channels=3, depth=10, width=1,
                                   num_classes=K, data_parallel=False,
                                   small_input=True)
        ref.train()
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=MOM,
                              weight_decay=WD)
        crit = torch.nn.CrossEntropyLoss()

        model = WideResNetClassifier(depth=10, width=1, num_classes=K)
        params, stats = init_model(model, jax.random.key(3),
                                   jnp.zeros((1, 32, 32, 3)))
        state = TrainState.create(
            apply_fn=model.apply, params=params, batch_stats=stats,
            tx=sgd_torch(LR, momentum=MOM, weight_decay=WD))
        state = _import_ref_weights(ref, state, "classifier")
        raw_step = steps_lib.make_classifier_train_step(
            model, aug=steps_lib.AugmentConfig(enabled=False))
        step_jit = jax.jit(raw_step)

        rng = np.random.default_rng(9)
        img, lab, _, _ = _data(rng)
        x_t = torch.tensor(img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
        lab_t = torch.tensor(lab.astype(np.int64))

        for it in range(N_STEPS):
            loss_t = crit(ref(x_t), lab_t)  # main_classifier.py:193-197
            loss_t.backward()
            opt.step()
            opt.zero_grad()
            state, metrics = step_jit(state, jnp.asarray(img),
                                      jnp.asarray(lab), jax.random.key(it))
            our_loss = float(metrics["cls_loss"])
            assert np.isclose(our_loss, float(loss_t), rtol=2e-3,
                              atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {float(loss_t)}")
            dp, ds = _compare_with_torch(torch, ref, state, "classifier", it)
            print(f"cls step {it}: loss Δ={abs(our_loss - float(loss_t)):.2e}"
                  f" param Δ={dp:.2e} stat Δ={ds:.2e}")


# ---------------------------------------------------------------------------
# smooth-ELBO (main_smooth_ELBO_mnist.py:131-341) — the Adam trainer
# ---------------------------------------------------------------------------

SM_EPS = 1e-12           # mnist_vae.py:6
SM_CONT_CAP = (0.0, 17.5, 25000.0, 30.0)   # main args defaults
SM_DISC_CAP = (0.0, 17.0, 25000.0, 30.0)
SM_ALPHA = 50.0
SM_LR = 5e-4
SM_CONT, SM_K = 10, 10


def _ref_smooth_module():
    return _fresh_ref_import("smooth_vae_model", "mnist_vae", ["svhn_vae"])


def _torch_smooth_forward(torch, ref, x, eps, unif=None, onehot=None):
    """mnist_vae.py:256-267 with reparameterize inlined (labeled path
    hardcodes .cuda(), mnist_vae.py:175)."""
    dist = ref.encode(x)
    mean, logvar = dist["cont"]
    z = mean + torch.exp(0.5 * logvar) * eps              # :187-205
    if onehot is not None:                                 # :169-178
        y = onehot
    else:                                                  # :210-229
        gumbel = -torch.log(-torch.log(unif + SM_EPS) + SM_EPS)
        y = torch.softmax((torch.log(dist["disc"][0] + SM_EPS) + gumbel)
                          / ref.temperature, dim=1)
    recon = ref.decode(torch.cat([z, y], dim=1))
    return recon, dist


def _torch_smooth_loss(torch, x, recon, dist, num_steps, onehot=None,
                       cont_cap=None, disc_cap=None, alpha_w=None, k=None):
    """_loss_function (main_smooth_ELBO_mnist.py:228-302) re-evaluated.

    Defaults are the MNIST trainer's constants; the SVHN trainer
    (main_smooth_ELBO_svhn.py:232-305) runs the IDENTICAL math with
    different constants (caps (0,50,50000,1), alpha 1500) and nn.BCELoss
    in place of F.binary_cross_entropy (same function underneath)."""
    F = torch.nn.functional
    cont_cap = SM_CONT_CAP if cont_cap is None else cont_cap
    disc_cap = SM_DISC_CAP if disc_cap is None else disc_cap
    alpha_w = SM_ALPHA if alpha_w is None else alpha_w
    k = SM_K if k is None else k
    P = x.numel() // x.size(0)
    recon_loss = F.mse_loss(recon.view(-1, P), x.view(-1, P)) * P
    mean, logvar = dist["cont"]
    kl_values = -0.5 * (1 + logvar - mean.pow(2) - logvar.exp())
    kl_cont = torch.sum(torch.mean(kl_values, dim=0))
    c_min, c_max, c_iters, c_gamma = cont_cap
    c_cap = min((c_max - c_min) * num_steps / c_iters + c_min, c_max)
    cont_cap_loss = c_gamma * torch.abs(c_cap - kl_cont)
    alpha = dist["disc"][0]
    neg_ent = torch.mean(torch.sum(alpha * torch.log(alpha + SM_EPS), dim=1))
    kl_disc = math.log(k) + neg_ent
    d_min, d_max, d_iters, d_gamma = disc_cap
    d_cap = min((d_max - d_min) * num_steps / d_iters + d_min, d_max,
                math.log(k))
    disc_cap_loss = d_gamma * torch.abs(d_cap - kl_disc)
    loss = recon_loss + cont_cap_loss + disc_cap_loss
    if onehot is not None:
        loss = loss + alpha_w * F.binary_cross_entropy(alpha, onehot)
    return loss


class TestSmoothElboLockstep:
    def test_five_steps_match_reference(self, torch):
        ref_mod = _ref_smooth_module()

        from shotvae_tpu.io.torch_compat import (import_smooth_vae_state_dict,
                                                 merge_imported)
        from shotvae_tpu.models import SmoothVAE, mnist_vae_config
        from shotvae_tpu.train import steps as steps_lib
        from shotvae_tpu.train.state import TrainState, adam_torch, init_model

        torch.manual_seed(4)
        ref = ref_mod.mnist_VAE(
            img_size=(1, 32, 32),
            latent_spec={"cont": SM_CONT, "disc": [SM_K]},
            temperature=T, use_cuda=False)
        ref.train()
        opt = torch.optim.Adam(ref.parameters(), lr=SM_LR)

        model = SmoothVAE(**mnist_vae_config())
        params, stats = init_model(model, jax.random.key(5),
                                   jnp.zeros((1, 32, 32, 1)))

        def import_ref(template_p, template_s):
            ip, istats = import_smooth_vae_state_dict(
                {k: v for k, v in ref.state_dict().items()})
            return merge_imported(template_p, template_s, ip, istats)

        p0, s0 = import_ref(params, stats)
        state = TrainState.create(apply_fn=model.apply, params=p0,
                                  batch_stats=s0, tx=adam_torch(SM_LR))

        raw_step = steps_lib.make_smooth_elbo_train_step(
            model, alpha=SM_ALPHA, cont_capacity=SM_CONT_CAP,
            disc_capacity=SM_DISC_CAP, disc_dims=(SM_K,))
        step_jit = jax.jit(raw_step)

        rng = np.random.default_rng(11)
        img_u = rng.integers(0, 256, (B, 32, 32, 1)).astype(np.uint8)
        img_l = rng.integers(0, 256, (B, 32, 32, 1)).astype(np.uint8)
        lab_l = rng.integers(0, SM_K, (B,)).astype(np.int32)
        # ToTensor + Normalize(0.5): [-1, 1]. Built NCHW-NATIVE: a permuted
        # C=1 NHWC tensor is classified channels-last by torch, flipping the
        # conv output layout and breaking the reference's .view()
        x_u_t = torch.from_numpy(
            np.ascontiguousarray(img_u.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        x_l_t = torch.from_numpy(
            np.ascontiguousarray(img_l.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        onehot_t = _onehot(torch, torch.tensor(lab_l.astype(np.int64)))

        for it in range(N_STEPS):
            eps_u = rng.standard_normal((B, SM_CONT)).astype(np.float32)
            unif_u = rng.uniform(1e-4, 1 - 1e-4,
                                 (B, SM_K)).astype(np.float32)
            eps_l = rng.standard_normal((B, SM_CONT)).astype(np.float32)
            num_steps = it + 1   # self.num_steps += 1 before the losses

            recon_u, dist_u = _torch_smooth_forward(
                torch, ref, x_u_t, torch.tensor(eps_u),
                unif=torch.tensor(unif_u))
            loss_u = _torch_smooth_loss(torch, x_u_t, recon_u, dist_u,
                                        num_steps)
            recon_l, dist_l = _torch_smooth_forward(
                torch, ref, x_l_t, torch.tensor(eps_l), onehot=onehot_t)
            loss_l = _torch_smooth_loss(torch, x_l_t, recon_l, dist_l,
                                        num_steps, onehot=onehot_t)
            loss_t = loss_u + loss_l
            opt.zero_grad()
            loss_t.backward()
            opt.step()

            inject = {"u": {"eps": jnp.asarray(eps_u),
                            "unif": [jnp.asarray(unif_u)]},
                      "l": {"eps": jnp.asarray(eps_l)}}
            state, metrics = step_jit(state, jnp.asarray(img_u),
                                      jnp.asarray(img_l), jnp.asarray(lab_l),
                                      jax.random.key(it), inject)
            our_loss = float(metrics["loss"])
            ref_loss = float(loss_t.detach())
            assert np.isclose(our_loss, ref_loss, rtol=2e-3, atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {ref_loss}")

            want_p, _ = import_ref(state.params, state.batch_stats)
            dp = max(float(jnp.max(jnp.abs(g - w))) for g, w in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(want_p)))
            assert dp < 6e-3, f"step {it}: param max diff {dp}"
            print(f"smooth step {it}: loss Δ={abs(our_loss - ref_loss):.2e} "
                  f"param Δ={dp:.2e}")
