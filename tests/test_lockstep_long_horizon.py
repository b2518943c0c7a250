"""Long-horizon lockstep drift study + smooth-ELBO SVHN lockstep.

VERDICT r3 #5: the 5-step lockstep goldens (test_train_lockstep.py) pin the
composed step math but leave divergence growth over hundreds of steps
unbounded. This file runs the SHOT-VAE lockstep for 150 steps at the
production optimizer (SGD lr=0.1, momentum 0.9, wd 5e-4,
main_shot_vae.py:198) with FRESH data every step (like real training; the
5-step tests reuse one batch) and asserts the cross-framework parameter
divergence stays bounded: the only divergence source is conv-backend f32
rounding (XLA CPU vs torch CPU), which must behave as compounding noise,
not a systematic drift — a wrong term/weight/BN-ordering diverges orders of
magnitude faster (measured curve: docs/PERF.md "Long-horizon lockstep
drift").

Also: a 3-step lockstep for the smooth-ELBO SVHN family
(main_smooth_ELBO_svhn.py:141-190 + :232-305), previously forward-golden
only — same injected-randomness discipline, svhn_VAE oracle with imported
weights, SVHN constants (caps (0,50,50000,1), alpha=1500, lr=1e-3, Adam).

Skipped when /root/reference is not mounted.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_train_lockstep as lk
from test_train_lockstep import (  # noqa: F401  (torch fixture re-export)
    B, K, LDC, LR, MOM, SCHED, T, WD,
    _data, _draw_noise, _import_ref_weights, _make_jax_side, _onehot,
    _to_torch_noise, _torch_inputs, _torch_shot_step, torch,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

DRIFT_STEPS = 150
LOG_EVERY = 10


def _flat(tree):
    return jnp.concatenate([jnp.ravel(leaf.astype(jnp.float32))
                            for leaf in jax.tree_util.tree_leaves(tree)])


def _rel_l2(state, ref, model_kind):
    """Global relative L2 divergence of (params, BN stats) vs the torch
    model: ||ours - theirs|| / ||theirs||, one scalar per tree."""
    from shotvae_tpu.io.torch_compat import (import_torch_state_dict,
                                             merge_imported)

    ip, istats = import_torch_state_dict(
        {k: v for k, v in ref.state_dict().items()}, model_kind)
    want_p, want_s = merge_imported(state.params, state.batch_stats, ip,
                                    istats)

    def rel(a, b):
        fa, fb = _flat(a), _flat(b)
        return float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fb) + 1e-12))

    return rel(state.params, want_p), rel(state.batch_stats, want_s)


def _run_drift(torch, *, lr, steps, log_every=LOG_EVERY, seed=51,
               data_seed=52):
    """Run the SHOT-VAE lockstep (fresh data every step, injected noise,
    torch oracle stepping its own SGD) for `steps` steps at learning rate
    `lr`; return (curve, loss_rel_max) where curve holds
    (step, param_relL2, stat_relL2, loss_relΔ) at each logged step."""
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, sgd_torch

    ref_vae = lk._ref_vae_module()
    torch.manual_seed(seed)
    ref = ref_vae.VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        img_size=(32, 32), data_parallel=False,
        continuous_latent_dim=LDC, disc_latent_dim=K,
        sample_temperature=T, small_input=True)
    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=lr, momentum=MOM,
                          weight_decay=WD)

    model, state = _make_jax_side("vae")
    if lr != LR:  # _make_jax_side builds an SGD(LR) optimizer
        state = TrainState.create(
            apply_fn=state.apply_fn, params=state.params,
            batch_stats=state.batch_stats,
            tx=sgd_torch(lr, momentum=MOM, weight_decay=WD))
    state = _import_ref_weights(ref, state, "vae")
    raw_step = steps_lib.make_shot_vae_train_step(
        model, num_classes=K, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False,
        aug=steps_lib.AugmentConfig(enabled=False))
    step_jit = jax.jit(raw_step)
    sched = {k: jnp.float32(v) for k, v in SCHED.items()}

    rng = np.random.default_rng(data_seed)
    curve = []
    loss_rel_max = 0.0
    for it in range(steps):
        # fresh batch per step — real-training regime, and it keeps the
        # trajectory from collapsing onto one overfit batch
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)
        n = _draw_noise(rng, with_mixup=True)
        torch_loss = _torch_shot_step(torch, ref, opt, x_l_t, lab_l_t,
                                      x_u_t, _to_torch_noise(torch, n))
        inject = {k: jnp.asarray(v) for k, v in n.items()}
        state, metrics = step_jit(
            state, jnp.asarray(img_l), jnp.asarray(lab_l),
            jnp.asarray(img_u), jnp.asarray(lab_u), sched,
            jax.random.key(it), inject)
        our_loss = float(metrics["loss"])
        loss_rel = abs(our_loss - torch_loss) / (abs(torch_loss) + 1e-12)
        loss_rel_max = max(loss_rel_max, loss_rel)
        if (it + 1) % log_every == 0 or it == 0:
            rp, rs = _rel_l2(state, ref, "vae")
            curve.append((it + 1, rp, rs, loss_rel))
            print(f"drift lr={lr} step {it + 1:3d}: param relL2={rp:.3e} "
                  f"stat relL2={rs:.3e} loss relΔ={loss_rel:.3e}")
    return curve, loss_rel_max


class TestShotLongHorizonDrift:
    """Measured behavior (curve committed in docs/PERF.md §"Long-horizon
    lockstep drift"): at the production lr=0.1+momentum the two frameworks'
    trajectories separate exponentially from conv-backend f32 rounding
    (XLA CPU vs torch CPU differ by ~1 ulp per conv) and SATURATE at
    ~9e-2 relative L2 by step ~80 — Lyapunov divergence of a chaotic
    optimizer, not a math bug. The correctness signals that distinguish
    rounding-chaos from a composition error, each asserted below:
      * per-step losses stay individually matched (≤ few·1e-3 relΔ) for
        all 150 steps even after the weights separate — both nets remain
        statistically equivalent trainers on every fresh batch;
      * the divergence PLATEAUS (no late acceleration; a wrong term/
        weight/BN-ordering keeps compounding through the bound in a few
        steps and its loss Δ grows with it);
      * the divergence RATE is lr-controlled: the low-lr control arm
        below sits orders of magnitude lower at the same step count,
        which only happens if the perturbation source is update-path
        rounding noise rather than a systematic model/loss difference
        (a term-composition bug diverges at every lr)."""

    def test_150_step_divergence_saturates(self, torch):
        curve, loss_rel_max = _run_drift(torch, lr=LR, steps=DRIFT_STEPS)
        final_step, final_rp, final_rs, _ = curve[-1]
        assert final_step == DRIFT_STEPS
        # measured 9.3e-2 param / 3.6e-1 stat at step 150; ~2x headroom
        assert final_rp < 0.2, f"param divergence {final_rp} at 150 steps"
        assert final_rs < 0.7, f"BN stat divergence {final_rs} at 150 steps"
        # per-step losses must stay individually matched the whole way
        # (measured max 3.0e-3 — the primary composition-correctness signal)
        assert loss_rel_max < 2e-2, f"worst per-step loss relΔ {loss_rel_max}"
        # saturation guard: measured 9.18e-2@100 -> 9.32e-2@150 (1.015x);
        # systematic error keeps compounding instead of flattening
        mid_rp = dict((s, p) for s, p, *_ in curve)[100]
        assert final_rp < 2 * max(mid_rp, 1e-6), (
            f"param divergence accelerating: {mid_rp} -> {final_rp}")

    def test_low_lr_control_arm_pins_chaos_origin(self, torch):
        """lr=1e-3 (lr/100), same 40 steps the lr=0.1 arm reaches 6.7e-2
        by: rounding noise amplified through the update path must come
        down by orders of magnitude with the step size; a systematic
        forward/loss difference would not."""
        curve, loss_rel_max = _run_drift(torch, lr=1e-3, steps=40,
                                         log_every=10)
        _, final_rp, _, _ = curve[-1]
        assert final_rp < 5e-3, (
            f"low-lr param divergence {final_rp} — not rounding-noise-"
            "dominated; check the step math")
        assert loss_rel_max < 2e-3, f"low-lr loss relΔ {loss_rel_max}"


# ---------------------------------------------------------------------------
# M2 / classifier drift (VERDICT r4 #4: the same chaos-calibrated 150-step
# methodology for the families that previously stopped at 5 steps)
# ---------------------------------------------------------------------------


def _drift_measure(steps, log_every, do_step, measure, tag):
    """Shared drift loop: `do_step(it) -> (torch_loss, our_loss)` advances
    BOTH frameworks one step on fresh data; `measure() -> (param_relL2,
    stat_relL2)` reads the cross-framework divergence. Returns the same
    (curve, loss_rel_max) shape as `_run_drift`."""
    curve = []
    loss_rel_max = 0.0
    for it in range(steps):
        torch_loss, our_loss = do_step(it)
        loss_rel = abs(our_loss - torch_loss) / (abs(torch_loss) + 1e-12)
        loss_rel_max = max(loss_rel_max, loss_rel)
        if (it + 1) % log_every == 0 or it == 0:
            rp, rs = measure()
            curve.append((it + 1, rp, rs, loss_rel))
            print(f"{tag} drift step {it + 1:3d}: param relL2={rp:.3e} "
                  f"stat relL2={rs:.3e} loss relΔ={loss_rel:.3e}")
    return curve, loss_rel_max


def _run_drift_m2(torch, *, lr, steps, log_every=LOG_EVERY, seed=53,
                  data_seed=54):
    """M2 lockstep (main_M2_vae.py:242-330) for `steps` steps, fresh data
    every step, injected eps/gumbel noise, torch oracle stepping its SGD."""
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, sgd_torch

    ref_vae = lk._ref_vae_module()
    torch.manual_seed(seed)
    ref = ref_vae.VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        img_size=(32, 32), data_parallel=False,
        continuous_latent_dim=LDC, disc_latent_dim=K,
        sample_temperature=T, small_input=True)
    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=lr, momentum=MOM,
                          weight_decay=WD)

    model, state_box = _make_jax_side("vae")
    state_box = TrainState.create(
        apply_fn=state_box.apply_fn, params=state_box.params,
        batch_stats=state_box.batch_stats,
        tx=sgd_torch(lr, momentum=MOM, weight_decay=WD))
    state_box = _import_ref_weights(ref, state_box, "vae")
    raw_step = steps_lib.make_m2_train_step(
        model, num_classes=K, bce=True, x_sigma=1.0,
        aug=steps_lib.AugmentConfig(enabled=False))
    step_jit = jax.jit(raw_step)
    sched = {k: jnp.float32(v) for k, v in SCHED.items()}
    rng = np.random.default_rng(data_seed)
    state = [state_box]

    def do_step(it):
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)
        n = _draw_noise(rng, with_mixup=False, m2=True)
        torch_loss = lk._torch_m2_step(torch, ref, opt, x_l_t, lab_l_t,
                                       x_u_t, _to_torch_noise(torch, n))
        inject = {k: jnp.asarray(v) for k, v in n.items()}
        state[0], metrics = step_jit(
            state[0], jnp.asarray(img_l), jnp.asarray(lab_l),
            jnp.asarray(img_u), jnp.asarray(lab_u), sched,
            jax.random.key(it), inject)
        return torch_loss, float(metrics["loss"])

    return _drift_measure(steps, log_every, do_step,
                          lambda: _rel_l2(state[0], ref, "vae"), f"m2 lr={lr}")


def _run_drift_classifier(torch, *, lr, steps, log_every=LOG_EVERY, seed=55,
                          data_seed=56):
    """Classifier lockstep (main_classifier.py:181-211) for `steps` steps,
    fresh data every step. Deterministic forward (augmentation off) — the
    only divergence source is conv-backend rounding through the optimizer."""
    from shotvae_tpu.models import WideResNetClassifier
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    maybe_cls = lk._ref_classifier_module()
    torch.manual_seed(seed)
    ref = maybe_cls.WideResNet(num_input_channels=3, depth=10, width=1,
                               num_classes=K, data_parallel=False,
                               small_input=True)
    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=lr, momentum=MOM,
                          weight_decay=WD)
    crit = torch.nn.CrossEntropyLoss()

    model = WideResNetClassifier(depth=10, width=1, num_classes=K)
    params, stats = init_model(model, jax.random.key(seed + 1),
                               jnp.zeros((1, 32, 32, 3)))
    st = TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=stats,
        tx=sgd_torch(lr, momentum=MOM, weight_decay=WD))
    st = _import_ref_weights(ref, st, "classifier")
    raw_step = steps_lib.make_classifier_train_step(
        model, aug=steps_lib.AugmentConfig(enabled=False))
    step_jit = jax.jit(raw_step)
    rng = np.random.default_rng(data_seed)
    state = [st]

    def do_step(it):
        img, lab, _, _ = _data(rng)
        x_t = torch.tensor(img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
        loss_t = crit(ref(x_t), torch.tensor(lab.astype(np.int64)))
        loss_t.backward()
        opt.step()
        opt.zero_grad()
        state[0], metrics = step_jit(state[0], jnp.asarray(img),
                                     jnp.asarray(lab), jax.random.key(it))
        return float(loss_t.detach()), float(metrics["cls_loss"])

    return _drift_measure(steps, log_every, do_step,
                          lambda: _rel_l2(state[0], ref, "classifier"),
                          f"cls lr={lr}")


class TestM2LongHorizonDrift:
    """Same three chaos-vs-bug discriminators as the SHOT study. Measured
    (2026-08-19): param relL2 8.06e-2@80 → 8.14e-2@150 (saturated, ratio
    1.01), BN stat 3.7e-1 flat, loss relΔ max 1.3e-3; low-lr arm 9.3e-5@40
    (~870x below). Curves: docs/PERF.md §"Long-horizon drift, all families"."""

    def test_150_step_divergence_saturates(self, torch):
        curve, loss_rel_max = _run_drift_m2(torch, lr=LR, steps=DRIFT_STEPS)
        final_step, final_rp, final_rs, _ = curve[-1]
        assert final_step == DRIFT_STEPS
        assert final_rp < 0.2, f"param divergence {final_rp} at 150 steps"
        assert final_rs < 0.7, f"BN stat divergence {final_rs} at 150 steps"
        assert loss_rel_max < 2e-2, f"worst per-step loss relΔ {loss_rel_max}"
        mid_rp = dict((s, p) for s, p, *_ in curve)[100]
        assert final_rp < 2 * max(mid_rp, 1e-6), (
            f"param divergence accelerating: {mid_rp} -> {final_rp}")

    def test_low_lr_control_arm(self, torch):
        curve, loss_rel_max = _run_drift_m2(torch, lr=1e-3, steps=40)
        _, final_rp, _, _ = curve[-1]
        assert final_rp < 5e-3, f"low-lr param divergence {final_rp}"
        assert loss_rel_max < 2e-3, f"low-lr loss relΔ {loss_rel_max}"


class TestClassifierLongHorizonDrift:
    """Measured (2026-08-19): param relL2 1.82e-1@100 → 2.00e-1@150 —
    slower saturation than the VAE families (the bare WRN sees only ONE
    rounding-noise injection per step vs the VAE's four forwards averaging
    it out, so the walk decorrelates longer), ratio 1.10 over the last 50
    steps and decelerating; loss relΔ max 1.5e-2 (spiky CE on 8 images);
    low-lr arm 1.6e-5@40 (~6000x below lr=0.1's 9.7e-2@40)."""

    def test_150_step_divergence_saturates(self, torch):
        curve, loss_rel_max = _run_drift_classifier(torch, lr=LR,
                                                    steps=DRIFT_STEPS)
        final_step, final_rp, final_rs, _ = curve[-1]
        assert final_step == DRIFT_STEPS
        # measured 2.00e-1@150 — 1.75x headroom
        assert final_rp < 0.35, f"param divergence {final_rp} at 150 steps"
        assert final_rs < 0.7, f"BN stat divergence {final_rs} at 150 steps"
        # measured max 1.5e-2: CE over 8 fresh images is the spikiest loss
        # in the study; 4e-2 keeps 2.7x headroom while still catching a
        # systematic term error (those sit at O(1) relΔ from step 0)
        assert loss_rel_max < 4e-2, f"worst per-step loss relΔ {loss_rel_max}"
        mid_rp = dict((s, p) for s, p, *_ in curve)[100]
        assert final_rp < 2 * max(mid_rp, 1e-6), (
            f"param divergence accelerating: {mid_rp} -> {final_rp}")

    def test_low_lr_control_arm(self, torch):
        curve, loss_rel_max = _run_drift_classifier(torch, lr=1e-3, steps=40)
        _, final_rp, _, _ = curve[-1]
        assert final_rp < 5e-3, f"low-lr param divergence {final_rp}"
        assert loss_rel_max < 2e-3, f"low-lr loss relΔ {loss_rel_max}"

SV_CONT = 32                               # latent_spec cont (svhn :16)
SV_K = 10
SV_CONT_CAP = (0.0, 50.0, 50000.0, 1.0)    # svhn :17-21
SV_DISC_CAP = (0.0, 50.0, 50000.0, 1.0)
SV_ALPHA = 1500.0                          # svhn :23
SV_LR = 1e-3                               # svhn :22
SV_STEPS = 3


class TestSmoothElboSvhnLockstep:
    def test_three_steps_match_reference(self, torch):
        lk._ref_smooth_module()  # path setup; svhn_vae is its sibling
        import svhn_vae as ref_mod

        from shotvae_tpu.io.torch_compat import (import_smooth_vae_state_dict,
                                                 merge_imported)
        from shotvae_tpu.models import SmoothVAE, svhn_vae_config
        from shotvae_tpu.train import steps as steps_lib
        from shotvae_tpu.train.state import TrainState, adam_torch, init_model

        torch.manual_seed(61)
        ref = ref_mod.svhn_VAE(
            img_size=(3, 32, 32),
            latent_spec={"cont": SV_CONT, "disc": [SV_K]},
            temperature=T, use_cuda=False)
        ref.train()
        opt = torch.optim.Adam(ref.parameters(), lr=SV_LR)

        cfg = svhn_vae_config()
        model = SmoothVAE(**cfg)
        params, stats = init_model(model, jax.random.key(62),
                                   jnp.zeros((1, 32, 32, 3)))

        def import_ref(template_p, template_s):
            ip, istats = import_smooth_vae_state_dict(
                {k: v for k, v in ref.state_dict().items()},
                encoder_channels=(32, 64, 128), reshape_channels=128)
            return merge_imported(template_p, template_s, ip, istats)

        p0, s0 = import_ref(params, stats)
        state = TrainState.create(apply_fn=model.apply, params=p0,
                                  batch_stats=s0, tx=adam_torch(SV_LR))

        raw_step = steps_lib.make_smooth_elbo_train_step(
            model, alpha=SV_ALPHA, cont_capacity=SV_CONT_CAP,
            disc_capacity=SV_DISC_CAP, disc_dims=(SV_K,))
        step_jit = jax.jit(raw_step)

        rng = np.random.default_rng(63)
        img_u = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
        img_l = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
        lab_l = rng.integers(0, SV_K, (B,)).astype(np.int32)
        x_u_t = torch.from_numpy(
            np.ascontiguousarray(img_u.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        x_l_t = torch.from_numpy(
            np.ascontiguousarray(img_l.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        onehot_t = _onehot(torch, torch.tensor(lab_l.astype(np.int64)))

        for it in range(SV_STEPS):
            eps_u = rng.standard_normal((B, SV_CONT)).astype(np.float32)
            unif_u = rng.uniform(1e-4, 1 - 1e-4,
                                 (B, SV_K)).astype(np.float32)
            eps_l = rng.standard_normal((B, SV_CONT)).astype(np.float32)
            num_steps = it + 1

            recon_u, dist_u = lk._torch_smooth_forward(
                torch, ref, x_u_t, torch.tensor(eps_u),
                unif=torch.tensor(unif_u))
            loss_u = lk._torch_smooth_loss(
                torch, x_u_t, recon_u, dist_u, num_steps,
                cont_cap=SV_CONT_CAP, disc_cap=SV_DISC_CAP,
                alpha_w=SV_ALPHA, k=SV_K)
            recon_l, dist_l = lk._torch_smooth_forward(
                torch, ref, x_l_t, torch.tensor(eps_l), onehot=onehot_t)
            loss_l = lk._torch_smooth_loss(
                torch, x_l_t, recon_l, dist_l, num_steps, onehot=onehot_t,
                cont_cap=SV_CONT_CAP, disc_cap=SV_DISC_CAP,
                alpha_w=SV_ALPHA, k=SV_K)
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
            print(f"svhn smooth step {it}: "
                  f"loss Δ={abs(our_loss - ref_loss):.2e} param Δ={dp:.2e}")


def _run_drift_smooth_svhn(torch, *, lr, steps, log_every=LOG_EVERY,
                           seed=65, data_seed=66):
    """Smooth-ELBO SVHN lockstep (main_smooth_ELBO_svhn.py:232-305) for
    `steps` steps with FRESH data each step — Adam at the production lr
    (1e-3, svhn :22) or the control arm's. No BN in this family, so the
    stat channel of the curve is the (empty→0) placeholder."""
    lk._ref_smooth_module()
    import svhn_vae as ref_mod

    from shotvae_tpu.io.torch_compat import (import_smooth_vae_state_dict,
                                             merge_imported)
    from shotvae_tpu.models import SmoothVAE, svhn_vae_config
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, adam_torch, init_model

    torch.manual_seed(seed)
    ref = ref_mod.svhn_VAE(
        img_size=(3, 32, 32), latent_spec={"cont": SV_CONT, "disc": [SV_K]},
        temperature=T, use_cuda=False)
    ref.train()
    opt = torch.optim.Adam(ref.parameters(), lr=lr)

    cfg = svhn_vae_config()
    model = SmoothVAE(**cfg)
    params, stats = init_model(model, jax.random.key(seed + 1),
                               jnp.zeros((1, 32, 32, 3)))

    def import_ref(template_p, template_s):
        ip, istats = import_smooth_vae_state_dict(
            {k: v for k, v in ref.state_dict().items()},
            encoder_channels=(32, 64, 128), reshape_channels=128)
        return merge_imported(template_p, template_s, ip, istats)

    p0, s0 = import_ref(params, stats)
    state = [TrainState.create(apply_fn=model.apply, params=p0,
                               batch_stats=s0, tx=adam_torch(lr))]
    step_jit = jax.jit(steps_lib.make_smooth_elbo_train_step(
        model, alpha=SV_ALPHA, cont_capacity=SV_CONT_CAP,
        disc_capacity=SV_DISC_CAP, disc_dims=(SV_K,)))
    rng = np.random.default_rng(data_seed)

    def do_step(it):
        img_u = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
        img_l = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
        lab_l = rng.integers(0, SV_K, (B,)).astype(np.int32)
        x_u_t = torch.from_numpy(
            np.ascontiguousarray(img_u.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        x_l_t = torch.from_numpy(
            np.ascontiguousarray(img_l.transpose(0, 3, 1, 2))
            .astype(np.float32) / 255.0) * 2.0 - 1.0
        onehot_t = _onehot(torch, torch.tensor(lab_l.astype(np.int64)))
        eps_u = rng.standard_normal((B, SV_CONT)).astype(np.float32)
        unif_u = rng.uniform(1e-4, 1 - 1e-4, (B, SV_K)).astype(np.float32)
        eps_l = rng.standard_normal((B, SV_CONT)).astype(np.float32)
        num_steps = it + 1

        recon_u, dist_u = lk._torch_smooth_forward(
            torch, ref, x_u_t, torch.tensor(eps_u), unif=torch.tensor(unif_u))
        loss_u = lk._torch_smooth_loss(
            torch, x_u_t, recon_u, dist_u, num_steps, cont_cap=SV_CONT_CAP,
            disc_cap=SV_DISC_CAP, alpha_w=SV_ALPHA, k=SV_K)
        recon_l, dist_l = lk._torch_smooth_forward(
            torch, ref, x_l_t, torch.tensor(eps_l), onehot=onehot_t)
        loss_l = lk._torch_smooth_loss(
            torch, x_l_t, recon_l, dist_l, num_steps, onehot=onehot_t,
            cont_cap=SV_CONT_CAP, disc_cap=SV_DISC_CAP, alpha_w=SV_ALPHA,
            k=SV_K)
        loss_t = loss_u + loss_l
        opt.zero_grad()
        loss_t.backward()
        opt.step()

        inject = {"u": {"eps": jnp.asarray(eps_u),
                        "unif": [jnp.asarray(unif_u)]},
                  "l": {"eps": jnp.asarray(eps_l)}}
        state[0], metrics = step_jit(state[0], jnp.asarray(img_u),
                                     jnp.asarray(img_l), jnp.asarray(lab_l),
                                     jax.random.key(it), inject)
        return float(loss_t.detach()), float(metrics["loss"])

    def measure():
        want_p, _ = import_ref(state[0].params, state[0].batch_stats)
        fa = _flat(state[0].params)
        fb = _flat(want_p)
        rp = float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fb) + 1e-12))
        return rp, 0.0

    return _drift_measure(steps, log_every, do_step, measure,
                          f"svhn-smooth lr={lr}")


class TestSmoothSvhnLongHorizonDrift:
    """Measured (2026-08-19): param relL2 grows NEAR-LINEARLY (~1.4e-3/step,
    1.49e-1@100 → 2.06e-1@150, ratio 1.38 < the 2x acceleration bound) —
    Adam's per-parameter normalisation keeps injecting a constant-size
    rounding kick regardless of the gradient scale, so the walk doesn't
    flatten the way the SGD+momentum families do. The bug/chaos
    discriminators still hold: per-step losses matched throughout (max
    relΔ 1.4e-3), growth decelerating not accelerating, and the lr=1e-5
    control arm at 4.0e-6@40 vs this arm's 6.2e-2@40 (~15000x) pins the
    divergence to the update path, not the forward/loss math."""

    def test_150_step_divergence_bounded(self, torch):
        curve, loss_rel_max = _run_drift_smooth_svhn(torch, lr=SV_LR,
                                                     steps=DRIFT_STEPS)
        final_step, final_rp, _, _ = curve[-1]
        assert final_step == DRIFT_STEPS
        # measured 2.06e-1@150 — 1.7x headroom
        assert final_rp < 0.35, f"param divergence {final_rp} at 150 steps"
        assert loss_rel_max < 2e-2, f"worst per-step loss relΔ {loss_rel_max}"
        mid_rp = dict((s, p) for s, p, *_ in curve)[100]
        assert final_rp < 2 * max(mid_rp, 1e-6), (
            f"param divergence accelerating: {mid_rp} -> {final_rp}")

    def test_low_lr_control_arm(self, torch):
        curve, loss_rel_max = _run_drift_smooth_svhn(torch, lr=1e-5,
                                                     steps=40)
        _, final_rp, _, _ = curve[-1]
        assert final_rp < 5e-3, f"low-lr param divergence {final_rp}"
        assert loss_rel_max < 2e-3, f"low-lr loss relΔ {loss_rel_max}"
