"""Lockstep goldens for the round-2 uncovered paths (VERDICT r2 #4).

Three extensions over test_train_lockstep.py, same injected-randomness
discipline (identical draws fed to both frameworks, torch reference models
with imported weights as the oracle):

(a) ``--om`` optimal-match mixup — partner selection comes from the LIVE
    posteriors on both sides (our vectorised pairwise-KL argmin vs the
    reference's O(B^2) loop + topk-2nd-smallest, lib/utils/mixup.py:10-18),
    only lambda is injected; 5 full training steps must stay matched.
(b) per-replica-BN shard_map step — vs a manual 2-replica nn.DataParallel
    simulation in torch (per-replica BN batch stats, replica-0 running
    stats, gradient averaging; shot_vae_model/vae.py:96-132 semantics).
(c) eval metrics — ``make_vae_eval_step`` vs the reference ``valid()``
    metric math (main_shot_vae.py:409-458: criterion terms, the ad-hoc
    ELBO = mse + 0.01*(KLc+KLd), top-1/top-5, tail-batch masking) with
    injected eval-time sampling noise.

Skipped when /root/reference is not mounted.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_train_lockstep as lk
from test_train_lockstep import (  # noqa: F401  (torch fixture re-export)
    B, K, LDC, LR, MOM, N_STEPS, SCHED, T, WD,
    _compare_with_torch, _data, _draw_noise, _import_ref_weights,
    _make_jax_side, _onehot, _ref_forward, _ref_vae_module,
    _to_torch_noise, _torch_inputs, _torch_optimal_index, _torch_shot_losses,
    _torch_shot_step, torch,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _fresh_ref_vae(torch, seed):
    ref_vae = _ref_vae_module()
    torch.manual_seed(seed)
    ref = ref_vae.VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        img_size=(32, 32), data_parallel=False,
        continuous_latent_dim=LDC, disc_latent_dim=K,
        sample_temperature=T, small_input=True)
    ref.train()
    return ref


# ---------------------------------------------------------------------------
# (a) optimal-match mixup
# ---------------------------------------------------------------------------


class TestOptimalMatchLockstep:
    def test_partner_selection_matches_reference_loop(self, torch):
        """optimal_match_index == the reference's O(B^2) topk-2nd-smallest
        on random posteriors (lib/utils/mixup.py:10-18)."""
        from shotvae_tpu.ops.mixup import optimal_match_index

        rng = np.random.default_rng(21)
        for trial in range(3):
            mean = rng.standard_normal((16, LDC)).astype(np.float32)
            ls = (0.3 * rng.standard_normal((16, LDC))).astype(np.float32)
            ours = np.asarray(optimal_match_index(jnp.asarray(mean),
                                                  jnp.asarray(ls)))
            want = _torch_optimal_index(torch, torch.tensor(mean),
                                        torch.tensor(ls)).numpy()
            np.testing.assert_array_equal(ours, want)

    def test_five_steps_match_reference_om(self, torch):
        """Full SHOT lockstep with --om: the partner permutation is NOT
        injected — both sides derive it from their own live posteriors, so
        any pairwise-KL/argmin divergence breaks parameter parity."""
        from shotvae_tpu.train import steps as steps_lib

        ref = _fresh_ref_vae(torch, 31)
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=MOM,
                              weight_decay=WD)
        model, state = _make_jax_side("vae")
        state = _import_ref_weights(ref, state, "vae")
        raw_step = steps_lib.make_shot_vae_train_step(
            model, num_classes=K, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=True,
            aug=steps_lib.AugmentConfig(enabled=False))
        step_jit = jax.jit(raw_step)
        sched = {k: jnp.float32(v) for k, v in SCHED.items()}

        rng = np.random.default_rng(32)
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)

        for it in range(N_STEPS):
            n = _draw_noise(rng, with_mixup=True)
            torch_loss = _torch_shot_step(torch, ref, opt, x_l_t, lab_l_t,
                                          x_u_t, _to_torch_noise(torch, n),
                                          optimal_match=True)
            inject = {k: jnp.asarray(v) for k, v in n.items()
                      if k != "perm_mx"}  # the om path must compute it
            state, metrics = step_jit(
                state, jnp.asarray(img_l), jnp.asarray(lab_l),
                jnp.asarray(img_u), jnp.asarray(lab_u), sched,
                jax.random.key(it), inject)
            our_loss = float(metrics["loss"])
            assert np.isclose(our_loss, torch_loss, rtol=2e-3, atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {torch_loss}")
            dp, ds = _compare_with_torch(torch, ref, state, "vae", it)
            print(f"om step {it}: loss Δ={abs(our_loss - torch_loss):.2e} "
                  f"param Δ={dp:.2e} stat Δ={ds:.2e}")


# ---------------------------------------------------------------------------
# (b) per-replica-BN shard_map vs manual torch DataParallel simulation
# ---------------------------------------------------------------------------

N_REP = 2
LOCAL = B // N_REP


def _draw_noise_dp(rng):
    """Per-step draws laid out per-replica: (B, ...) arrays shard row-wise
    over the 2 replicas; permutations are LOCAL indices within each shard
    (the documented per-replica-mixup deviation, steps.py docstring)."""
    n = {}
    for i in range(1, 5):
        n[f"eps_{i}"] = rng.standard_normal((B, LDC)).astype(np.float32)
    n["unif_3"] = rng.random((B, K)).astype(np.float32)
    n["unif_4"] = rng.random((B, K)).astype(np.float32)
    n["lam_sm"] = np.float32(rng.beta(0.1, 0.1))
    n["lam_mx"] = np.float32(rng.beta(2.0, 2.0))
    n["perm_sm"] = np.concatenate(
        [rng.permutation(LOCAL) for _ in range(N_REP)]).astype(np.int32)
    n["perm_mx"] = np.concatenate(
        [rng.permutation(LOCAL) for _ in range(N_REP)]).astype(np.int32)
    return n


def _replica_slice(n, r):
    """The torch-side view of replica r's draws (rows [r*LOCAL, ...))."""
    out = {}
    for k, v in n.items():
        if k.startswith("lam"):
            out[k] = float(v)
        elif k.startswith("perm"):
            out[k] = np.asarray(v[r * LOCAL:(r + 1) * LOCAL], dtype=np.int64)
        else:
            out[k] = v[r * LOCAL:(r + 1) * LOCAL]
    return out


def _torch_dp_step(torch, ref, opt, x_l, lab_l, x_u, n):
    """One manual 2-replica nn.DataParallel SHOT iteration.

    DataParallel semantics (SURVEY §2.6): every replica runs the same params
    on its batch shard with its OWN BatchNorm batch statistics; the gathered
    loss normalises by the full batch (== mean of per-shard losses here,
    equal shards); running stats survive only from replica 0 (the live
    module). Simulated with one module run twice: replica 1's buffer updates
    are rolled back to replica 0's afterwards.
    """
    total = 0.0
    buffers_after_r0 = None
    for r in range(N_REP):
        sl = slice(r * LOCAL, (r + 1) * LOCAL)
        nr = {k: (torch.tensor(v) if isinstance(v, np.ndarray) else v)
              for k, v in _replica_slice(n, r).items()}
        loss_sup, loss_unsup = _torch_shot_losses(
            torch, ref, x_l[sl], lab_l[sl], x_u[sl], nr)
        ((loss_sup + loss_unsup) / N_REP).backward()
        total += float((loss_sup + loss_unsup).detach()) / N_REP
        if r == 0:
            buffers_after_r0 = {k: v.clone()
                                for k, v in ref.state_dict().items()
                                if "running_" in k or "num_batches" in k}
    with torch.no_grad():
        for k, v in buffers_after_r0.items():
            ref.state_dict()[k].copy_(v)
    opt.step()
    opt.zero_grad()
    return total


class TestPerReplicaBnLockstep:
    def test_three_steps_match_dataparallel_sim(self, torch):
        from jax.sharding import PartitionSpec as P

        from shotvae_tpu.parallel import DataParallel, make_mesh
        from shotvae_tpu.train import steps as steps_lib

        ref = _fresh_ref_vae(torch, 41)
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=MOM,
                              weight_decay=WD)
        model, state = _make_jax_side("vae")
        state = _import_ref_weights(ref, state, "vae")

        dp = DataParallel(make_mesh(N_REP))
        raw_step = steps_lib.make_shot_vae_train_step(
            model, num_classes=K, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False, axis_name=dp.axis_name,
            aug=steps_lib.AugmentConfig(enabled=False))

        batch_spec = P(dp.axis_name)
        inject_specs = {
            **{f"eps_{i}": batch_spec for i in range(1, 5)},
            "unif_3": batch_spec, "unif_4": batch_spec,
            "lam_sm": P(), "lam_mx": P(),
            "perm_sm": batch_spec, "perm_mx": batch_spec,
        }
        in_specs = (P(), batch_spec, batch_spec, batch_spec, batch_spec,
                    P(), P(), inject_specs)
        smapped = jax.shard_map(raw_step, mesh=dp.mesh, in_specs=in_specs,
                                out_specs=(P(), P()), check_vma=False)
        step_jit = jax.jit(smapped)
        sched = {k: jnp.float32(v) for k, v in SCHED.items()}

        rng = np.random.default_rng(42)
        img_l, lab_l, img_u, lab_u = _data(rng)
        x_l_t, lab_l_t, x_u_t = _torch_inputs(torch, img_l, lab_l, img_u)

        for it in range(3):
            n = _draw_noise_dp(rng)
            torch_loss = _torch_dp_step(torch, ref, opt, x_l_t, lab_l_t,
                                        x_u_t, n)
            inject = {k: jnp.asarray(v) for k, v in n.items()}
            state, metrics = step_jit(
                state, jnp.asarray(img_l), jnp.asarray(lab_l),
                jnp.asarray(img_u), jnp.asarray(lab_u), sched,
                jax.random.key(it), inject)
            our_loss = float(metrics["loss"])
            assert np.isclose(our_loss, torch_loss, rtol=2e-3, atol=2e-3), (
                f"step {it}: loss {our_loss} vs torch {torch_loss}")
            dp_, ds = _compare_with_torch(torch, ref, state, "vae", it)
            print(f"dp step {it}: loss Δ={abs(our_loss - torch_loss):.2e} "
                  f"param Δ={dp_:.2e} stat Δ={ds:.2e}")


# ---------------------------------------------------------------------------
# (c) eval metrics vs the reference valid()/test() math
# ---------------------------------------------------------------------------


class TestEvalMetricsLockstep:
    def test_eval_metrics_match_reference_valid(self, torch):
        """make_vae_eval_step vs main_shot_vae.py:409-458 with imported
        weights + injected eval sampling noise, including a padded tail
        (the torch side sees only the real rows; ours masks with weight)."""
        from shotvae_tpu.train import steps as steps_lib

        ref = _fresh_ref_vae(torch, 51)
        ref.eval()
        model, state = _make_jax_side("vae")
        state = _import_ref_weights(ref, state, "vae")
        # BN running stats at init are mean=0/var=1; perturb them through one
        # train-mode torch forward so eval actually exercises running stats
        with torch.no_grad():
            ref.train()
            warm = torch.rand(6, 3, 32, 32)
            _ref_forward(torch, ref, warm, torch.zeros(6, LDC),
                         unif=torch.full((6, K), 0.5))
            ref.eval()
        state = _import_ref_weights(ref, state, "vae")

        rng = np.random.default_rng(52)
        n_real = 6
        img = rng.integers(0, 256, (B, 32, 32, 3)).astype(np.uint8)
        lab = rng.integers(0, K, (B,)).astype(np.int32)
        weight = np.zeros((B,), np.float32)
        weight[:n_real] = 1.0
        eps = rng.standard_normal((B, LDC)).astype(np.float32)
        unif = rng.uniform(1e-4, 1 - 1e-4, (B, K)).astype(np.float32)

        # ---- torch oracle: valid() body on the n_real rows ----
        F = torch.nn.functional
        x_t = torch.tensor(img[:n_real].astype(np.float32) / 255.0
                           ).permute(0, 3, 1, 2)
        with torch.no_grad():
            rec, mean, ls, la = _ref_forward(
                torch, ref, x_t, torch.tensor(eps[:n_real]),
                unif=torch.tensor(unif[:n_real]))
            # elbo_criterion terms (lib/criterion.py:44-57)
            r_t = F.binary_cross_entropy_with_logits(
                rec, x_t, reduction="sum") / n_real
            lss = 2 * ls
            ckl_t = 0.5 * torch.sum(mean ** 2 + torch.exp(lss) - lss - 1
                                    ) / n_real
            dkl_t = torch.sum(torch.exp(la) * (la - math.log(1.0 / K))
                              ) / n_real
            mse_t = F.mse_loss(torch.sigmoid(rec), x_t,
                               reduction="sum") / (2 * n_real)
            elbo_t = float(mse_t + 0.01 * (ckl_t + dkl_t))
            score = torch.exp(la)
            onehot = _onehot(torch, torch.tensor(lab[:n_real].astype(np.int64)))
            _, y_true = torch.topk(onehot, k=1, dim=1)
            _, y_pred = torch.topk(score, k=5, dim=1)
            top1_t = float(torch.sum(y_true == y_pred[:, :1])) / n_real
            top5_t = float(torch.sum(y_true == y_pred)) / n_real

        # ---- ours: full padded batch + weight mask ----
        raw_eval = steps_lib.make_vae_eval_step(
            model, num_classes=K, bce=True, x_sigma=1.0)
        metrics, recon_sig = jax.jit(raw_eval)(
            state, jnp.asarray(img), jnp.asarray(lab), jnp.asarray(weight),
            jax.random.key(0),
            {"eps": jnp.asarray(eps), "unif": jnp.asarray(unif)})
        cnt = float(metrics["count"])
        assert cnt == n_real
        got = {
            "recon": float(metrics["recon_sum"]) / cnt,
            "ckl": float(metrics["cont_kl_sum"]) / cnt,
            "dkl": float(metrics["disc_kl_sum"]) / cnt,
            "mse": float(metrics["mse_sum"]) / cnt,
            "elbo": float(metrics["elbo_sum"]) / cnt,
            "top1": float(metrics["top1_count"]) / cnt,
            "top5": float(metrics["top5_count"]) / cnt,
        }
        want = {
            "recon": float(r_t), "ckl": float(ckl_t), "dkl": float(dkl_t),
            "mse": float(mse_t), "elbo": elbo_t,
            "top1": top1_t, "top5": top5_t,
        }
        for k in want:
            assert np.isclose(got[k], want[k], rtol=2e-3, atol=2e-3), (
                k, got[k], want[k])
        # the image-logging output is the sigmoid reconstruction
        np.testing.assert_allclose(
            np.asarray(recon_sig[:n_real]).transpose(0, 3, 1, 2),
            torch.sigmoid(rec).numpy(), rtol=5e-3, atol=5e-3)
