"""Golden tests: optax chains vs torch.optim semantics, BN vs torch BN."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from shotvae_tpu.train.state import adam_torch, sgd_torch


def _run_optax(tx, param, grads_seq):
    p = jnp.asarray(param)
    state = tx.init(p)
    traj = []
    for g in grads_seq:
        updates, state = tx.update(jnp.asarray(g), state, p)
        p = p + updates
        traj.append(np.asarray(p).copy())
    return traj


def _run_torch(opt_ctor, param, grads_seq):
    p = torch.nn.Parameter(torch.tensor(param))
    opt = opt_ctor([p])
    traj = []
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


class TestSGDParity:
    def test_momentum_weight_decay_trajectory(self):
        rng = np.random.default_rng(0)
        param = rng.normal(size=(7,)).astype(np.float32)
        grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(6)]
        ours = _run_optax(sgd_torch(0.1, momentum=0.9, weight_decay=5e-4),
                          param, grads)
        ref = _run_torch(
            lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9,
                                       weight_decay=5e-4), param, grads)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_no_momentum(self):
        param = np.ones(3, np.float32)
        grads = [np.full(3, 0.5, np.float32)] * 3
        ours = _run_optax(sgd_torch(0.2, momentum=0.0, weight_decay=0.0),
                          param, grads)
        ref = _run_torch(lambda ps: torch.optim.SGD(ps, lr=0.2), param, grads)
        np.testing.assert_allclose(ours[-1], ref[-1], rtol=1e-6)


class TestAdamParity:
    def test_trajectory(self):
        rng = np.random.default_rng(1)
        param = rng.normal(size=(5,)).astype(np.float32)
        grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(8)]
        ours = _run_optax(adam_torch(5e-4), param, grads)
        ref = _run_torch(lambda ps: torch.optim.Adam(ps, lr=5e-4), param, grads)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestBatchNormParity:
    def test_train_forward_and_running_stats_match_torch(self):
        """flax BatchNorm(momentum=0.9, eps=1e-5) == torch BatchNorm2d."""
        from flax import linen as nn

        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32) * 2 + 1

        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
        variables = bn.init(jax.random.key(0), jnp.asarray(x))
        y, mutated = bn.apply(variables, jnp.asarray(x),
                              mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
        tbn.train()
        ty = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-4, atol=1e-4)
        # torch running_var uses the UNBIASED batch variance; flax uses the
        # biased one. At N=256 this is a 0.4% difference — a documented
        # deviation (affects eval normalisation negligibly). Verify each
        # matches its own contract:
        n = 4 * 8 * 8
        biased = np.var(x, axis=(0, 1, 2))
        np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                                   0.9 * 1.0 + 0.1 * biased, rtol=1e-4)
        np.testing.assert_allclose(tbn.running_var.numpy(),
                                   0.9 * 1.0 + 0.1 * biased * n / (n - 1),
                                   rtol=1e-4)


class TestMultiStepInsideChain:
    def test_lr_schedule_reaches_params(self):
        from shotvae_tpu.ops.schedules import multistep_lr

        sched = multistep_lr(1.0, [2], steps_per_epoch=1, warmup_factor=0.5)
        tx = sgd_torch(sched, momentum=0.0, weight_decay=0.0)
        p = jnp.zeros(1)
        state = tx.init(p)
        g = jnp.ones(1)
        deltas = []
        for _ in range(5):
            updates, state = tx.update(g, state, p)
            p = p + updates
            deltas.append(float(-updates[0]))
        # reference scheduler.step(epoch) at epoch END: milestone epoch 2
        # still trains undecayed; decay first applies at epoch 3
        # (main_shot_vae.py:252) -> epoch0 warmup 0.5, epochs 1-2 full 1.0,
        # epoch>=3 decayed 0.1
        np.testing.assert_allclose(deltas, [0.5, 1.0, 1.0, 0.1, 0.1],
                                   rtol=1e-6)

    def test_matches_torch_multisteplr_step_epoch_semantics(self):
        """Golden vs the reference's actual scheduler usage: MultiStepLR with
        scheduler.step(epoch) called at the END of each epoch
        (main_shot_vae.py:252), plus the manual epoch-0 lr*0.2 warmup
        (main_shot_vae.py:223-225,253-254)."""
        from shotvae_tpu.ops.schedules import multistep_lr

        base_lr, milestones, spe, epochs = 0.1, [3, 5], 4, 8
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base_lr)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # step(epoch) is deprecated API
            lr_sched = torch.optim.lr_scheduler.MultiStepLR(
                opt, milestones=milestones, gamma=0.1)
            torch_lr_by_epoch = []
            for epoch in range(epochs):
                if epoch == 0:
                    for g in opt.param_groups:
                        g["lr"] *= 0.2
                torch_lr_by_epoch.append(opt.param_groups[0]["lr"])
                if epoch == 0:
                    for g in opt.param_groups:
                        g["lr"] *= 5.0
                lr_sched.step(epoch)

        ours = multistep_lr(base_lr, milestones, spe)
        for epoch in range(epochs):
            for s in range(spe):
                np.testing.assert_allclose(
                    float(ours(epoch * spe + s)), torch_lr_by_epoch[epoch],
                    rtol=1e-6,
                    err_msg=f"epoch {epoch} step {s}")
