"""Smoke + semantics tests for the jitted train/eval steps (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shotvae_tpu.models import SmoothVAE, VariationalAutoEncoder, mnist_vae_config
from shotvae_tpu.models.classifier import WideResNetClassifier
from shotvae_tpu.parallel import DataParallel, make_mesh
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, adam_torch, init_model, sgd_torch


def _sched():
    return {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
        pwm=1.0, ucw=1.0).items()}


def _batch(key, b=8, hw=32, c=3, classes=10):
    k1, k2 = jax.random.split(key)
    img = jax.random.randint(k1, (b, hw, hw, c), 0, 256, dtype=jnp.int32
                             ).astype(jnp.uint8)
    lab = jax.random.randint(k2, (b,), 0, classes)
    return img, lab


@pytest.fixture(scope="module")
def shot_state():
    model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    tx = sgd_torch(0.1)
    return model, TrainState.create(apply_fn=model.apply, params=params,
                                    batch_stats=bs, tx=tx)


class TestShotVaeStep:
    def test_step_updates_params_and_stats(self, shot_state):
        model, state = shot_state
        step = steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False)
        img_l, lab_l = _batch(jax.random.key(1))
        img_u, lab_u = _batch(jax.random.key(2))
        new_state, metrics = jax.jit(step)(state, img_l, lab_l, img_u, lab_u,
                                           _sched(), jax.random.key(3))
        assert int(new_state.step) == int(state.step) + 1
        # params changed
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params,
            new_state.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0
        # BN stats changed (4 forwards threaded)
        sdiff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.batch_stats,
            new_state.batch_stats)
        assert max(jax.tree_util.tree_leaves(sdiff)) > 0
        for k in ("loss", "recon_l", "cont_kl_u", "kl_inference"):
            assert np.isfinite(float(metrics[k])), k

    def test_fused_streams_matches_4fwd_closely(self, shot_state):
        """Two double-batch forwards == four single-batch forwards up to RNG
        draws and BN-stat pooling; metrics must agree to ~1%."""
        model, state = shot_state
        img_l, lab_l = _batch(jax.random.key(30))
        img_u, lab_u = _batch(jax.random.key(31))
        outs = {}
        for fused in (False, True):
            step = steps_lib.make_shot_vae_train_step(
                model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
                optimal_match=False, fused_streams=fused)
            _, m = jax.jit(step)(state, img_l, lab_l, img_u, lab_u, _sched(),
                                 jax.random.key(32))
            outs[fused] = m
        for k in ("recon_l", "recon_u", "cont_kl_l", "cont_kl_u",
                  "kl_inference"):
            a, b = float(outs[False][k]), float(outs[True][k])
            assert abs(a - b) / max(abs(a), 1e-6) < 0.05, (k, a, b)

    def test_optimal_match_variant(self, shot_state):
        model, state = shot_state
        step = steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=True)
        img_l, lab_l = _batch(jax.random.key(4))
        img_u, lab_u = _batch(jax.random.key(5))
        _, metrics = jax.jit(step)(state, img_l, lab_l, img_u, lab_u,
                                   _sched(), jax.random.key(6))
        assert np.isfinite(float(metrics["loss"]))

    def test_eval_step_metrics(self, shot_state):
        model, state = shot_state
        ev = steps_lib.make_vae_eval_step(model, num_classes=10, bce=True,
                                          x_sigma=1.0)
        img, lab = _batch(jax.random.key(7))
        w = jnp.ones((8,))
        metrics, recon = jax.jit(ev)(state, img, lab, w, jax.random.key(8))
        assert float(metrics["count"]) == 8
        assert 0 <= float(metrics["top1_count"]) <= 8
        assert float(metrics["top1_count"]) <= float(metrics["top5_count"])
        assert recon.shape == (8, 32, 32, 3)
        assert 0.0 <= float(recon.min()) and float(recon.max()) <= 1.0

    def test_m2_step(self, shot_state):
        model, state = shot_state
        step = steps_lib.make_m2_train_step(model, num_classes=10, bce=False,
                                            x_sigma=1.0)
        img_l, lab_l = _batch(jax.random.key(9))
        img_u, lab_u = _batch(jax.random.key(10))
        new_state, metrics = jax.jit(step)(state, img_l, lab_l, img_u, lab_u,
                                           _sched(), jax.random.key(11))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


class TestClassifierStep:
    def test_train_and_eval(self):
        model = WideResNetClassifier(depth=10, width=1, num_classes=10)
        params, bs = init_model(model, jax.random.key(0),
                                jnp.zeros((2, 32, 32, 3)))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=bs, tx=sgd_torch(0.1))
        step = steps_lib.make_classifier_train_step(model)
        img, lab = _batch(jax.random.key(1))
        new_state, metrics = jax.jit(step)(state, img, lab, jax.random.key(2))
        assert np.isfinite(float(metrics["cls_loss"]))
        ev = steps_lib.make_classifier_eval_step(model, num_classes=10)
        m = jax.jit(ev)(new_state, img, lab, jnp.ones((8,)))
        assert float(m["count"]) == 8
        # zero-weighted samples must not count
        m0 = jax.jit(ev)(new_state, img, lab,
                         jnp.array([1, 1, 1, 1, 0, 0, 0, 0.0]))
        assert float(m0["count"]) == 4
        assert float(m0["top1_count"]) <= 4


class TestSmoothElboStep:
    def test_train_and_eval(self):
        model = SmoothVAE(**mnist_vae_config())
        params, bs = init_model(model, jax.random.key(0),
                                jnp.zeros((2, 32, 32, 1)))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=bs, tx=adam_torch(5e-4))
        step = steps_lib.make_smooth_elbo_train_step(
            model, alpha=50.0, cont_capacity=(0.0, 17.5, 25000, 30.0),
            disc_capacity=(0.0, 17.0, 25000, 30.0), disc_dims=(10,))
        img_u, _ = _batch(jax.random.key(1), b=8, c=1)
        img_l, lab_l = _batch(jax.random.key(2), b=4, c=1)
        new_state, metrics = jax.jit(step)(state, img_u, img_l, lab_l,
                                           jax.random.key(3))
        for k in ("loss", "u_recon", "l_recon", "classification"):
            assert np.isfinite(float(metrics[k])), k
        ev = steps_lib.make_smooth_elbo_eval_step(model)
        m = jax.jit(ev)(new_state, img_u, jnp.zeros((8,), jnp.int32),
                        jnp.ones((8,)))
        assert float(m["count"]) == 8

    def test_loss_decreases_overfit(self):
        """The full smooth-ELBO step must be able to fit a tiny batch."""
        model = SmoothVAE(img_channels=1, encoder_channels=(8, 8, 8),
                          hidden_dim=32, reshape_channels=8,
                          latent_cont_dim=4, disc_dims=(10,))
        params, bs = init_model(model, jax.random.key(0),
                                jnp.zeros((2, 32, 32, 1)))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=bs, tx=adam_torch(1e-3))
        step = jax.jit(steps_lib.make_smooth_elbo_train_step(
            model, alpha=1.0, cont_capacity=(0.0, 5.0, 1000, 1.0),
            disc_capacity=(0.0, 5.0, 1000, 1.0), disc_dims=(10,)))
        img_u, _ = _batch(jax.random.key(1), b=8, c=1)
        img_l, lab_l = _batch(jax.random.key(2), b=8, c=1)
        first = last = None
        for i in range(30):
            state, metrics = step(state, img_u, img_l, lab_l, jax.random.key(i))
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert last < first


class TestDataParallelStep:
    def test_shot_step_on_8_device_mesh(self, shot_state):
        model, state = shot_state
        dp = DataParallel(make_mesh(8))
        assert dp.num_devices == 8
        step = steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False)
        wrapped = dp.jit_step(step, batch_argnums=(0, 1, 2, 3),
                              donate_state=False)
        state_r = dp.replicate(state)
        img_l, lab_l = _batch(jax.random.key(20), b=16)
        img_u, lab_u = _batch(jax.random.key(21), b=16)
        new_state, metrics = wrapped(state_r, img_l, lab_l, img_u, lab_u,
                                     _sched(), jax.random.key(22))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == int(state.step) + 1
