"""RNG-determinism: identical seeds yield identical training trajectories."""

import numpy as np

import jax
import jax.numpy as jnp

from shotvae_tpu.models import VariationalAutoEncoder
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, init_model, sgd_torch


def _run(seed, n_steps=3):
    model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(seed),
                            jnp.zeros((2, 32, 32, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=bs, tx=sgd_torch(0.1))
    step = jax.jit(steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False))
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
        pwm=1.0, ucw=1.0).items()}
    img = jax.random.randint(jax.random.key(100), (8, 32, 32, 3), 0, 256,
                             dtype=jnp.int32).astype(jnp.uint8)
    lab = jax.random.randint(jax.random.key(101), (8,), 0, 10)
    losses = []
    for i in range(n_steps):
        state, m = step(state, img, lab, img, lab, sched,
                        jax.random.fold_in(jax.random.key(seed), i))
        losses.append(float(m["loss"]))
    return losses


class TestDeterminism:
    def test_same_seed_same_trajectory(self):
        a = _run(7)
        b = _run(7)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_differs(self):
        a = _run(7, n_steps=1)
        c = _run(8, n_steps=1)
        assert a != c
