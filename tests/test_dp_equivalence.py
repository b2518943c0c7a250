"""Data-parallel correctness: an 8-device mesh step must equal the
single-device step on the same global batch.

Under GSPMD the program semantics are device-count-invariant (sync-BN batch
stats are global either way), so parameters after one update must match to
float tolerance — this pins down the gradient all-reduce and sharding logic.
"""

import numpy as np

import jax
import jax.numpy as jnp

from shotvae_tpu.models import VariationalAutoEncoder
from shotvae_tpu.parallel import DataParallel, make_mesh
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, init_model, sgd_torch


def _setup():
    model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(0), jnp.zeros((2, 32, 32, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=bs, tx=sgd_torch(0.1))
    step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
        pwm=1.0, ucw=1.0).items()}
    img = jax.random.randint(jax.random.key(1), (16, 32, 32, 3), 0, 256,
                             dtype=jnp.int32).astype(jnp.uint8)
    lab = jax.random.randint(jax.random.key(2), (16,), 0, 10)
    return state, step, sched, img, lab


class TestDPEquivalence:
    def test_8dev_matches_1dev_update(self):
        state, step, sched, img, lab = _setup()
        key = jax.random.key(3)

        results = {}
        for n in (1, 8):
            dp = DataParallel(make_mesh(n))
            wrapped = dp.jit_step(step, batch_argnums=(0, 1, 2, 3),
                                  donate_state=False)
            new_state, metrics = wrapped(dp.replicate(state), img, lab, img,
                                         lab, sched, key)
            results[n] = (jax.device_get(new_state.params),
                          float(metrics["loss"]))

        assert np.isclose(results[1][1], results[8][1], rtol=1e-4), \
            (results[1][1], results[8][1])
        # partitioned reductions reassociate float sums; after one lr=0.1
        # update the observed divergence is <=3.3e-5 absolute — allow that
        # order, assert nothing grossly wrong
        flat1 = jax.tree_util.tree_leaves(results[1][0])
        flat8 = jax.tree_util.tree_leaves(results[8][0])
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-2, atol=2e-4)
