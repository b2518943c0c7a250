"""Coarse step-time breakdown on the real chip (dev tool, not a test).

Times: full SHOT step, SHOT step with optimal-match, single fwd (eval),
augmentation alone, and batch-size scaling — to direct kernel work.
Run: python scripts/profile_step.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.data.pipeline import augment_batch, to_float
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.parallel import DataParallel
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    dp = DataParallel()
    ds = DeviceDataset(synthetic_dataset(4096, (32, 32, 3), 10),
                       sharding=dp.replicated())
    model = VariationalAutoEncoder(
        encoder_name="wideresnet-28-2", num_input_channels=3,
        continuous_latent_dim=128, disc_latent_dim=10, dtype=jnp.bfloat16)
    params, bs = init_model(model, jax.random.key(1), jnp.zeros((2, 32, 32, 3)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=bs, tx=sgd_torch(0.1)))
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3, pwm=1.0,
        ucw=1.0).items()}
    key = jax.random.key(0)

    for B in (768,):
        idx = jnp.arange(B) % 4096

        for om in (False, True):
            raw = steps_lib.make_shot_vae_train_step(
                model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
                optimal_match=om)

            def by_idx(state, idx_l, idx_u, sched, key, raw=raw):
                img_l, lab_l = ds.gather(idx_l)
                img_u, lab_u = ds.gather(idx_u)
                return raw(state, img_l, lab_l, img_u, lab_u, sched, key)

            jitted = jax.jit(by_idx)
            dt = timeit(jitted, state, idx, idx, sched, key)
            print(f"B={B} optimal_match={om}: full step {dt * 1e3:.1f} ms "
                  f"-> {B / dt:.0f} img/s")

        # eval forward only
        ev = steps_lib.make_vae_eval_step(model, num_classes=10, bce=True,
                                          x_sigma=1.0)

        def ev_idx(state, idx, w, key):
            img, lab = ds.gather(idx)
            return ev(state, img, lab, w, key)

        dt = timeit(jax.jit(ev_idx), state, idx, jnp.ones((B,)), key)
        print(f"B={B}: eval fwd {dt * 1e3:.1f} ms -> {B / dt:.0f} img/s")

        # augmentation alone
        def aug_only(idx, key):
            img, _ = ds.gather(idx)
            return augment_batch(key, to_float(img))

        dt = timeit(jax.jit(aug_only), idx, key)
        print(f"B={B}: gather+augment {dt * 1e3:.2f} ms")

    # batch scaling of the plain step
    raw = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)
    for B in (256, 1536):
        idx = jnp.arange(B) % 4096

        def by_idx(state, idx_l, idx_u, sched, key):
            img_l, lab_l = ds.gather(idx_l)
            img_u, lab_u = ds.gather(idx_u)
            return raw(state, img_l, lab_l, img_u, lab_u, sched, key)

        dt = timeit(jax.jit(by_idx), state, idx, idx, sched, key, n=5)
        print(f"B={B}: full step {dt * 1e3:.1f} ms -> {B / dt:.0f} img/s")


if __name__ == "__main__":
    main()
