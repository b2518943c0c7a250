"""Headline benchmark: SHOT-VAE WRN-28-2 train-step throughput on CIFAR-10 shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Protocol: the full jitted SHOT-VAE training step (on-device gather + augment
+ 4 forwards + 1 fused backward + SGD update) at the reference's production
config — WideResNet-28-2 encoder, batch 768 labeled + 768 unlabeled,
CIFAR-10 shapes (synthetic pixels; throughput is shape-dependent only).
``value`` counts UNLABELED images/sec/chip, matching the reference's epoch
semantics (epoch length = len(unlabeled loader), main_shot_vae.py:280).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
constant below is an estimate of the reference's full-node throughput on its
era hardware (2x consumer GPUs, PyTorch 1.2: 4 forwards + 2 backwards of
WRN-28-2 + DCGAN decoder at batch 768 with host-side dataloading
~= 900 unlabeled img/s). vs_baseline = value / REF_ESTIMATE; the >=5x
north-star (BASELINE.json) is vs_baseline >= 5.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_ESTIMATE_IMG_PER_SEC = 900.0

# Env overrides for ad-hoc sweeps (defaults = the headline contract config):
#   BENCH_NET=wideresnet-28-10 BENCH_BATCH=512 python bench.py
NET_NAME = os.environ.get("BENCH_NET", "wideresnet-28-2")
BATCH = int(os.environ.get("BENCH_BATCH", "768"))
WARMUP_STEPS = 3
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", "20"))


def main():
    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.parallel import DataParallel
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch
    from shotvae_tpu.ops.schedules import multistep_lr

    dp = DataParallel()
    n_chips = dp.num_devices

    train_ds = DeviceDataset(synthetic_dataset(4096, (32, 32, 3), 10),
                             sharding=dp.replicated())

    model = VariationalAutoEncoder(
        encoder_name=NET_NAME, num_input_channels=3,
        continuous_latent_dim=128, disc_latent_dim=10, dtype=jnp.bfloat16)
    lr_sched = multistep_lr(0.1, [400, 500, 550], 65)
    tx = sgd_torch(lr_sched)
    params, batch_stats = init_model(model, jax.random.key(1),
                                     jnp.zeros((2, 32, 32, 3)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx))

    raw_step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)

    def step_by_index(state, idx_l, idx_u, sched, key):
        img_l, lab_l = train_ds.gather(idx_l)
        img_u, lab_u = train_ds.gather(idx_u)
        return raw_step(state, img_l, lab_l, img_u, lab_u, sched, key)

    train_jit = dp.jit_step(step_by_index, batch_argnums=(0, 1))

    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3, pwm=1.0,
        ucw=1.0).items()}
    rng = np.random.default_rng(0)
    key = jax.random.key(7)

    def one_step(i):
        idx_l = jnp.asarray(rng.integers(0, 4096, BATCH))
        idx_u = jnp.asarray(rng.integers(0, 4096, BATCH))
        return train_jit(state, idx_l, idx_u, sched, jax.random.fold_in(key, i))

    for i in range(WARMUP_STEPS):
        state, m = one_step(i)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, m = one_step(WARMUP_STEPS + i)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = MEASURE_STEPS * BATCH / dt
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": f"shotvae_{NET_NAME.replace('-', '')}_cifar10_unlabeled_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REF_ESTIMATE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
