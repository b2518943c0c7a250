"""Op-level step-time breakdown on the real chip (VERDICT round-1 #4).

jax.profiler traces hang on this axon setup (CLAUDE.md), so the breakdown
is built the direct way: each component of the SHOT-VAE step is jitted and
timed in isolation at the production shapes, with XLA-reported FLOPs from
``compiled.cost_analysis()``, so the table shows where the 105 ms goes and
which parts are MXU-bound. Run: python scripts/profile_breakdown.py
[--net wideresnet-28-2] [--batch 768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def flops_of(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="wideresnet-28-2")
    p.add_argument("--batch", type=int, default=768)
    args = p.parse_args()
    B = args.batch

    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.data.pipeline import augment_batch, to_float
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    ds = DeviceDataset(synthetic_dataset(4096, (32, 32, 3), 10))
    model = VariationalAutoEncoder(
        encoder_name=args.net, num_input_channels=3,
        continuous_latent_dim=128, disc_latent_dim=10, dtype=jnp.bfloat16)
    params, bs = init_model(model, jax.random.key(1),
                            jnp.zeros((2, 32, 32, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=bs, tx=sgd_torch(0.1))
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3, pwm=1.0,
        ucw=1.0).items()}
    key = jax.random.key(0)
    idx = jnp.arange(B) % 4096
    img, lab = ds.gather(idx)
    x = to_float(img)
    xb = x.astype(jnp.bfloat16)

    rows = []

    def add(name, fn, *fargs, n=20, mult=1.0):
        jitted = jax.jit(fn)
        dt = timed(jitted, *fargs, n=n) * mult
        fl = flops_of(jitted, *fargs) * mult
        rows.append((name, dt * 1e3, fl / 1e12, (fl / dt) / 1e12
                     if dt else 0.0))
        return dt

    # ---- full step (the 105 ms) ----
    raw = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)

    def by_idx(state, idx_l, idx_u, sched, key):
        img_l, lab_l = ds.gather(idx_l)
        img_u, lab_u = ds.gather(idx_u)
        return raw(state, img_l, lab_l, img_u, lab_u, sched, key)

    t_full = add("FULL train step (gather+aug+4fwd+bwd+sgd)", by_idx, state,
                 idx, idx, sched, key)

    # ---- forward-only loss (value, no grad): isolates backward cost ----
    def fwd_only(params, batch_stats, x1, x2, key):
        def lf(p):
            out, _ = _loss(p, batch_stats, x1, x2, key)
            return out
        return lf(params)

    def _loss(p, b, x1, x2, key):
        # same 4-forward composition, value only
        keys = jax.random.split(key, 6)
        (r1, m1, s1, a1), b = steps_lib._apply_vae(model, p, b, x1, keys[0],
                                                   labels=lab)
        (r2, m2, s2, a2), b = steps_lib._apply_vae(model, p, b, x1, keys[1],
                                                   labels=lab)
        (r3, m3, s3, a3), b = steps_lib._apply_vae(model, p, b, x2, keys[2])
        (r4, m4, s4, a4), b = steps_lib._apply_vae(model, p, b, x2, keys[3])
        tot = sum(jnp.sum(t.astype(jnp.float32)) for t in
                  (r1, r2, r3, r4, m1, m2, m3, m4))
        return tot, b

    add("4 forwards only (no backward)", fwd_only, params, bs, xb, xb, key)

    # ---- encoder / decoder split (single forward x4) ----
    enc = model.bind({"params": params, "batch_stats": bs})

    def enc_fwd(p, b, x):
        out, mut = model.apply({"params": p, "batch_stats": b}, x,
                               train=True, method="encode",
                               rngs={"sample": key},
                               mutable=["batch_stats"])
        return out

    add("encoder fwd x4 (trunk+heads)", enc_fwd, params, bs, xb, mult=4.0)

    latent = jnp.zeros((B, 138), jnp.bfloat16)

    def dec_fwd(p, b, z):
        out, mut = model.apply({"params": p, "batch_stats": b}, z,
                               train=True, method="decode",
                               mutable=["batch_stats"])
        return out

    add("decoder fwd x4 (ConvT stack)", dec_fwd, params, bs, latent,
        mult=4.0)

    # ---- input pipeline & update ----
    def gather_aug(idx, key):
        im, _ = ds.gather(idx)
        return augment_batch(key, to_float(im))

    add("gather + augment (both streams)", gather_aug, idx, key, mult=2.0)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def sgd_update(state, grads):
        return state.apply_gradients(grads)

    add("optimizer update (SGD+wd+momentum)", sgd_update, state, grads)

    print(f"\n{args.net} B={B} (per full step equivalents)")
    print(f"{'component':45s} {'ms':>8s} {'TFLOP':>7s} {'TFLOP/s':>8s} "
          f"{'% step':>7s}")
    for name, ms, tf, rate in rows:
        print(f"{name:45s} {ms:8.2f} {tf:7.2f} {rate:8.1f} "
              f"{100 * ms / (t_full * 1e3):6.1f}%")


if __name__ == "__main__":
    main()
