"""Op-level step-time breakdown on the real chip (VERDICT round-1 #4).

jax.profiler traces hang on this axon setup (CLAUDE.md) and per-call wall
timing is polluted by the tunnel's multi-ms dispatch floor (an isolated
0.2 ms kernel "measures" 20 ms). So each component is timed as K iterations
of a ``lax.scan`` INSIDE one jitted program — pure device time — with a
carry-fed input perturbation so XLA cannot hoist the loop-invariant body.
FLOPs come from ``compiled.cost_analysis()`` on the single-iteration jit.

Run: python scripts/profile_breakdown.py [--net wideresnet-28-2] [--batch 768]
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


K = 10  # scan iterations per timed program


def device_time(fn, *args, n=5):
    """Median wall time of a jitted K-iteration scan, per iteration."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


def flops_of(fn, *args):
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
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
    img, lab0 = ds.gather(idx)
    lab = lab0
    x = to_float(img)
    xb = x.astype(jnp.bfloat16)
    latent = jax.random.normal(key, (B, 138), jnp.bfloat16)

    rows = []

    def add(name, scan_fn, once_fn, once_args, mult=1.0):
        dt = device_time(scan_fn) * mult
        fl = flops_of(once_fn, *once_args) * mult
        rows.append((name, dt * 1e3, fl / 1e12,
                     (fl / dt) / 1e12 if dt else 0.0))
        # incremental print: on a slow/congested tunnel the whole run can
        # exceed an outer wall-clock bound — each measured row must survive
        print(f"[row] {name}: {dt * 1e3:.2f} ms, {fl / 1e12:.3f} TFLOP, "
              f"{(fl / dt) / 1e12 if dt else 0.0:.1f} TF/s", flush=True)
        return dt

    # ---- full train step (carry = state; fresh key per iter) ----
    raw = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)

    def full_once(state, i, k):
        # DISTINCT indices per stream: with identical clean inputs XLA CSEs
        # the labeled and unlabeled trunk forwards in the no-augment ablation
        # (measured: exactly one trunk-fwd of FLOPs vanishes), which would
        # overstate the augment cost by a full forward pass
        img_l, lab_l = ds.gather((idx + i) % 4096)
        img_u, lab_u = ds.gather((idx + i + 1024) % 4096)
        return raw(state, img_l, lab_l, img_u, lab_u, sched, k)

    def full_scan():
        def body(st, i):
            st, m = full_once(st, i, jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))[1]

    t_full = add("FULL train step (gather+aug+4fwd+bwd+sgd)", full_scan,
                 full_once, (state, 0, key))

    # ---- ablation: same step on pre-gathered inputs (gather cost by diff;
    #      the augment still runs — it lives INSIDE the jitted step) ----
    img2, lab2 = ds.gather((idx + 1024) % 4096)

    def nogather_scan():
        def body(st, i):
            st, m = raw(st, img, lab, img2, lab2, sched,
                        jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))[1]

    add("step w/o gather (pre-fetched uint8)", nogather_scan,
        lambda st, k: raw(st, img, lab, img2, lab2, sched, k), (state, key))

    # ---- ablation: augment disabled inside the step ----
    raw_noaug = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False,
        aug=steps_lib.AugmentConfig(enabled=False))

    def noaug_scan():
        def body(st, i):
            img_l, lab_l = ds.gather((idx + i) % 4096)
            img_u, lab_u = ds.gather((idx + i + 1024) % 4096)
            st, m = raw_noaug(st, img_l, lab_l, img_u, lab_u, sched,
                              jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))[1]

    add("step w/o augment (gather + clean floats)", noaug_scan,
        lambda st, k: raw_noaug(st, img, lab, img2, lab2, sched, k),
        (state, key))

    # ---- 4-forward VAE proxy (fwd) and its backward. Each pass gets a
    #      DISTINCT input (like the real step: clean_l, smooth_l, clean_u,
    #      mixed_u) so XLA cannot CSE the four trunks into one. ----
    def proxy_loss(p, b, xin, k):
        ks = jax.random.split(k, 4)
        tot = jnp.float32(0.0)
        for j in range(4):
            # NONLINEAR per-pass transform: conv is linear, so any affine
            # relation between passes lets XLA share one trunk (measured:
            # an affine proxy "ran" at an impossible 230+ TFLOP/s)
            xj = jnp.tanh(xin * (1.0 + 0.1 * j))
            out, b = steps_lib._apply_vae(model, p, b, xj, ks[j])
            # squared outputs: a plain sum gives ALL-ONES cotangents, and
            # XLA algebraically collapses transposed convs with constant
            # cotangents (measured: an impossible 230 TFLOP/s "backward")
            tot = tot + sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                            for t in out[:4])
        return tot

    def proxy_fwd_scan():
        def body(carry, i):
            xi = xb + carry
            v = proxy_loss(params, bs, xi, jax.random.fold_in(key, i))
            return (v * 1e-20).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(K))[0]

    add("4 full fwd (enc+dec) proxy, value only", proxy_fwd_scan,
        proxy_loss, (params, bs, xb, key))

    gradfn = jax.grad(proxy_loss)

    def proxy_bwd_scan():
        def body(carry, i):
            xi = xb + carry
            g = gradfn(params, bs, xi, jax.random.fold_in(key, i))
            # consume EVERY gradient leaf — keeping only leaves[0] lets XLA
            # dead-code-eliminate most of the backward (measured: an
            # impossible 237 TFLOP/s with a 2.5 ms "backward")
            tot = sum(jnp.sum(t.astype(jnp.float32))
                      for t in jax.tree_util.tree_leaves(g))
            return (tot * 1e-20).astype(jnp.bfloat16), ()
        return jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(K))[0]

    add("4 full fwd+bwd proxy (grad)", proxy_bwd_scan,
        gradfn, (params, bs, xb, key))

    # ---- encoder forward (x4: the step runs 4 encoder passes) ----
    def enc_once(p, b, xin):
        out, _ = model.apply({"params": p, "batch_stats": b}, xin,
                             train=True, method="encode",
                             rngs={"sample": key}, mutable=["batch_stats"])
        return out

    def enc_scan():
        def body(carry, i):
            xi = xb + carry
            out = enc_once(params, bs, xi)
            mean = out[1] if isinstance(out, (tuple, list)) else out
            return jnp.sum(mean).astype(jnp.bfloat16) * 1e-9, ()
        return jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(K))[0]

    add("encoder fwd (trunk+heads) x4", enc_scan, enc_once, (params, bs, xb),
        mult=4.0)

    # ---- decoder forward (x4) ----
    def dec_once(p, b, z):
        out, _ = model.apply({"params": p, "batch_stats": b}, z,
                             train=True, method="decode",
                             mutable=["batch_stats"])
        return out

    def dec_scan():
        def body(carry, i):
            zi = latent + carry
            out = dec_once(params, bs, zi)
            return jnp.sum(out).astype(jnp.bfloat16) * 1e-9, ()
        return jax.lax.scan(body, jnp.bfloat16(0.0), jnp.arange(K))[0]

    add("decoder fwd (ConvT stack) x4", dec_scan, dec_once,
        (params, bs, latent), mult=4.0)

    # ---- gather + augment, both streams ----
    def ga_once(i, k):
        im, _ = ds.gather((idx + i) % 4096)
        return augment_batch(k, to_float(im))

    def ga_scan():
        def body(carry, i):
            out = ga_once(i, jax.random.fold_in(key, i))
            return carry + jnp.sum(out[:1, :1, :1, :1]), ()
        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))[0]

    add("gather + augment (both streams)", ga_scan, ga_once, (0, key),
        mult=2.0)

    # ---- optimizer update ----
    grads = jax.tree_util.tree_map(lambda t: jnp.ones_like(t) * 1e-8, params)

    def opt_once(st, g):
        return st.apply_gradients(grads=g)

    def opt_scan():
        def body(st, i):
            return opt_once(st, grads), ()
        return jax.lax.scan(body, state, jnp.arange(K))[0].step

    add("optimizer update (SGD+wd+momentum)", opt_scan, opt_once,
        (state, grads))

    print(f"\n{args.net} B={B} — device time per full-step equivalent "
          f"(scan K={K}, median of 5)")
    print(f"{'component':45s} {'ms':>8s} {'TFLOP':>7s} {'TFLOP/s':>8s} "
          f"{'% step':>7s}")
    t = {name: ms for name, ms, _, _ in rows}
    for name, ms, tf, rate in rows:
        print(f"{name:45s} {ms:8.2f} {tf:7.2f} {rate:8.1f} "
              f"{100 * ms / (t_full * 1e3):6.1f}%")
    full = t_full * 1e3
    fwd = t["4 full fwd (enc+dec) proxy, value only"]
    fb = t["4 full fwd+bwd proxy (grad)"]
    enc = t["encoder fwd (trunk+heads) x4"]
    dec = t["decoder fwd (ConvT stack) x4"]
    opt = t["optimizer update (SGD+wd+momentum)"]
    gather = full - t["step w/o gather (pre-fetched uint8)"]
    augment = full - t["step w/o augment (gather + clean floats)"]
    bwd = fb - fwd
    print("\nsummary (ms, % of full step; gather/augment by ablation):")
    for label, v in [
        ("4 forwards (proxy, in-step fused)", fwd),
        ("backward of the 4 passes (proxy diff)", bwd),
        ("gather (ablation)", gather),
        ("augment (ablation)", augment),
        ("optimizer (isolated)", opt),
        ("loss math + mixup + rest (residual)",
         full - fwd - bwd - gather - augment - opt)]:
        print(f"  {label:42s} {v:8.2f}  {100 * v / full:5.1f}%")
    print(f"  (isolated enc fwd x4 {enc:.2f} ms / dec fwd x4 {dec:.2f} ms "
          f"sum past the fused proxy — isolation severs cross-pass "
          f"interleaving)")


if __name__ == "__main__":
    main()
