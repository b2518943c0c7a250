"""Headline benchmark: SHOT-VAE WRN-28-2 train-step throughput on CIFAR-10 shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Protocol (default): the full jitted SHOT-VAE training step (on-device gather
+ augment + 4 forwards + 1 fused backward + SGD update) at the reference's
production config — WideResNet-28-2 encoder, batch 768 labeled + 768
unlabeled, CIFAR-10 shapes (synthetic pixels; throughput is shape-dependent
only). ``value`` counts UNLABELED images/sec/chip, matching the reference's
epoch semantics (epoch length = len(unlabeled loader), main_shot_vae.py:280).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
constant below is derived in BASELINE.md §"Derivation": 6.0 GFLOP per
unlabeled image (12 WRN-28-2-VAE forward-equivalents per iteration, matches
the XLA-measured 4.6 TFLOP/step), era 2-GPU hardware at realistic cuDNN
utilisation and nn.DataParallel scaling => 570-1130 img/s; 900 is the
mid-range. Break-even: >=5x holds for any reference <= measured_value/5
(~2300 img/s at the current 11500), above even the free-input-pipeline
ceiling of the realistic range. vs_baseline = value / REF_ESTIMATE.

Env overrides for the other BASELINE.json configs (docs/PERF.md table):
  BENCH_KIND=shot|m2|classifier|smooth_mnist|smooth_svhn  (default shot)
  BENCH_NET=wideresnet-28-10|preactresnet-18|densenet-121|...
  BENCH_BATCH=512 BENCH_STEPS=20
vs_baseline is only defined for the headline protocol (shot/m2, where the
derived reference estimate applies); other kinds report null.

Outage contract: before measuring, the accelerator is probed with a tiny
matmul in a subprocess under a BENCH_PROBE_TIMEOUT-second timeout (default
60, one retry) — the axon tunnel can hang for hours and an in-process hang
is uninterruptible. On probe failure (or any exception mid-benchmark) ONE
structured JSON line is still printed, with "error": "tpu_unavailable" |
"benchmark_failed" and value/vs_baseline null, and rc=1 — a red capture is
parseable, never a bare traceback (tests/test_bench_contract.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_ESTIMATE_IMG_PER_SEC = 900.0

# The axon tunnel can go down for hours (CLAUDE.md gotchas): even
# jax.devices() then hangs network-blocked. Probe the backend with a tiny
# matmul in a SUBPROCESS under a hard timeout (a hang cannot be interrupted
# in-process), retry once, and emit structured JSON on failure so a red
# capture is distinguishable from a broken benchmark.
_PROBE_SRC = ("import jax, jax.numpy as jnp; "
              "jax.block_until_ready(jnp.ones((128, 128)) @ "
              "jnp.ones((128, 128)))")
PROBE_TIMEOUT_S = float(os.environ.get("BENCH_PROBE_TIMEOUT", "60"))


def _probe_backend(retries: int = 1) -> str | None:
    """Returns None if the accelerator answers, else a short failure tag.

    BENCH_PROBE_CMD overrides the probe command (tests use this to simulate
    an outage); BENCH_SKIP_PROBE=1 skips entirely.
    """
    if os.environ.get("BENCH_SKIP_PROBE") == "1":
        return None
    override = os.environ.get("BENCH_PROBE_CMD")
    cmd = (["/bin/sh", "-c", override] if override
           else [sys.executable, "-c", _PROBE_SRC])
    err = "probe_not_run"
    for _ in range(retries + 1):
        try:
            r = subprocess.run(cmd, timeout=PROBE_TIMEOUT_S,
                               capture_output=True, text=True)
            if r.returncode == 0:
                return None
            tail = (r.stderr or r.stdout or "").strip().splitlines()
            err = f"probe_rc_{r.returncode}: {tail[-1][:160] if tail else ''}"
        except subprocess.TimeoutExpired:
            err = f"probe_timeout_{int(PROBE_TIMEOUT_S)}s"
    return err


def _emit_error(kind: str, detail: str) -> None:
    print(json.dumps({
        "metric": f"{KIND}_bench",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": kind,
        "detail": detail,
    }))

KIND = os.environ.get("BENCH_KIND", "shot")
NET_NAME = os.environ.get("BENCH_NET", "wideresnet-28-2")
EFFICIENT = os.environ.get("BENCH_EFFICIENT", "") == "1"  # densenet remat
BATCH = int(os.environ.get("BENCH_BATCH", "768"))
WARMUP_STEPS = 3
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", "20"))
# BENCH_REPORT_FLOPS=1 adds step_tflop + mfu to the JSON line (used by
# scripts/bench_matrix.py); costs one extra AOT compile per run.
REPORT_FLOPS = os.environ.get("BENCH_REPORT_FLOPS", "") == "1"
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))  # v5e bf16


def _flops_per_step(fn, *args) -> float:
    """XLA's f32-equivalent FLOP estimate of one compiled step
    (``cost_analysis()['flops']`` — same accounting as
    scripts/profile_breakdown.py)."""
    structs = [jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), a)
        for a in args]
    cost = jax.jit(fn).lower(*structs).compile().cost_analysis() or {}
    return float(cost.get("flops", 0.0))

SCHED = dict(cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
             pwm=1.0, ucw=1.0)


def _vae_bench(m2: bool):
    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.ops.schedules import multistep_lr
    from shotvae_tpu.parallel import DataParallel
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    dp = DataParallel()
    train_ds = DeviceDataset(synthetic_dataset(4096, (32, 32, 3), 10),
                             sharding=dp.replicated())
    model = VariationalAutoEncoder(
        encoder_name=NET_NAME, num_input_channels=3,
        continuous_latent_dim=128, disc_latent_dim=10, dtype=jnp.bfloat16,
        efficient=EFFICIENT)
    tx = sgd_torch(multistep_lr(0.1, [400, 500, 550], 65))
    params, batch_stats = init_model(model, jax.random.key(1),
                                     jnp.zeros((2, 32, 32, 3)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx))
    if m2:
        raw_step = steps_lib.make_m2_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0)
    else:
        raw_step = steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False)

    def step_by_index(state, idx_l, idx_u, sched, key):
        img_l, lab_l = train_ds.gather(idx_l)
        img_u, lab_u = train_ds.gather(idx_u)
        return raw_step(state, img_l, lab_l, img_u, lab_u, sched, key)

    train_jit = dp.jit_step(step_by_index, batch_argnums=(0, 1))
    sched = {k: jnp.float32(v) for k, v in SCHED.items()}
    rng = np.random.default_rng(0)
    key = jax.random.key(7)

    def one_step(state, i):
        idx_l = jnp.asarray(rng.integers(0, 4096, BATCH))
        idx_u = jnp.asarray(rng.integers(0, 4096, BATCH))
        return train_jit(state, idx_l, idx_u, sched,
                         jax.random.fold_in(key, i))

    name = "m2" if m2 else "shotvae"
    metric = (f"{name}_{NET_NAME.replace('-', '')}"
              "_cifar10_unlabeled_images_per_sec_per_chip")
    idx0 = jnp.zeros((BATCH,), jnp.int32)
    flops_thunk = lambda: _flops_per_step(  # noqa: E731
        step_by_index, state, idx0, idx0, sched, jax.random.key(0))
    return state, one_step, dp.num_devices, metric, True, flops_thunk


def _classifier_bench():
    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.models.classifier import build_classifier
    from shotvae_tpu.parallel import DataParallel
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    dp = DataParallel()
    train_ds = DeviceDataset(synthetic_dataset(4096, (32, 32, 3), 10),
                             sharding=dp.replicated())
    model = build_classifier(NET_NAME, 10, dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, jax.random.key(1),
                                     jnp.zeros((2, 32, 32, 3)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats,
        tx=sgd_torch(0.1)))
    raw_step = steps_lib.make_classifier_train_step(model)

    def step_by_index(state, idx, key):
        img, lab = train_ds.gather(idx)
        return raw_step(state, img, lab, key)

    train_jit = dp.jit_step(step_by_index, batch_argnums=(0,))
    rng = np.random.default_rng(0)
    key = jax.random.key(7)

    def one_step(state, i):
        idx = jnp.asarray(rng.integers(0, 4096, BATCH))
        return train_jit(state, idx, jax.random.fold_in(key, i))

    metric = (f"classifier_{NET_NAME.replace('-', '')}"
              "_cifar10_images_per_sec_per_chip")
    idx0 = jnp.zeros((BATCH,), jnp.int32)
    flops_thunk = lambda: _flops_per_step(  # noqa: E731
        step_by_index, state, idx0, jax.random.key(0))
    return state, one_step, dp.num_devices, metric, False, flops_thunk


def _smooth_bench(svhn: bool):
    from shotvae_tpu.data import DeviceDataset, synthetic_dataset
    from shotvae_tpu.models import SmoothVAE
    from shotvae_tpu.models.smooth_vae import (mnist_vae_config,
                                               svhn_vae_config)
    from shotvae_tpu.parallel import DataParallel
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, adam_torch, init_model

    dp = DataParallel()
    shape = (32, 32, 3) if svhn else (32, 32, 1)
    # reference production batch sizes (main_smooth_ELBO_*.py defaults)
    bu, bl = (256, 512) if svhn else (128, 4)
    train_ds = DeviceDataset(synthetic_dataset(4096, shape, 10),
                             sharding=dp.replicated())
    mcfg = svhn_vae_config() if svhn else mnist_vae_config()
    model = SmoothVAE(**mcfg)
    params, batch_stats = init_model(model, jax.random.key(1),
                                     jnp.zeros((2, *shape)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=batch_stats, tx=adam_torch(5e-4))
    raw_step = steps_lib.make_smooth_elbo_train_step(
        model, alpha=50.0, cont_capacity=(0.0, 17.5, 25000, 30.0),
        disc_capacity=(0.0, 17.0, 25000, 30.0), disc_dims=(10,))

    def step_by_index(state, idx_u, idx_l, key):
        img_u, _ = train_ds.gather(idx_u)
        img_l, lab_l = train_ds.gather(idx_l)
        return raw_step(state, img_u, img_l, lab_l, key)

    train_jit = jax.jit(step_by_index, donate_argnums=0)
    rng = np.random.default_rng(0)
    key = jax.random.key(7)

    def one_step(state, i):
        idx_u = jnp.asarray(rng.integers(0, 4096, bu))
        idx_l = jnp.asarray(rng.integers(0, 4096, bl))
        return train_jit(state, idx_u, idx_l, jax.random.fold_in(key, i))

    name = "svhn" if svhn else "mnist"
    metric = f"smooth_elbo_{name}_unlabeled_images_per_sec_per_chip"
    global BATCH
    BATCH = bu
    flops_thunk = lambda: _flops_per_step(  # noqa: E731
        step_by_index, state, jnp.zeros((bu,), jnp.int32),
        jnp.zeros((bl,), jnp.int32), jax.random.key(0))
    # the smooth trainer runs single-device (plain jit, unreplicated state;
    # the reference smooth scripts are single-GPU too) — report n_chips=1 so
    # per-chip throughput stays correct on multi-chip hosts
    return state, one_step, 1, metric, False, flops_thunk


def main():
    probe_err = _probe_backend()
    if probe_err is not None:
        _emit_error("tpu_unavailable", probe_err)
        return 1
    try:
        return _run_benchmark()
    except Exception as e:  # backend can die between probe and measurement
        _emit_error("benchmark_failed", repr(e)[:300])
        return 1


def _run_benchmark():
    if KIND == "shot":
        setup = _vae_bench(m2=False)
    elif KIND == "m2":
        setup = _vae_bench(m2=True)
    elif KIND == "classifier":
        setup = _classifier_bench()
    elif KIND == "smooth_mnist":
        setup = _smooth_bench(svhn=False)
    elif KIND == "smooth_svhn":
        setup = _smooth_bench(svhn=True)
    else:
        raise SystemExit(f"unknown BENCH_KIND {KIND!r}")
    state, one_step, n_chips, metric, has_baseline, flops_thunk = setup

    # flops BEFORE the loop: the state buffers get donated during it
    step_flops = flops_thunk() if REPORT_FLOPS else None

    for i in range(WARMUP_STEPS):
        state, m = one_step(state, i)
    jax.block_until_ready(m["loss"] if "loss" in m else m)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, m = one_step(state, WARMUP_STEPS + i)
    jax.block_until_ready(m["loss"] if "loss" in m else m)
    dt = time.perf_counter() - t0

    img_per_sec = MEASURE_STEPS * BATCH / dt
    per_chip = img_per_sec / n_chips
    line = {
        "metric": metric,
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": (round(img_per_sec / REF_ESTIMATE_IMG_PER_SEC, 2)
                        if has_baseline else None),
    }
    if step_flops is not None:
        step_s = dt / MEASURE_STEPS
        line["step_ms"] = round(step_s * 1e3, 2)
        line["step_tflop"] = round(step_flops / 1e12, 3)
        line["mfu"] = round(step_flops / step_s / n_chips
                            / (PEAK_TFLOPS * 1e12), 3)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
