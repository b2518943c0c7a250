"""Epoch drivers: SHOT-VAE / M2, supervised classifier, smooth-ELBO.

Host-side orchestration around the jitted steps — the counterpart of the
reference ``main()/train()/valid()/test()`` functions
(main_shot_vae.py:120-510, main_classifier.py:82-278,
main_smooth_ELBO_mnist.py:36-225). Per step, only int32 index arrays leave
the host; gathering, augmentation, the 4 forwards and the update all run in
one compiled program per batch. Eval pads ragged tail batches to the static
batch size with a 0/1 weight mask, so metrics are exact and every shape
compiles once.

Documented deviations from the reference (SURVEY.md §7 "faithful quirks"):
  * best checkpoint tracks MAX validation accuracy (the reference's
    ``elbo_valid_loss < best`` with init 10 tracks MIN accuracy — a bug,
    main_shot_vae.py:221,243-244);
  * the unlabeled stream drops its ragged tail batch (static shapes);
  * epoch-0 LR warmup lives inside the optax schedule rather than a host-side
    param-group mutation (same LR at every step).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from shotvae_tpu.config import ShotVaeConfig, SmoothElboConfig
from shotvae_tpu.data import (
    DeviceDataset,
    epoch_batches,
    infinite_batches,
    load_dataset,
    ssl_split,
)
from shotvae_tpu.data.datasets import load_mnist, load_svhn, synthetic_dataset
from shotvae_tpu.data.pipeline import num_batches, resize_batch
from shotvae_tpu.data.splits import labeled_subset_per_class
from shotvae_tpu.io import CheckpointManager, TBWriter
from shotvae_tpu.models import SmoothVAE, VariationalAutoEncoder
from shotvae_tpu.models.classifier import apply_classifier_init, build_classifier
from shotvae_tpu.ops.schedules import multistep_lr, shot_vae_epoch_schedules
from shotvae_tpu.parallel import DataParallel, make_mesh
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, adam_torch, init_model, sgd_torch
from shotvae_tpu.utils import AverageMeter, MetricAccumulator


def _make_chunk_runner(dp: DataParallel, step_by_index,
                       axis_name: Optional[str] = None):
    """``--steps-per-call`` chunk dispatcher: lax.scan N train steps inside
    ONE jitted call. Per-step keys/draws/order are identical to per-step
    dispatch; the scan body is a different compiled program than the
    standalone step, so XLA reassociation leaves last-ulp float differences
    only (pinned by test_loops_e2e::test_steps_per_call_equivalent). Cuts
    host→device dispatches N-fold. Measured (WRN-28-2, batch 768+768, 63
    steps/epoch, real v5e via the axon tunnel): steady epoch 9.0 → 8.5 s
    with N=8 — modest when the tunnel's dispatch floor is low, and growing
    with host latency / step count; the knob exists for dispatch-bound
    hosts, not as a default.

    ``step_by_index(state, *idx, *extras, key)``: ``idx`` are per-step
    (batch,) int32 index arrays (stacked to (n, batch), batch axis sharded
    over the mesh), ``extras`` are chunk-invariant pytrees (e.g. the epoch
    schedule dict). One jit per distinct chunk length (the tail chunk
    compiles once more).

    ``axis_name`` composes chunking with ``--bn-per-replica``: the scan runs
    INSIDE ``shard_map`` (scan-of-shard_map would re-enter SPMD per step;
    shard_map-of-scan keeps one collective-bearing program), so each device
    scans its local batch shards with its OWN BatchNorm statistics and the
    step's pmean collectives execute per scan iteration — the same
    DataParallel-faithful semantics as the unchunked ``shard_map_step``
    (nn.DataParallel per-replica BN, shot_vae_model/vae.py:96-132)."""
    chunk_jits = {}
    sh = NamedSharding(dp.mesh, PartitionSpec(None, dp.axis_name))

    def chunk_fn(state, idx_chunks, extras, keys):
        def body(st, xs):
            st, m = step_by_index(st, *xs[:-1], *extras, xs[-1])
            return st, m
        return jax.lax.scan(body, state, (*idx_chunks, keys))

    def run(state, idx_chunks, extras, keys):
        n = len(keys)
        if n not in chunk_jits:
            if axis_name is None:
                fn = chunk_fn
            else:
                n_idx = len(idx_chunks)
                fn = jax.shard_map(
                    chunk_fn, mesh=dp.mesh,
                    in_specs=(PartitionSpec(),
                              tuple(PartitionSpec(None, axis_name)
                                    for _ in range(n_idx)),
                              PartitionSpec(), PartitionSpec()),
                    out_specs=(PartitionSpec(), PartitionSpec()),
                    check_vma=False)
            chunk_jits[n] = jax.jit(fn, donate_argnums=(0,))
        idx_chunks = tuple(jax.device_put(jnp.asarray(a), sh)
                           for a in idx_chunks)
        return chunk_jits[n](state, idx_chunks, extras, keys)

    return run


def _chunk_keys(epoch_key, c0: int, n: int):
    """Per-step keys for chunk [c0, c0+n) — same fold_in(epoch_key, i)
    stream as per-step dispatch."""
    return jax.vmap(lambda j: jax.random.fold_in(epoch_key, j))(
        jnp.arange(c0, c0 + n))


def _start_trace_guarded(profile_dir: str, log_fn, timeout_s: float = 60.0):
    """Bounded ``jax.profiler.start_trace``: the call is known to HANG on
    axon-tunnel TPU setups (CLAUDE.md gotchas), so it runs in a daemon
    thread under a timeout and the trace is skipped (with a warning)
    rather than hanging the training run. Returns True iff tracing is
    active and ``stop_trace`` must be called. If the abandoned thread ever
    completes after the timeout the trace leaks until process exit —
    acceptable for a diagnostics path that would otherwise deadlock."""
    import threading

    done = threading.Event()
    err = []

    def _go():
        try:
            jax.profiler.start_trace(profile_dir)
        except Exception as e:  # noqa: BLE001 - diagnostics must not kill the run
            err.append(e)
        done.set()

    threading.Thread(target=_go, daemon=True).start()
    if not done.wait(timeout_s):
        log_fn(f"WARNING: jax.profiler.start_trace stalled >{timeout_s:.0f}s "
               "(known axon-tunnel hang) — skipping the profile trace")
        return False
    if err:
        log_fn(f"WARNING: jax.profiler.start_trace failed ({err[0]!r}) — "
               "skipping the profile trace")
        return False
    return True


def _prepare_writer_dir(log_dir: str, *, resume: bool, assume_yes: bool,
                        train_time: int):
    """Interactive removal guard (main_shot_vae.py:215-219) with --yes escape."""
    if resume or not os.path.exists(log_dir):
        return
    if assume_yes:
        shutil.rmtree(log_dir, ignore_errors=True)
        return
    flag = input(
        f"vae_train_time:{train_time} will be removed, input yes to continue:")
    if flag == "yes":
        shutil.rmtree(log_dir, ignore_errors=True)


def _sched_to_device(sched: dict) -> dict:
    return {k: jnp.float32(v) for k, v in sched.items()}


def _padded_eval_batches(indices: np.ndarray, batch_size: int):
    """Fixed-size eval batches + 0/1 weight masks (tail padded by wraparound)."""
    for idx in epoch_batches(np.random.default_rng(0), indices, batch_size,
                             drop_last=False, shuffle=False):
        real = len(idx)
        weight = np.ones(batch_size, np.float32)
        if real < batch_size:
            idx = np.concatenate([idx, np.resize(idx, batch_size - real)])
            weight[real:] = 0.0
        yield jnp.asarray(idx), jnp.asarray(weight)


def _make_dp(cfg) -> DataParallel:
    # reference quirk parity: --dp is store_false, i.e. passing it DISABLES
    # data parallelism (main_shot_vae.py:47) -> restrict the mesh to 1 device
    if not getattr(cfg, "dp", True):
        return DataParallel(make_mesh(1))
    if getattr(cfg, "num_devices", None):
        return DataParallel(make_mesh(cfg.num_devices))
    return DataParallel()


def run_shot_vae(cfg: ShotVaeConfig, *, m2: bool = False,
                 max_epochs: Optional[int] = None, log_fn=print) -> dict:
    """Train SHOT-VAE (or the M2 baseline with ``m2=True``); returns summary.

    Mirrors main_shot_vae.py:120-258 / main_M2_vae.py:104-240.
    """
    tag = "M2-VAE" if m2 else "SHOT-VAE"
    spec = cfg.apply_dataset_overrides(m2=m2)
    train_data, _ = load_dataset(spec.name, cfg.base_path, train=True,
                                 synthetic_fallback=cfg.synthetic_data,
                                 synthetic_size=cfg.synthetic_size)
    test_data, _ = load_dataset(spec.name, cfg.base_path, train=False,
                                synthetic_fallback=cfg.synthetic_data,
                                synthetic_size=max(cfg.synthetic_size // 4, 256))
    split = ssl_split(train_data.labels, spec.valid_per_class,
                      spec.annotated_per_class, spec.num_classes,
                      seed=cfg.seed)
    if len(split.labeled) == 0 or len(split.unlabeled) < cfg.batch_size:
        raise ValueError(
            f"SSL split too small for training: labeled={len(split.labeled)}, "
            f"unlabeled={len(split.unlabeled)}, batch={cfg.batch_size} "
            f"(dataset {len(train_data.labels)} samples, "
            f"valid_per_class={spec.valid_per_class})")

    dp = _make_dp(cfg)
    if cfg.batch_size % dp.num_devices:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the data mesh "
            f"size {dp.num_devices} (use --num-devices or adjust -b)")
    train_ds = DeviceDataset(train_data, sharding=dp.replicated())
    test_ds = DeviceDataset(test_data, sharding=dp.replicated())

    dtype = jnp.bfloat16 if cfg.bf16 else None
    model = VariationalAutoEncoder(
        encoder_name=cfg.net_name, num_input_channels=spec.input_channels,
        drop_rate=cfg.drop_rate, img_size=tuple(cfg.image_size),
        continuous_latent_dim=cfg.ldc, disc_latent_dim=spec.num_classes,
        sample_temperature=cfg.temperature, small_input=spec.small_input,
        efficient=cfg.efficient, dtype=dtype)

    steps_per_epoch = num_batches(len(split.unlabeled), cfg.batch_size)
    lr_sched = multistep_lr(cfg.lr, cfg.adjust_lr, steps_per_epoch)
    tx = sgd_torch(lr_sched, momentum=cfg.beta1, weight_decay=cfg.wd)
    params, batch_stats = init_model(
        model, jax.random.key(cfg.seed),
        jnp.zeros((2, *cfg.image_size, spec.input_channels)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx))

    # prewarm only when this run will actually save (ckpt_every=0 benchmark
    # runs must not get a 200s background tensorstore init on the tunnel)
    ckpt = CheckpointManager(cfg.base_path, spec.name, cfg.train_time, tag=tag,
                             prewarm=cfg.ckpt_every > 0)
    start_epoch = cfg.start_epoch
    if cfg.resume:
        state, start_epoch, stored_cfg = ckpt.restore(state, path=cfg.resume)
        # reference restores args wholesale from the checkpoint (":202-213")
        if stored_cfg:
            for k, v in stored_cfg.items():
                if hasattr(cfg, k) and k not in ("resume", "start_epoch"):
                    setattr(cfg, k, v)
        log_fn(f"=> loaded checkpoint '{cfg.resume}' (epoch {start_epoch})")

    log_dir = os.path.join(cfg.base_path, f"{spec.name}-{tag}", "runs",
                           f"train_time:{cfg.train_time}")
    _prepare_writer_dir(log_dir, resume=bool(cfg.resume), assume_yes=cfg.yes,
                        train_time=cfg.train_time)
    writer = TBWriter(log_dir)

    # per-replica BN (DataParallel-faithful) runs the step under shard_map
    axis_name = dp.axis_name if getattr(cfg, "bn_per_replica", False) else None
    global_mixup = getattr(cfg, "global_mixup", False)
    if global_mixup and axis_name is None:
        raise ValueError("--global-mixup requires --bn-per-replica (the "
                         "default GSPMD mode already mixes over the global "
                         "batch)")
    if m2:
        raw_step = steps_lib.make_m2_train_step(
            model, num_classes=spec.num_classes, bce=cfg.br,
            x_sigma=cfg.x_sigma, axis_name=axis_name)
    else:
        raw_step = steps_lib.make_shot_vae_train_step(
            model, num_classes=spec.num_classes, bce=cfg.br,
            x_sigma=cfg.x_sigma, epsilon=cfg.epsilon, optimal_match=cfg.om,
            axis_name=axis_name, global_mixup=global_mixup)
    raw_eval = steps_lib.make_vae_eval_step(
        model, num_classes=spec.num_classes, bce=cfg.br, x_sigma=cfg.x_sigma)

    def step_by_index(state, idx_l, idx_u, sched, key):
        img_l, lab_l = train_ds.gather(idx_l)
        img_u, lab_u = train_ds.gather(idx_u)
        return raw_step(state, img_l, lab_l, img_u, lab_u, sched, key)

    def eval_factory(ds):
        def f(state, idx, weight, key):
            img, lab = ds.gather(idx)
            return raw_eval(state, img, lab, weight, key)
        return f

    if axis_name is not None:
        train_jit = dp.shard_map_step(step_by_index, batch_argnums=(0, 1))
    else:
        train_jit = dp.jit_step(step_by_index, batch_argnums=(0, 1))

    spc = max(1, int(getattr(cfg, "steps_per_call", 1)))
    run_chunk = _make_chunk_runner(dp, step_by_index, axis_name=axis_name)

    ev_valid = dp.jit_step(eval_factory(train_ds), batch_argnums=(0, 1),
                           donate_state=False)
    ev_test = dp.jit_step(eval_factory(test_ds), batch_argnums=(0, 1),
                          donate_state=False)

    base_key = jax.random.key(cfg.seed + 1000)

    best_valid_acc = -1.0
    history = []
    profile_dir = getattr(cfg, "profile_dir", "")
    trace_active = False
    total_epochs = max_epochs if max_epochs is not None else cfg.epochs
    for epoch in range(start_epoch, total_epochs):
        if profile_dir and epoch == start_epoch + 1:
            # trace the second epoch (first is compile-dominated);
            # SURVEY.md §5.1: optional jax.profiler hooks
            trace_active = _start_trace_guarded(profile_dir, log_fn)
        epoch_key = jax.random.fold_in(base_key, epoch)
        # data-order RNG is EPOCH-KEYED (not a stream advanced across
        # epochs) so a resume from epoch e replays exactly the batches the
        # uninterrupted run would have drawn — bit-exact resume, pinned by
        # tests/test_loops_e2e.py::test_resume_bit_exact. Deviation vs the
        # reference's continuously-advancing sampler RNG: same distribution,
        # different concrete order (documented, README §parity).
        labeled_iter = infinite_batches(
            np.random.default_rng([cfg.seed + 1, epoch]), split.labeled,
            cfg.batch_size)
        rng_u = np.random.default_rng([cfg.seed + 2, epoch])
        epoch_t0 = time.time()
        sched_host = shot_vae_epoch_schedules(epoch, cfg)
        sched = _sched_to_device(sched_host)
        batch_time = AverageMeter()
        data_time = AverageMeter()
        # Every scalar train metric accumulates EVERY batch like the
        # reference KL_Inference meter (main_shot_vae.py:340) — as device
        # scalars (lazy adds per step, no host sync); ONE device_get per
        # epoch. The per-term decomposition (recon/KL/posterior per stream)
        # lands in history so a rising scheduled total is attributable to
        # the ew/pwm/ucw ramps rather than divergence.
        sums_dev: dict = {}
        n_steps = 0
        end = time.time()
        if spc > 1:
            u_batches = list(epoch_batches(rng_u, split.unlabeled,
                                           cfg.batch_size))
            l_batches = [next(labeled_iter) for _ in u_batches]
            # full-epoch index prep happens above, outside per-chunk cost —
            # restart the clock so the first chunk's meters aren't distorted
            end = time.time()
            for c0 in range(0, len(u_batches), spc):
                idx_u_c = np.stack(u_batches[c0:c0 + spc])
                idx_l_c = np.stack(l_batches[c0:c0 + spc])
                n = len(idx_u_c)
                data_time.update((time.time() - end) / n, n)
                state, ms = run_chunk(state, (idx_l_c, idx_u_c), (sched,),
                                      _chunk_keys(epoch_key, c0, n))
                for k, v in ms.items():
                    if getattr(v, "ndim", 0) == 1:  # (n,) per-step scalars
                        sums_dev[k] = sums_dev.get(k, jnp.float32(0.0)) \
                            + jnp.sum(v)
                n_steps += n
                batch_time.update((time.time() - end) / n, n)
                end = time.time()
                if (c0 // spc) % cfg.print_freq == 0:
                    log_fn(f"Epoch: [{epoch}][{c0 + n}/{steps_per_epoch}]\t"
                           f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})"
                           f"\tData {data_time.val:.3f} ({data_time.avg:.3f})")
            idx_u = u_batches[-1]  # reconstruct-freq image logging below
        else:
            for i, idx_u in enumerate(epoch_batches(rng_u, split.unlabeled,
                                                    cfg.batch_size)):
                idx_l = next(labeled_iter)
                # "data" = host-side batch prep; the actual gather+augment
                # runs inside the compiled step (counted in batch_time, like
                # the reference's GPU transforms land in its batch_time).
                data_time.update(time.time() - end)
                state, t_metrics = train_jit(
                    state, jnp.asarray(idx_l), jnp.asarray(idx_u), sched,
                    jax.random.fold_in(epoch_key, i))
                for k, v in t_metrics.items():
                    if getattr(v, "ndim", 0) == 0:
                        sums_dev[k] = sums_dev.get(k, jnp.float32(0.0)) + v
                n_steps += 1
                batch_time.update(time.time() - end)
                end = time.time()
                if i % cfg.print_freq == 0:
                    # main_shot_vae.py:367-374 print format
                    # ("Time/Data val (avg)"). NB: values are DISPATCH-side —
                    # train_jit returns before the device finishes, so "Time"
                    # reflects enqueue + queue backpressure, not per-step
                    # device latency (deliberate: a per-step sync would
                    # serialize the pipeline)
                    log_fn(f"Epoch: [{epoch}][{i + 1}/{steps_per_epoch}]\t"
                           f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})"
                           f"\tData {data_time.val:.3f} ({data_time.avg:.3f})")
        if trace_active and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
            trace_active = False
        train_terms = {k: float(v) / max(n_steps, 1)
                       for k, v in jax.device_get(sums_dev).items()}
        writer.scalar("Train/KL_Inference",
                      train_terms.get("kl_inference", 0.0), epoch + 1)
        if epoch % cfg.reconstruct_freq == 0:
            # Train/Raw_Image + Reconstruct_Image grids (":378-383"); uses an
            # eval-mode forward on the last unlabeled batch (the reference
            # grabs the train-mode recon of that batch — same images)
            idx4 = jnp.asarray(idx_u[:4])
            w4 = jnp.ones((len(idx4),))
            img4 = jnp.take(train_ds.images, idx4, axis=0)
            lab4 = jnp.take(train_ds.labels, idx4, axis=0)
            _, recon4 = raw_eval(state, img4, lab4, w4,
                                 jax.random.fold_in(epoch_key, 99_999))
            writer.image_grid("Train/Raw_Image",
                              np.asarray(img4).astype(np.float32) / 255.0,
                              epoch + 1)
            writer.image_grid("Train/Reconstruct_Image", np.asarray(recon4),
                              epoch + 1)

        # ---- valid & test (":409-510") ----
        results = {}
        for split_name, ev_jit, indices, ds in (
                ("Valid", ev_valid, split.valid, train_ds),
                ("Test", ev_test, np.arange(len(test_data.labels)), test_ds)):
            acc = MetricAccumulator()
            recon_imgs = raw_imgs = None
            batch_metrics = []
            for j, (idx, weight) in enumerate(
                    _padded_eval_batches(indices, cfg.batch_size)):
                metrics, recon = ev_jit(state, idx, weight,
                                        jax.random.fold_in(epoch_key,
                                                           10_000 + j))
                # collect device dicts, fetch ONCE per split below — a
                # per-batch float() would cost one tunnel round trip per
                # eval batch (multi-ms dispatch floor, CLAUDE.md)
                batch_metrics.append(metrics)
                if recon_imgs is None:
                    recon_imgs = np.asarray(recon[:4])
                    raw_imgs = np.asarray(
                        jnp.take(ds.images, idx[:4], axis=0)
                    ).astype(np.float32) / 255.0
            for m in jax.device_get(batch_metrics):
                acc.update(m)
            avg = acc.averages()
            results[split_name] = avg
            writer.scalar(f"{split_name}/KL(q(z|X)||p(z))",
                          avg["cont_kl_avg"], epoch + 1)
            writer.scalar(f"{split_name}/KL(q(y|X)||p(y))",
                          avg["disc_kl_avg"], epoch + 1)
            writer.scalar(f"{split_name}/log(p(X|z,y))", avg["mse_avg"],
                          epoch + 1)
            writer.scalar(f"{split_name}/ELBO", avg["elbo_avg"], epoch + 1)
            writer.scalar(f"{split_name}/top1 accuracy", avg["top1_rate"],
                          epoch + 1)
            if spec.name == "Cifar100":
                writer.scalar(f"{split_name}/top 5 accuracy",
                              avg["top5_rate"], epoch + 1)
            if epoch % cfg.reconstruct_freq == 0 and raw_imgs is not None:
                writer.image_grid(f"{split_name}/Raw_Image", raw_imgs,
                                  epoch + 1)
                writer.image_grid(f"{split_name}/Reconstruct_Image",
                                  recon_imgs, epoch + 1)

        valid_acc = results["Valid"]["top1_rate"]
        test_acc = results["Test"]["top1_rate"]
        log_fn(f"Epoch {epoch}: valid top1 {valid_acc:.4f}, "
               f"test top1 {test_acc:.4f}")
        history.append({"epoch": epoch, "valid_top1": valid_acc,
                        "test_top1": test_acc,
                        "train_loss": train_terms.get("loss", 0.0),
                        "train_terms": train_terms,
                        "sched": {k: float(v) for k, v in sched_host.items()},
                        "seconds": time.time() - epoch_t0})

        # Cifar10 ewm x5 bump at the first milestone (":255-258", SHOT only).
        # Applied BEFORE the epoch's checkpoint saves (the reference saves
        # first, main_shot_vae.py:237-258, so its epoch-(m+1) checkpoint
        # serializes the pre-bump ewm and a resume at m+1 never re-fires
        # `epoch == adjust_lr[0]` — epochs m+1.. train with ew 5x too small).
        # Saving the bumped value keeps resume bit-exact vs an uninterrupted
        # run; documented as a parity deviation in README.md.
        if not m2 and spec.name == "Cifar10" and cfg.annotated_ratio >= 0.05 \
                and epoch == cfg.adjust_lr[0]:
            cfg.ewm = cfg.ewm * 5
        # ckpt_every <= 0 disables checkpointing entirely (benchmarks /
        # short experiments; the first orbax save costs ~200s on this
        # tunnel). Default 1 = reference parity (save every epoch).
        if cfg.ckpt_every > 0 and ((epoch + 1) % cfg.ckpt_every == 0
                                   or epoch == total_epochs - 1):
            ckpt.save(state, epoch=epoch + 1, config=cfg.asdict())
        # deviation (documented): best = MAX validation accuracy
        if valid_acc > best_valid_acc:
            best_valid_acc = valid_acc
            if cfg.ckpt_every > 0 and epoch >= cfg.adjust_lr[-1]:
                ckpt.save(state, epoch=epoch + 1, config=cfg.asdict(),
                          best=True)
        writer.flush()

    writer.close()
    ckpt.wait_until_finished()  # commit barrier: async writes land before return
    return {"best_valid_acc": best_valid_acc, "history": history,
            "state": state}


def run_classifier(cfg, *, max_epochs: Optional[int] = None,
                   log_fn=print) -> dict:
    """Supervised WRN baseline (main_classifier.py:82-278): trains on the
    labeled split only."""
    spec = cfg.apply_dataset_overrides()
    train_data, _ = load_dataset(spec.name, cfg.base_path, train=True,
                                 synthetic_fallback=cfg.synthetic_data,
                                 synthetic_size=cfg.synthetic_size)
    test_data, _ = load_dataset(spec.name, cfg.base_path, train=False,
                                synthetic_fallback=cfg.synthetic_data,
                                synthetic_size=max(cfg.synthetic_size // 4, 256))
    split = ssl_split(train_data.labels, spec.valid_per_class,
                      spec.annotated_per_class, spec.num_classes,
                      seed=cfg.seed)
    if len(split.labeled) == 0:
        raise ValueError(
            f"SSL split has no labeled samples (dataset "
            f"{len(train_data.labels)}, valid_per_class={spec.valid_per_class})")
    dp = _make_dp(cfg)
    train_ds = DeviceDataset(train_data, sharding=dp.replicated())
    test_ds = DeviceDataset(test_data, sharding=dp.replicated())

    dtype = jnp.bfloat16 if cfg.bf16 else None
    model = build_classifier(cfg.net_name, spec.num_classes,
                             drop_rate=cfg.drop_rate,
                             small_input=spec.small_input, dtype=dtype)
    batch = min(cfg.batch_size, len(split.labeled))
    batch = dp.pad_batch_size(batch)
    steps_per_epoch = max(1, num_batches(len(split.labeled), batch,
                                         drop_last=False))
    lr_sched = multistep_lr(cfg.lr, cfg.adjust_lr, steps_per_epoch)
    tx = sgd_torch(lr_sched, momentum=cfg.beta1, weight_decay=cfg.wd)
    params, batch_stats = init_model(
        model, jax.random.key(cfg.seed),
        jnp.zeros((2, *cfg.image_size, spec.input_channels)))
    # explicit init override (classifier_model/wideresnet.py:104-118)
    params = apply_classifier_init(jax.random.key(cfg.seed + 7), params)
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx))

    log_dir = os.path.join(cfg.base_path, f"{spec.name}-SSL-Classifier",
                           "runs", f"train_time:{cfg.train_time}")
    _prepare_writer_dir(log_dir, resume=False, assume_yes=cfg.yes,
                        train_time=cfg.train_time)
    writer = TBWriter(log_dir)

    # per-replica BN (DataParallel-faithful) runs the step under shard_map,
    # same wiring as the SHOT/M2 loops (classifier_model/wideresnet.py:79-101
    # wraps every submodule in nn.DataParallel too)
    axis_name = dp.axis_name if getattr(cfg, "bn_per_replica", False) else None
    raw_step = steps_lib.make_classifier_train_step(model,
                                                    axis_name=axis_name)
    raw_eval = steps_lib.make_classifier_eval_step(
        model, num_classes=spec.num_classes)

    def step_by_index(state, idx, key):
        img, lab = train_ds.gather(idx)
        return raw_step(state, img, lab, key)

    def eval_factory(ds):
        def f(state, idx, weight):
            img, lab = ds.gather(idx)
            return raw_eval(state, img, lab, weight)
        return f

    if axis_name is not None:
        train_jit = dp.shard_map_step(step_by_index, batch_argnums=(0,))
    else:
        train_jit = dp.jit_step(step_by_index, batch_argnums=(0,))
    spc = max(1, int(getattr(cfg, "steps_per_call", 1)))
    run_chunk = _make_chunk_runner(dp, step_by_index, axis_name=axis_name)
    ev_valid = dp.jit_step(eval_factory(train_ds), batch_argnums=(0, 1),
                           donate_state=False)
    ev_test = dp.jit_step(eval_factory(test_ds), batch_argnums=(0, 1),
                          donate_state=False)

    rng = np.random.default_rng(cfg.seed)
    labeled_iter = infinite_batches(rng, split.labeled, batch)
    base_key = jax.random.key(cfg.seed + 1000)
    history = []
    train_losses = []
    total_epochs = max_epochs if max_epochs is not None else cfg.epochs
    for epoch in range(total_epochs):
        losses = AverageMeter()
        step_losses = []
        epoch_key = jax.random.fold_in(base_key, epoch)
        if spc > 1:
            idxs = [next(labeled_iter) for _ in range(steps_per_epoch)]
            for c0 in range(0, steps_per_epoch, spc):
                chunk = np.stack(idxs[c0:c0 + spc])
                state, ms = run_chunk(state, (chunk,), (),
                                      _chunk_keys(epoch_key, c0, len(chunk)))
                step_losses.append(ms["cls_loss"])  # (n,) per chunk
        else:
            for i in range(steps_per_epoch):
                idx = next(labeled_iter)
                state, metrics = train_jit(
                    state, jnp.asarray(idx),
                    jax.random.fold_in(epoch_key, i))
                # meter updates EVERY batch (main_classifier.py:196); device
                # arrays are collected async and fetched once per epoch so
                # the dispatch queue never blocks on a per-step sync
                step_losses.append(metrics["cls_loss"])
        for v in np.concatenate([np.atleast_1d(np.asarray(x))
                                 for x in jax.device_get(step_losses)]):
            losses.update(float(v), batch)
        writer.scalar("Train/cls_loss", losses.avg, epoch + 1)
        train_losses.append(losses.avg)

        out = {}
        for name, ev_jit, indices in (("Valid", ev_valid, split.valid),
                                      ("Test", ev_test,
                                       np.arange(len(test_data.labels)))):
            acc = MetricAccumulator()
            # dispatch all eval batches, fetch once (no per-batch sync)
            batch_metrics = [ev_jit(state, idx, weight) for idx, weight
                             in _padded_eval_batches(indices, cfg.batch_size)]
            for m in jax.device_get(batch_metrics):
                acc.update(m)
            avg = acc.averages()
            out[name] = avg
            writer.scalar(f"{name}/cls_loss", avg["cls_loss_avg"], epoch + 1)
            writer.scalar(f"{name}/top 1 accuracy", avg["top1_rate"],
                          epoch + 1)
            if spec.name == "Cifar100":
                writer.scalar(f"{name}/top 5 accuracy", avg["top5_rate"],
                              epoch + 1)
        log_fn(f"Epoch {epoch}: valid {out['Valid']['top1_rate']:.4f} "
               f"test {out['Test']['top1_rate']:.4f}")
        history.append({"epoch": epoch,
                        "valid_top1": out["Valid"]["top1_rate"],
                        "test_top1": out["Test"]["top1_rate"],
                        "train_loss": losses.avg})
    writer.close()
    return {"history": history, "train_losses": train_losses, "state": state}


class ReduceLROnPlateau:
    """Host-side torch ReduceLROnPlateau (factor 0.1, patience 10, mode min,
    rel threshold 1e-4) used by the SVHN smooth-ELBO driver
    (main_smooth_ELBO_svhn.py:429,130). torch only counts an improvement when
    ``metric < best * (1 - threshold)`` — strict ``<`` would let
    infinitesimal improvements reset patience and delay LR drops."""

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def run_smooth_elbo(cfg: SmoothElboConfig, dataset: str = "mnist", *,
                    max_epochs: Optional[int] = None, log_fn=print) -> dict:
    """One-stage smooth-ELBO trainer (main_smooth_ELBO_mnist.py:36-225)."""
    from shotvae_tpu.models.smooth_vae import mnist_vae_config, svhn_vae_config

    assert dataset in ("mnist", "svhn")
    data_dir = cfg.path_to_data or os.path.join(cfg.base_path, "dataset",
                                                dataset)
    try:
        if dataset == "mnist":
            train = load_mnist(data_dir, train=True)
            test = load_mnist(data_dir, train=False)
        else:
            train = load_svhn(data_dir, train=True)
            test = load_svhn(data_dir, train=False)
    except FileNotFoundError:
        if not cfg.synthetic_data:
            raise
        shape = (32, 32, 1) if dataset == "mnist" else (32, 32, 3)
        train = synthetic_dataset(2048, shape, 10, seed=0)
        test = synthetic_dataset(512, shape, 10, seed=1)

    # MNIST 28x28 -> 32x32 resize once, on device (Resize(32) parity)
    if train.images.shape[1] != 32:
        def _resize(ds):
            r = resize_batch(jnp.asarray(ds.images, jnp.float32), 32)
            return type(ds)(np.asarray(jnp.clip(jnp.round(r), 0, 255),
                                       dtype=np.uint8), ds.labels)
        train, test = _resize(train), _resize(test)

    labeled_idx = labeled_subset_per_class(train.labels,
                                           cfg.size_labeled_data, 10,
                                           seed=cfg.seed)
    unlabeled_idx = np.arange(len(train.labels))
    log_fn(f"labeled size {len(labeled_idx)} unlabeled size "
           f"{len(unlabeled_idx)} dev size {len(test.labels)}")

    dp = DataParallel()
    train_ds = DeviceDataset(train, sharding=dp.replicated())
    test_ds = DeviceDataset(test, sharding=dp.replicated())

    mcfg = mnist_vae_config() if dataset == "mnist" else svhn_vae_config()
    mcfg["latent_cont_dim"] = cfg.latent_spec_cont
    mcfg["disc_dims"] = tuple(cfg.latent_spec_disc)
    model = SmoothVAE(**mcfg)

    import optax

    plateau = ReduceLROnPlateau() if cfg.use_plateau_scheduler else None
    tx = optax.inject_hyperparams(
        lambda learning_rate: adam_torch(learning_rate))(
            learning_rate=cfg.learning_rate)
    params, batch_stats = init_model(
        model, jax.random.key(cfg.seed),
        jnp.zeros((2, 32, 32, mcfg["img_channels"])))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=batch_stats, tx=tx)

    raw_step = steps_lib.make_smooth_elbo_train_step(
        model, alpha=cfg.alpha, cont_capacity=tuple(cfg.cont_capacity),
        disc_capacity=tuple(cfg.disc_capacity),
        disc_dims=tuple(cfg.latent_spec_disc))
    raw_eval = steps_lib.make_smooth_elbo_eval_step(model)

    def step_by_index(state, idx_u, idx_l, lr_scale, key):
        # plateau LR flows in through the step signature (a traced scalar —
        # no recompile on change) and is applied functionally via the
        # inject_hyperparams state, never by host-side opt_state mutation.
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.float32(cfg.learning_rate) * lr_scale
        state = state.replace(opt_state=state.opt_state._replace(
            hyperparams=hp))
        img_u, _ = train_ds.gather(idx_u)
        img_l, lab_l = train_ds.gather(idx_l)
        return raw_step(state, img_u, img_l, lab_l, key)

    def eval_by_index(state, idx, weight):
        img, lab = test_ds.gather(idx)
        return raw_eval(state, img, lab, weight)

    train_jit = jax.jit(step_by_index, donate_argnums=0)
    eval_jit = jax.jit(eval_by_index)

    save_dir = os.path.join(cfg.base_path, f"{dataset.upper()}-One-Stage-VAE")
    os.makedirs(save_dir, exist_ok=True)
    log_path = os.path.join(save_dir, f"{dataset.upper()}-One-Stage-VAE.txt")
    logf = open(log_path, "w")

    rng_u = np.random.default_rng(cfg.seed + 1)
    rng_l = np.random.default_rng(cfg.seed + 2)
    labeled_iter = infinite_batches(rng_l, labeled_idx, cfg.labeled_batch_size)
    base_key = jax.random.key(cfg.seed + 1000)
    history = []
    total_epochs = max_epochs if max_epochs is not None else cfg.epochs
    lr_scale = 1.0
    for epoch in range(total_epochs):
        # scalar metrics accumulate on device (lazy adds, no per-step host
        # sync on this 1-core host); ONE device_get per epoch.
        sums_dev: dict = {}
        nb = 0
        for i, idx_u in enumerate(epoch_batches(rng_u, unlabeled_idx,
                                                cfg.unlabeled_batch_size)):
            idx_l = next(labeled_iter)
            state, metrics = train_jit(
                state, jnp.asarray(idx_u), jnp.asarray(idx_l),
                jnp.float32(lr_scale),
                jax.random.fold_in(jax.random.fold_in(base_key, epoch), i))
            nb += 1
            for k, v in metrics.items():
                if getattr(v, "ndim", 0) == 0:
                    sums_dev[k] = sums_dev.get(k, jnp.float32(0.0)) + v
        sums = {k: float(v) for k, v in jax.device_get(sums_dev).items()}

        acc = MetricAccumulator()
        # dispatch all eval batches, fetch once (no per-batch sync)
        batch_metrics = [eval_jit(state, idx, weight) for idx, weight
                         in _padded_eval_batches(
                             np.arange(len(test.labels)),
                             cfg.test_batch_size)]
        for m in jax.device_get(batch_metrics):
            acc.update(m)
        avgs = acc.averages()
        test_acc = avgs["correct_rate"]
        mean_loss = sums.get("loss", 0.0) / max(nb, 1)
        tmp = (f"Epoch: {epoch} Average loss: {mean_loss:.2f} "
               f"Test Accuracy: {test_acc}\n")
        tmp += (f"u_recon_loss: {sums.get('u_recon', 0) / nb:.2f}, "
                f"u_cont: {sums.get('u_cont_cap', 0) / nb:.2f}, "
                f"u_disc: {sums.get('u_disc_cap', 0) / nb:.2f}\n")
        tmp += (f"l_recon_loss: {sums.get('l_recon', 0) / nb:.2f}, "
                f"l_cont: {sums.get('l_cont_cap', 0) / nb:.2f}, "
                f"l_disc: {sums.get('l_disc_cap', 0) / nb:.2f}, "
                f"class: {sums.get('classification', 0) / nb:.2f}\n")
        log_fn(tmp)
        logf.write(tmp + "\n")
        history.append({"epoch": epoch, "test_acc": float(test_acc),
                        "mean_loss": mean_loss,
                        # per-term epoch means (same accumulation as the log
                        # lines above) so learning-quality artifacts can
                        # separate recon from the capacity/class terms
                        "train_terms": {k: v / max(nb, 1)
                                        for k, v in sums.items()},
                        "lr_scale": float(lr_scale)})
        if plateau is not None:
            lr_scale = plateau.step(mean_loss)
    logf.close()

    # constructed right before its only save — nothing to overlap a prewarm with
    ckpt = CheckpointManager(cfg.base_path, dataset.upper(), cfg.train_time,
                             tag="One-Stage-VAE", prewarm=False)
    ckpt.save(state, epoch=total_epochs, config=cfg.asdict())
    ckpt.wait_until_finished()  # commit barrier before returning
    return {"history": history, "state": state, "log_path": log_path}
