"""Accuracy-reproduction runner: the exact CIFAR-10(4k) 600-epoch recipe.

North star: CIFAR-10 4k-label SHOT-VAE, WRN-28-2, test top-1 within 0.5% of
the reference's ~0.915 (reference README.md:84-88 command, :123 result
curve). With the dataset on disk this runs the full recipe and reports the
final/best accuracy against the target; without it (this build environment
has no egress), it prints the execution plan and exits non-zero so the gap
is visible rather than silently skipped.

``--synthetic`` runs the SAME composed recipe at production scale on
synthetic data (50 000 train images, 4 000 labels, batch 768, --om, warmup
epoch 0, milestones 400/500/550, ewm x5 bump, per-epoch checkpoints,
best-after-last-milestone) and validates the SYSTEM rather than accuracy:
the training process is SIGKILLED mid-flight around ``--kill-epoch``,
resumed from its per-epoch checkpoint, and run to completion; a
double-resume probe then re-replays two epochs from the same checkpoint to
confirm the resumed trajectory is deterministic. The JSON verdict records
NaN-freeness, epoch-time flatness, the analytic LR trace (torch MultiStepLR
+ epoch-0 warmup semantics), and checkpoint artifacts. ~50-70 min on v5e-1.

Usage:
  python scripts/run_repro.py [--base-path BP] [--net-name wideresnet-28-2]
                              [--epochs 600] [--target 0.915]
  python scripts/run_repro.py --synthetic [--kill-epoch 300] [--epochs 600]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _expected_lr_trace(base_lr, milestones, epochs, gamma=0.1,
                       warmup_factor=0.2):
    """Per-epoch LR, reference semantics: lr*warmup_factor during epoch 0
    (main_shot_vae.py:223-225,253-254), MultiStepLR decay at milestones
    (scheduler.step(epoch) at epoch END, :252 — so epoch m itself still
    trains at the undecayed LR and the decay is first used at epoch m+1,
    matching ops/schedules.py:multistep_lr's (m+1)*steps_per_epoch
    boundary)."""
    out = []
    for e in range(epochs):
        lr = base_lr * (gamma ** sum(1 for m in milestones if e > m))
        out.append(lr * warmup_factor if e == 0 else lr)
    return out


def _run_synthetic(args) -> int:
    from shotvae_tpu.config import ShotVaeConfig
    from shotvae_tpu.train.loop import run_shot_vae

    base = os.path.abspath(args.base_path)
    os.makedirs(base, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = {"status": "RAN_SYNTHETIC", "net": args.net_name,
              "epochs": args.epochs, "kill_epoch": args.kill_epoch}

    ckpt = os.path.join(base, "Cifar10-SHOT-VAE", "parameter",
                        "train_time_1", "checkpoint")

    if args.resume_at is not None:
        # ---- continuation mode: a prior invocation's training process was
        # killed/wedged mid-flight (e.g. the 2026-08-19 axon-tunnel outage
        # froze the phase-2 trainer mid-dispatch at epoch 380/600, and it
        # was SIGKILLed) and its per-epoch A/B-slot checkpoints survive.
        # Treat the existing checkpoint as the kill point — the same
        # contract as the SIGKILL path, with an infrastructure-genuine
        # interruption — and run the probe + phase 2 from it. ----
        meta_path = ckpt + ".slot0.meta.json"
        alt = ckpt + ".slot1.meta.json"
        last = max((json.load(open(p))["epoch"] for p in (meta_path, alt)
                    if os.path.exists(p)), default=None)
        if last is None:
            report["status"] = "NO_CHECKPOINT_TO_RESUME"
            print(json.dumps(report, indent=2))
            return 1
        phase1_epochs = [last]
        report["phase1"] = {"epochs_seen": None, "last_epoch": last,
                            "sigkilled": True,
                            "interrupted_by": args.resume_at,
                            "seconds": None}
    else:
        # ---- phase 1: the reference command (README.md:84-88) + synthetic
        # data, as a subprocess we SIGKILL once it passes --kill-epoch ----
        cmd = [sys.executable, "-m", "shotvae_tpu.cli.main_shot_vae",
               "-bp", base, "--dataset", "Cifar10", "--net-name",
               args.net_name,
               "--br", "--om", "--epochs", str(args.epochs), "--yes",
               "--synthetic-data", "--synthetic-size",
               str(args.synthetic_size),
               "--steps-per-call", str(args.steps_per_call)]
        t0 = time.time()
        env = dict(os.environ, PYTHONUNBUFFERED="1")  # line-latency kill
        proc = subprocess.Popen(cmd, cwd=repo, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True, env=env)
        phase1_epochs = []
        killed = False
        for line in proc.stdout:
            if line.startswith("Epoch ") and "valid top1" in line:
                ep = int(line.split()[1].rstrip(":"))
                phase1_epochs.append(ep)
                if ep >= args.kill_epoch:
                    proc.send_signal(signal.SIGKILL)  # real mid-flight kill
                    killed = True
                    break
        proc.wait()
        report["phase1"] = {"epochs_seen": len(phase1_epochs),
                            "last_epoch": phase1_epochs[-1] if phase1_epochs
                            else None,
                            "sigkilled": killed,
                            "seconds": round(time.time() - t0, 1)}
        if not killed:
            report["status"] = "PHASE1_DIED_EARLY"
            print(json.dumps(report, indent=2))
            return 1

    def make_cfg(**kw):
        return ShotVaeConfig(
            base_path=base, dataset="Cifar10", net_name=args.net_name,
            br=True, om=True, epochs=args.epochs, yes=True, ckpt_every=1,
            synthetic_data=True, synthetic_size=args.synthetic_size,
            steps_per_call=args.steps_per_call,
            batch_size=args.batch_size, ldc=args.ldc, bf16=not args.no_bf16,
            valid_per_class=args.valid_per_class,
            annotated_per_class=args.annotated_per_class, **kw)

    # ---- determinism probe: two resumes, two epochs each, bit-compare.
    # The probe's own per-epoch saves would advance the A/B checkpoint
    # slots past the kill point, so the kill-point state is snapshotted
    # and restored around it. ----
    probe_to = None
    if not args.skip_determinism_probe:
        import shutil

        ckpt_dir = os.path.dirname(ckpt)
        snap = ckpt_dir + ".kill_snapshot"
        shutil.copytree(ckpt_dir, snap, dirs_exist_ok=True)
        states = []
        for _ in range(2):
            out = run_shot_vae(make_cfg(resume=ckpt),
                               max_epochs=phase1_epochs[-1] + 2,
                               log_fn=lambda *a: None)
            states.append(out["state"])
            probe_to = out["history"][-1]["epoch"]
            shutil.rmtree(ckpt_dir)
            shutil.copytree(snap, ckpt_dir)
        shutil.rmtree(snap)
        import jax
        import numpy as np
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(states[0].params),
                            jax.tree_util.tree_leaves(states[1].params)))
        report["double_resume_bit_exact"] = bool(same)

    # ---- phase 2: resume from the kill point, run to completion ----
    t1 = time.time()
    cfg2 = make_cfg(resume=ckpt)
    base_ewm = cfg2.ewm  # pre-run value; the x5 bump check is relative to it
    out = run_shot_vae(cfg2, log_fn=lambda *a: None)
    hist = out["history"]
    secs = [h["seconds"] for h in hist]
    losses = [h["train_loss"] for h in hist]
    import numpy as np
    half = len(secs) // 2
    report["phase2"] = {
        "resumed_from_epoch": hist[0]["epoch"] if hist else None,
        "final_epoch": hist[-1]["epoch"] if hist else None,
        "seconds": round(time.time() - t1, 1),
        "train_loss_first": losses[0], "train_loss_last": losses[-1],
        "nan_free": bool(np.all(np.isfinite(losses))),
        "epoch_seconds_median_first_half": round(
            float(np.median(secs[:half])), 2) if half else None,
        "epoch_seconds_median_second_half": round(
            float(np.median(secs[half:])), 2) if half else None,
        "epoch_seconds_p90": round(float(np.percentile(secs, 90)), 2),
        "best_valid_top1": out["best_valid_acc"],
        "ewm_bumped_x5": bool(cfg2.ewm > 0.9 * 5 * base_ewm) if args.epochs
        > 400 else None,
    }
    report["probe_resumed_through_epoch"] = probe_to
    report["lr_trace_epochs_0_1_399_400_499_500_549_550"] = [
        _expected_lr_trace(cfg2.lr, cfg2.adjust_lr, args.epochs)[e]
        for e in (0, 1, 399, 400, 499, 500, 549, 550) if e < args.epochs]
    best_dir = os.path.join(base, "Cifar10-SHOT-VAE", "parameter",
                            "train_time_1")
    report["checkpoint_artifacts"] = sorted(
        f for f in os.listdir(best_dir)) if os.path.isdir(best_dir) else []
    ok = (report["phase2"]["nan_free"]
          and report.get("double_resume_bit_exact", True)
          and report["phase2"]["final_epoch"] == args.epochs - 1)
    report["status"] = "OK" if ok else "CHECK_FAILED"
    out_path = os.path.join(base, "repro_synthetic.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base-path", default=".")
    p.add_argument("--net-name", default="wideresnet-28-2")
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--target", type=float, default=0.915,
                   help="reference plateau accuracy (BASELINE.md)")
    p.add_argument("--tolerance", type=float, default=0.005)
    p.add_argument("--synthetic", action="store_true",
                   help="run the full recipe on synthetic data with a "
                        "mid-flight SIGKILL + resume (system validation)")
    p.add_argument("--kill-epoch", type=int, default=300)
    p.add_argument("--resume-at", default=None, metavar="REASON",
                   help="skip phase 1 and treat the newest existing "
                        "checkpoint under --base-path as the kill point "
                        "(continuation after an external interruption; the "
                        "string is recorded as phase1.interrupted_by)")
    p.add_argument("--synthetic-size", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=768,
                   help="per-stream batch (non-default values are for "
                        "smoke-scale runs, e.g. the CPU regression test)")
    p.add_argument("--ldc", type=int, default=128)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--valid-per-class", type=int, default=0)
    p.add_argument("--annotated-per-class", type=int, default=0)
    p.add_argument("--skip-determinism-probe", action="store_true")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="scan N train steps per dispatch (see cli/common.py;"
                        " use the SAME value for kill and resume phases — "
                        "resume is bit-exact within one dispatch mode only)")
    args = p.parse_args(argv)

    if args.synthetic:
        return _run_synthetic(args)

    from shotvae_tpu.config import ShotVaeConfig

    # the reference CIFAR-10(4k) command: main_shot_vae.py -bp BP
    #   --net-name wideresnet-28-2 --dataset Cifar10 --br
    # (README.md:84-88; defaults: batch 768, lr 0.1, adjust_lr [400,500,550],
    #  epochs 600, annotated-ratio 0.1 -> 4000 labels, main_shot_vae.py:30-106)
    cfg = ShotVaeConfig(base_path=args.base_path, dataset="Cifar10",
                        net_name=args.net_name, br=True, epochs=args.epochs,
                        yes=True, ckpt_every=20)

    data_root = os.path.join(args.base_path, "dataset", "cifar",
                             "cifar-10-batches-py")
    if not os.path.isdir(data_root):
        plan = {
            "status": "DATA_ABSENT",
            "needs": f"{data_root}/ (standard cifar-10-batches-py pickles)",
            "would_run": {k: v for k, v in cfg.asdict().items()
                          if k in ("dataset", "net_name", "batch_size",
                                   "epochs", "lr", "adjust_lr", "br",
                                   "annotated_ratio", "epsilon",
                                   "temperature")},
            "labels": 4000,
            "target_test_top1": [args.target - args.tolerance,
                                 args.target + args.tolerance],
            "est_wall_clock_hours_v5e1":
                round(args.epochs * 45000 / 11500 / 3600, 2),
            "note": "no network egress in the build environment; place the "
                    "dataset under <base-path>/dataset/cifar and rerun",
        }
        print(json.dumps(plan, indent=2))
        return 2

    from shotvae_tpu.train.loop import run_shot_vae

    result = run_shot_vae(cfg)
    best = result["best_valid_acc"]
    final_test = result["history"][-1]["test_top1"]
    best_test = max(h["test_top1"] for h in result["history"])
    ok = abs(best_test - args.target) <= args.tolerance \
        or best_test > args.target
    print(json.dumps({
        "status": "RAN",
        "best_valid_top1": best,
        "final_test_top1": final_test,
        "best_test_top1": best_test,
        "target_test_top1": args.target,
        "within_tolerance": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
