"""End-to-end regression cover for scripts/run_repro.py --synthetic.

The production 600-epoch system-run artifact (repro_synthetic.json) is
produced by this runner on the real chip; this smoke drives its
continuation mode (--resume-at) at tiny scale on the CPU mesh: an
existing per-epoch checkpoint is treated as the kill point (the
2026-08-19 axon-outage path — trainer wedged mid-dispatch, SIGKILLed,
checkpoints survive), then the double-resume determinism probe + phase 2
run to completion and the JSON verdict is written. The SIGKILL phase-1
path is exercised at production scale only: it spawns the CLI via
sys.executable, which on this image would grab the real TPU; keeping the
smoke in-process keeps it hermetic and CPU-bound.

Reference recipe being validated: /root/reference/main_shot_vae.py:222-258
(per-epoch checkpointing + resume semantics).
"""

import importlib.util
import json
import os

import pytest


def _load_run_repro():
    spec = importlib.util.spec_from_file_location(
        "run_repro", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "scripts", "run_repro.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SMOKE = dict(net_name="wideresnet-10-1", batch_size=48, ldc=8,
             synthetic_size=512, epochs=6, valid_per_class=10,
             annotated_per_class=20)


class TestReproContinuation:
    def test_resume_at_completes_and_writes_verdict(self, tmp_path):
        from shotvae_tpu.config import ShotVaeConfig
        from shotvae_tpu.train.loop import run_shot_vae

        run_repro = _load_run_repro()
        bp = str(tmp_path)

        # fabricate the kill point: 3 epochs of the SAME recipe with
        # per-epoch A/B-slot checkpoints (newest slot = epoch 2)
        cfg = ShotVaeConfig(
            base_path=bp, dataset="Cifar10", br=True, om=True, yes=True,
            ckpt_every=1, synthetic_data=True, bf16=False, **SMOKE)
        run_shot_vae(cfg, max_epochs=3, log_fn=lambda *a: None)
        meta = os.path.join(bp, "Cifar10-SHOT-VAE", "parameter",
                            "train_time_1", "checkpoint.slot0.meta.json")
        assert os.path.exists(meta)

        rc = run_repro.main([
            "--synthetic", "--base-path", bp, "--epochs", str(SMOKE["epochs"]),
            "--resume-at", "test-interrupt", "--net-name", SMOKE["net_name"],
            "--batch-size", str(SMOKE["batch_size"]), "--ldc",
            str(SMOKE["ldc"]), "--no-bf16",
            "--valid-per-class", str(SMOKE["valid_per_class"]),
            "--annotated-per-class", str(SMOKE["annotated_per_class"]),
            "--synthetic-size", str(SMOKE["synthetic_size"])])
        assert rc == 0

        report = json.load(open(os.path.join(bp, "repro_synthetic.json")))
        assert report["status"] == "OK"
        assert report["phase1"]["sigkilled"] is True
        assert report["phase1"]["interrupted_by"] == "test-interrupt"
        # slot meta records the resume START epoch (completed+1): 3 epochs
        # ran (0-2), so the kill point resumes at 3
        assert report["phase1"]["last_epoch"] == 3
        assert report["double_resume_bit_exact"] is True
        assert report["phase2"]["resumed_from_epoch"] == 3
        assert report["phase2"]["final_epoch"] == SMOKE["epochs"] - 1
        assert report["phase2"]["nan_free"] is True
        # epochs <= 400: the ewm x5 bump milestone is never crossed
        assert report["phase2"]["ewm_bumped_x5"] is None

    def test_resume_at_without_checkpoint_fails_loudly(self, tmp_path):
        run_repro = _load_run_repro()
        rc = run_repro.main([
            "--synthetic", "--base-path", str(tmp_path), "--epochs", "6",
            "--resume-at", "nothing-there", "--net-name", SMOKE["net_name"],
            "--batch-size", "48", "--ldc", "8", "--no-bf16",
            "--synthetic-size", "512"])
        assert rc == 1
