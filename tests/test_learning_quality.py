"""Regression cover for scripts/learning_quality.py.

The committed learning-quality artifact (learning_quality.json — the
200-epoch classifier/M2/SHOT comparison on the hard synthetic SSL set,
docs/PERF.md §"Round 5: the production recipe LEARNS") is produced by this
script on the real chip; this smoke drives the same code path at tiny
scale on the CPU mesh — one SHOT arm, 2 epochs — and pins the artifact
schema the PERF reading relies on: per-epoch curves with train_terms +
sched, the decomposition verdict fields (ew_ramped / recon_u_improved /
kl_inference_fell), and the summary ramp stats.

Reference recipe being proxied: /root/reference/main_shot_vae.py:261-384.
"""

import importlib.util
import json
import os

import pytest


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), os.pardir,
                           "scripts", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_shot_arm_writes_schema_complete_artifact(tmp_path):
    lq = _load("learning_quality")
    out = str(tmp_path / "lq.json")
    rc = lq.main(["--epochs", "2", "--net-name", "wideresnet-10-1",
                  "--batch-size", "32", "--n-train", "128", "--n-test", "64",
                  "--labels-per-class", "4", "--valid-per-class", "2",
                  "--arms", "shot", "--out", out])
    # rc gates on the 3-arm ordering, undefined for a 1-arm smoke — the
    # artifact contents are the contract under test
    assert rc in (0, 1)
    art = json.load(open(out))
    assert set(art) == {"verdict", "summary", "timings_s", "curves"}
    curves = art["curves"]["shot"]
    assert len(curves) == 2
    for h in curves:
        assert {"epoch", "valid_top1", "test_top1", "train_terms",
                "sched"} <= set(h)
        assert "loss" in h["train_terms"]
        assert "ew" in h["sched"]
    dec = art["verdict"]["shot_decomposition"]
    for k in ("ew_ramped", "recon_u_improved", "kl_inference_fell",
              "loss_first_q", "recon_u_last_q", "kl_inference_first_q"):
        assert k in dec
    s = art["summary"]["shot"]
    assert {"best_test_top1", "ramp_monotone", "ramp_first_q_mean"} <= set(s)


def test_milestone_scaling():
    lq = _load("learning_quality")
    assert lq.scale_milestones([400, 500, 550], 600, 200) == [133, 167, 183]
    assert lq.scale_milestones([300], 500, 2) == [1]  # never 0
