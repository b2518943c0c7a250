"""Driver-grade perf matrix: one bench.py capture per BASELINE.json config.

VERDICT r4 #2: only the headline SHOT WRN-28-2 config had a committed
machine-readable perf number; the other model-zoo configs
(reference run matrix, README.md:103-115 + main_shot_vae.py:58-59) lived as
prose in docs/PERF.md. This script shells out to ``bench.py`` (the same
outage-proof, probe-guarded protocol the round driver runs) once per config
with ``BENCH_KIND``/``BENCH_NET``/``BENCH_REPORT_FLOPS=1`` and writes
``BENCH_MATRIX.json``: per-config img/s/chip, step ms, analytic step TFLOP
(XLA cost_analysis) and MFU vs the v5e bf16 peak.

Usage:  python scripts/bench_matrix.py [--out BENCH_MATRIX.json] [--steps 20]
Runtime: ~10-25 min on v5e-1 (8 configs x compile + 23 steps each).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, env overrides). Batch sizes are each config's production batch:
# 768+768 SHOT/M2 (main_shot_vae.py -b default), 768 classifier (same
# surface), smooth trainers use their reference defaults internally.
CONFIGS = [
    ("shot_wrn28_2", {"BENCH_KIND": "shot", "BENCH_NET": "wideresnet-28-2"}),
    ("shot_wrn28_10", {"BENCH_KIND": "shot", "BENCH_NET": "wideresnet-28-10"}),
    ("m2_wrn28_2", {"BENCH_KIND": "m2", "BENCH_NET": "wideresnet-28-2"}),
    ("classifier_wrn28_2",
     {"BENCH_KIND": "classifier", "BENCH_NET": "wideresnet-28-2"}),
    ("shot_preactresnet18",
     {"BENCH_KIND": "shot", "BENCH_NET": "preactresnet18"}),
    ("shot_densenet121",
     {"BENCH_KIND": "shot", "BENCH_NET": "densenet121",
      "BENCH_EFFICIENT": "1"}),
    ("smooth_mnist", {"BENCH_KIND": "smooth_mnist"}),
    ("smooth_svhn", {"BENCH_KIND": "smooth_svhn"}),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "BENCH_MATRIX.json"))
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--only", default="",
                   help="comma-separated config labels to run")
    args = p.parse_args(argv)

    only = set(filter(None, args.only.split(",")))
    # resume: keep prior good rows, re-run errored/missing configs only —
    # a wall-clock kill mid-matrix (observed: the first capture died at an
    # outer 3600 s bound inside the densenet compile) must not lose the
    # configs already measured, so the artifact is also written after
    # EVERY config, not just at the end
    rows = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                rows = {k: v for k, v in json.load(f)["configs"].items()
                        if not v.get("error")}
        except (json.JSONDecodeError, KeyError):
            rows = {}

    def write_artifact():
        artifact = {"protocol": "bench.py per config (BENCH_REPORT_FLOPS=1), "
                                "probe-guarded, warmup 3 + measured steps",
                    "steps": args.steps, "peak_tflops_bf16": 197,
                    "configs": rows}
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)

    ok = True
    for label, env in CONFIGS:
        if only and label not in only:
            continue
        if label in rows:
            print(f"[{label}] cached: {json.dumps(rows[label])}", flush=True)
            continue
        full_env = dict(os.environ, BENCH_REPORT_FLOPS="1",
                        BENCH_STEPS=str(args.steps), **env)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, env=full_env, timeout=1800)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        except subprocess.TimeoutExpired:
            line = json.dumps({"error": "config_timeout_1800s"})
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            row = {"error": "unparseable", "detail": line[:200]}
        row["wall_s"] = round(time.time() - t0, 1)
        rows[label] = row
        ok = ok and not row.get("error")
        write_artifact()
        print(f"[{label}] {line}", flush=True)

    write_artifact()
    print(json.dumps({"written": args.out, "n": len(rows), "all_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
