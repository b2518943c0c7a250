"""Driver-contract smoke: bench.py must print exactly ONE JSON line.

Runs bench.py in a clean subprocess with the CPU platform forced before any
backend init (the axon plugin ignores JAX_PLATFORMS env vars) and tiny
shapes, then validates the schema the driver records in BENCH_r{N}.json.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ, BENCH_BATCH="16", BENCH_STEPS="2", **extra_env)
    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "import bench; bench.main()"
    )
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)


class TestBenchContract:
    def test_one_json_line_with_schema(self):
        proc = _run_bench({})
        assert proc.returncode == 0, proc.stderr[-2000:]
        json_lines = [l for l in proc.stdout.splitlines()
                      if l.startswith("{")]
        assert len(json_lines) == 1, proc.stdout
        rec = json.loads(json_lines[0])
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
        assert rec["unit"] == "images/sec/chip"
        assert rec["value"] > 0
        assert rec["vs_baseline"] is not None  # shot protocol has a baseline

    def test_classifier_kind_null_baseline(self):
        proc = _run_bench({"BENCH_KIND": "classifier"})
        assert proc.returncode == 0, proc.stderr[-2000:]
        rec = json.loads([l for l in proc.stdout.splitlines()
                          if l.startswith("{")][0])
        assert rec["vs_baseline"] is None
        assert rec["value"] > 0
