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
    env = dict(os.environ, BENCH_BATCH="16", BENCH_STEPS="2",
               BENCH_SKIP_PROBE="1")
    env.update(extra_env)
    code = (
        "import sys, jax;"
        "jax.config.update('jax_platforms','cpu');"
        "import bench; sys.exit(bench.main())"
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


class TestBenchOutageContract:
    """A dead/hung backend must yield rc=1 AND one structured-JSON error
    line, never a raw traceback with no parseable output (the BENCH_r03
    failure mode: the 2026-08-17 axon-tunnel outage left parsed=null)."""

    def _assert_structured_error(self, proc, kind):
        assert proc.returncode == 1, (proc.stdout, proc.stderr[-500:])
        json_lines = [l for l in proc.stdout.splitlines()
                      if l.startswith("{")]
        assert len(json_lines) == 1, proc.stdout
        rec = json.loads(json_lines[0])
        assert rec["error"] == kind
        assert rec["value"] is None and rec["vs_baseline"] is None
        assert rec["unit"] == "images/sec/chip"
        assert rec["detail"]

    def test_probe_failure_emits_structured_json(self):
        proc = _run_bench({"BENCH_SKIP_PROBE": "",
                           "BENCH_PROBE_CMD": "exit 3"})
        self._assert_structured_error(proc, "tpu_unavailable")

    def test_probe_hang_times_out_to_structured_json(self):
        proc = _run_bench({"BENCH_SKIP_PROBE": "",
                           "BENCH_PROBE_CMD": "sleep 30",
                           "BENCH_PROBE_TIMEOUT": "1"})
        self._assert_structured_error(proc, "tpu_unavailable")
        assert "probe_timeout" in proc.stdout

    def test_probe_passes_through_on_success(self):
        proc = _run_bench({"BENCH_SKIP_PROBE": "", "BENCH_PROBE_CMD": "true",
                           "BENCH_KIND": "classifier"})
        assert proc.returncode == 0, proc.stderr[-2000:]
        rec = json.loads([l for l in proc.stdout.splitlines()
                          if l.startswith("{")][0])
        assert rec["value"] > 0


class TestRematMemoryContract:
    """DenseNet-121 `--efficient` (block-level remat) must FIT HBM at the
    production batch 768+768 — the docs/PERF.md memory study as a contract
    (un-remat'ed needs 19.18 G > 15.75 G HBM and OOMs; block remat fits).
    TPU-only: compile-time memory analysis needs the real backend (the
    conftest CPU mesh skips it); run on-chip via
    `python -m pytest tests/test_bench_contract.py -k remat --no-header`.
    """

    def test_densenet_efficient_fits_hbm_at_batch_768(self):
        import jax
        import pytest

        if jax.devices()[0].platform != "tpu":
            pytest.skip("memory contract is a TPU compile check")
        import jax.numpy as jnp

        from shotvae_tpu.models import VariationalAutoEncoder
        from shotvae_tpu.train import steps as steps_lib
        from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

        model = VariationalAutoEncoder(
            encoder_name="densenet-121", num_input_channels=3,
            continuous_latent_dim=128, disc_latent_dim=10,
            dtype=jnp.bfloat16, efficient=True)
        params, bs = init_model(model, jax.random.key(0),
                                jnp.zeros((2, 32, 32, 3)))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=bs, tx=sgd_torch(0.1))
        step = steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False)
        B = 768
        img = jnp.zeros((B, 32, 32, 3), jnp.uint8)
        lab = jnp.zeros((B,), jnp.int32)
        sched = {k: jnp.float32(v) for k, v in dict(
            cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
            pwm=1.0, ucw=1.0).items()}
        compiled = jax.jit(step, donate_argnums=(0,)).lower(
            state, img, lab, img, lab, sched, jax.random.key(1)).compile()
        mem = compiled.memory_analysis()
        live = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes - mem.alias_size_in_bytes)
        hbm = 15.75 * 2**30
        assert live < hbm, f"live bytes {live/2**30:.2f}G >= HBM"
