"""Tests for the sigmoid ramp, capacity anneal and LR schedules."""

import math
import types

import numpy as np
import jax.numpy as jnp

from shotvae_tpu.ops import schedules


class TestAlphaSchedule:
    def test_endpoints(self):
        assert schedules.alpha_schedule(0, 200, 1.0) == np.exp(-5.0)
        assert schedules.alpha_schedule(200, 200, 1.0) == 1.0
        assert schedules.alpha_schedule(500, 200, 1.0) == 1.0  # clamped

    def test_formula_midpoint(self):
        want = 2.3 * math.exp(-5 * (1 - 0.5) ** 2)
        assert np.isclose(schedules.alpha_schedule(100, 200, 2.3), want)

    def test_traced_matches_python(self):
        a = schedules.alpha_schedule(jnp.float32(37.0), 150, 0.7)
        b = schedules.alpha_schedule(37, 150, 0.7)
        assert np.isclose(float(a), b, rtol=1e-6)

    def test_shot_vae_schedule_dict(self):
        cfg = types.SimpleNamespace(akb=200, cmi=0.0, dmi=2.3, aew=400, ewm=1e-3,
                                    kbmc=1e-3, kbmd=1e-3, apw=200, pwm=1.0,
                                    wmf=0.4, epochs=600, wrd=1.0)
        s = schedules.shot_vae_epoch_schedules(100, cfg)
        assert set(s) == {"cmi", "dmi", "ew", "kl_beta_c", "kl_beta_d", "pwm", "ucw"}
        assert np.isclose(s["dmi"], schedules.alpha_schedule(100, 200, 2.3))
        assert np.isclose(s["ucw"], schedules.alpha_schedule(100, 240, 1.0))


class TestMultiStepLR:
    def test_repro_analytic_trace_matches_schedule(self):
        """scripts/run_repro.py's analytic per-epoch LR trace must agree
        with the implemented multistep_lr at every epoch (a round-3 review
        caught it decaying one epoch early: e >= m instead of e > m)."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "run_repro", os.path.join(os.path.dirname(__file__), os.pardir,
                                      "scripts", "run_repro.py"))
        run_repro = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(run_repro)
        spe, milestones, epochs = 7, [3, 5, 8], 12
        sched = schedules.multistep_lr(0.1, milestones, spe)
        trace = run_repro._expected_lr_trace(0.1, milestones, epochs)
        for e in range(epochs):
            np.testing.assert_allclose(float(sched(e * spe)), trace[e],
                                       rtol=1e-6, err_msg=f"epoch {e}")

    def test_warmup_and_milestones(self):
        spe = 10  # steps per epoch
        sched = schedules.multistep_lr(0.1, [400, 500, 550], spe)
        # epoch 0: warmup 0.2x
        assert np.isclose(float(sched(0)), 0.1 * 0.2)
        assert np.isclose(float(sched(spe - 1)), 0.1 * 0.2)
        # epoch 1..400: full lr — milestone epoch m still trains undecayed
        # (reference calls scheduler.step(epoch) at epoch END,
        # main_shot_vae.py:252; decay first applies at epoch m+1)
        assert np.isclose(float(sched(spe)), 0.1)
        assert np.isclose(float(sched(400 * spe)), 0.1)
        # from epoch m+1 on: x0.1 each
        assert np.isclose(float(sched(401 * spe)), 0.01)
        assert np.isclose(float(sched(501 * spe)), 0.001)
        assert np.isclose(float(sched(551 * spe)), 1e-4)

    def test_linear_capacity(self):
        assert np.isclose(float(schedules.linear_capacity(0, 0.0, 17.0, 1000)), 0.0)
        assert np.isclose(float(schedules.linear_capacity(500, 0.0, 17.0, 1000)), 8.5)
        assert np.isclose(float(schedules.linear_capacity(5000, 0.0, 17.0, 1000)), 17.0)
