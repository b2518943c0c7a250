"""CPU smoke coverage for the two real-chip profiler scripts.

The s2d A/B (scripts/bench_s2d.py) and the per-stage ceiling profiler
(scripts/profile_backward.py) produce their *numbers* on the real chip,
but their math — the analytic occupancy models, the space-to-depth kernel
folds, and the scan/grad timing arms — is shape-only and must stay
verifiable without the tunnel. These tests pin that layer so a queued
re-measurement (docs/PERF.md round-3 s2d caveat, round-4 decoder ceilings)
never fails on a script bug after waiting out a tunnel outage.

Match: /root/reference/shot_vae_model/wideresnet.py:23-49 (block1 convs),
/root/reference/shot_vae_model/decoder.py:12-62 (ConvT stack).
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    # flax's dataclass transform resolves annotations via
    # sys.modules[cls.__module__] — register before exec
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pb():
    return _load("profile_backward")


@pytest.fixture(scope="module")
def s2d():
    return _load("bench_s2d")


class TestCeilingModels:
    def test_conv_ceiling_full_lanes_is_peak(self, pb):
        # 128->128 @8x8 with B*Ho*Wo a multiple of 128: every view saturates
        # lane and depth, fwd/dgrad occupancy == 1 -> ceiling == peak
        rows = pb.conv_ceilings([("full", 128, 8, 8, 128, 128, 3, 1)])
        (r,) = rows
        assert r["fwd"][0] == pytest.approx(1.0)
        assert r["fwd"][1] == pytest.approx(pb.PEAK_TFLOPS)
        assert r["dgrad"][0] == pytest.approx(1.0)
        # wgrad output is Cin*9 = 1152 rows = 9 full 128-row tiles -> 1.0
        assert r["wgrad"][0] == pytest.approx(1.0)

    def test_conv_ceiling_block1_lane_underfill(self, pb):
        # the production block1 conv: N=32 lanes -> fwd occupancy 32/128,
        # and wgrad's whole output is 32*9=288 rows = 2.25 tiles -> mtile
        # 288/384; occupancies must be in (0, 1] and wgrad < fwd
        (r,) = pb.conv_ceilings([("b1", 768, 32, 32, 32, 32, 3, 1)])
        assert r["fwd"][0] == pytest.approx(32 / 128)
        for v in ("fwd", "dgrad", "wgrad"):
            assert 0.0 < r[v][0] <= 1.0
        assert r["wgrad"][0] < r["fwd"][0]

    def test_convt_k1s1_degenerates_to_plain_gemm(self, pb):
        # up0 is a 1x1/s1 "ConvT" == dense layer: both lowerings must agree
        # on every view (no dilation penalty, ks == k)
        (r,) = pb.convt_ceilings([("up0", 768, 1, 1, 138, 1024, 1, 1)])
        for v in ("fwd", "dgrad", "wgrad"):
            assert r["sub"][v] == pytest.approx(r["dil"][v])

    def test_convt_subpixel_beats_dilated_useful_flops(self, pb):
        # for a real k4/s2 up-stage, the subpixel form wastes no MACs while
        # lhs_dilation's fwd/wgrad useful-FLOP ceilings divide by s^2=4;
        # dgrad (a plain strided conv) is penalty-free in both
        (r,) = pb.convt_ceilings([("up4", 768, 8, 8, 128, 64, 4, 2)])
        assert r["sub"]["fwd"] > r["dil"]["fwd"]
        assert r["sub"]["wgrad"] > r["dil"]["wgrad"]
        assert r["sub"]["dgrad"] == pytest.approx(r["dil"]["dgrad"])
        for form in ("sub", "dil"):
            for v in ("fwd", "dgrad", "wgrad"):
                assert 0.0 < r[form][v] <= 1.0
        # useful FLOPs are lowering-independent
        assert r["flops"] == pytest.approx(2.0 * 768 * 8 * 8 * 16 * 128 * 64)

    def test_decoder_stage_module_compiles(self, pb):
        # the --decoder-stages timing path: one tiny up-stage through
        # time_stage (fwd + fwd/bwd scans compile and run on CPU)
        rows = []
        pb.time_stage("up tiny", pb.DecoderStage(8, (4, 4), (2, 2), "SAME",
                                                 dtype=jnp.float32),
                      (2, 4, 4, 8), jax.random.key(0), rows,
                      x_dtype=jnp.float32, passes=1)
        (name, t_f, t_b, t_fb, *_rest) = rows[0]
        # compile/run smoke only: fwd+bwd strictly supersets fwd, but the
        # two are timed separately and this 1-core host can invert the
        # wall-clock ordering under load — no ordering assert (ADVICE r4)
        assert t_f > 0 and t_fb > 0


class TestSpaceToDepthFolds:
    """The s2d kernel folds reorganise the SAME dot products — exact in f32."""

    def _setup(self, s2d, b=3, h=8, w=8, c=5, f=7):
        key = jax.random.key(42)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w, c), jnp.float32)
        wk = np.asarray(jax.random.normal(kw, (3, 3, c, f), jnp.float32))
        return x, wk

    def test_fold_3x3_exact(self, s2d):
        x, wk = self._setup(s2d)
        want = s2d.space_to_depth(s2d.conv(x, jnp.asarray(wk)))
        got = s2d.conv(s2d.space_to_depth(x),
                       jnp.asarray(s2d.fold_kernel_3x3(wk)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_fold_2x2x4_exact(self, s2d):
        x, wk = self._setup(s2d)
        want = s2d.space_to_depth(s2d.conv(x, jnp.asarray(wk)))
        xf = s2d.space_to_depth(x)
        pads = {0: (1, 0), 1: (0, 1)}
        outs = []
        for py in range(2):
            for px in range(2):
                wf = jnp.asarray(s2d.fold_kernel_2x2(wk, py, px))
                outs.append(jax.lax.conv_general_dilated(
                    xf, wf, (1, 1), [pads[py], pads[px]],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
        got = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_timing_arms_compile(self, s2d, monkeypatch):
        # all three timed arms (fwd, fwd+dgrad, fwd+dgrad+wgrad) must
        # compile and preserve dtype through the scan carry (the round-3
        # f32-carry bug promoted the convs under timing to f32)
        monkeypatch.setattr(s2d, "K", 2)
        x, wk = self._setup(s2d, b=2, h=4, w=4, c=3, f=3)
        x = x.astype(jnp.bfloat16)
        wkj = jnp.asarray(wk)

        def loss(xi, ws=(wkj,)):
            y = s2d.conv(xi, ws[0])
            assert y.dtype == jnp.bfloat16  # trace-time dtype check
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        t_f, t_fb, t_full = s2d.timed_pair(loss, x, "tiny", weights=(wkj,))
        assert t_f > 0 and t_fb > 0 and t_full > 0
