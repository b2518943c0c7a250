"""Per-stage BACKWARD attribution for the SHOT-VAE step (VERDICT r2 #1).

Round 2 established the 66 ms WRN-28-2 step is ~73% backward running at
~61 TFLOP/s vs the forward's 89, but never said WHERE. This script applies
the forward discipline to the backward: each encoder/decoder stage is timed
fwd-only and fwd+bwd as K-iteration ``lax.scan``s inside ONE jit (per-call
wall timing has a multi-ms dispatch floor on this tunnel), guarding the
three XLA-elision traps documented in profile_breakdown.py:

  * nonlinear per-pass input transforms (conv linearity lets XLA share one
    trunk across "different" passes),
  * non-constant cotangents (squared-output loss; all-ones cotangents let
    XLA collapse transposed convs),
  * full gradient consumption (summing every leaf defeats DCE).

``bwd = (fwd+bwd) - fwd`` per stage. Stages are standalone modules with
fresh params — timing depends on shapes, not values. Each stage runs x4
(the production step applies the model 4 times).

Also prints an analytic MXU-occupancy ceiling per conv for fwd / dgrad /
wgrad: a k×k conv is an implicit GEMM whose output-lane dim is Cout (fwd),
Cin (dgrad), or Cout with only k*k*Cin output rows (wgrad); the ceiling is
peak * min(N,128)/128 * min(K,128)/128 (crude lane/depth underfill model,
v5e MXU is 128x128).

Run: python scripts/profile_backward.py [--net wideresnet-28-2] [--batch 768]
Match (reference hot loop): /root/reference/main_shot_vae.py:280-366.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

K = 10
PEAK_TFLOPS = 197.0  # v5e bf16


def device_time(fn, *args, n=5):
    """(per-iter seconds, per-iter flops) from ONE compiled K-scan.

    FLOPs come from the same compiled program's cost_analysis — a separate
    single-iteration compile would double the compile count, which dominates
    wall time on this tunnel (~30 s per compile). NB: XLA's HLO cost
    analysis counts a while-loop body ONCE regardless of trip count
    (verified against analytic conv FLOPs: block1 fwd x4 passes = 0.44 TF
    analytic == reported), so the reported number already IS the per-
    iteration cost — do not divide by K.
    """
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
    except Exception:
        fl = float("nan")
    out = compiled(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K, fl


# ---------------------------------------------------------------------------
# stage modules (WRN-d-w trunk split by group; shapes == production model)
# ---------------------------------------------------------------------------


class StageBlocks(nn.Module):
    """One WRN group: n units at `features`, first unit at `stride`."""

    features: int
    n_units: int
    first_stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from shotvae_tpu.models.wideresnet import WideResUnit

        for i in range(self.n_units):
            stride = self.first_stride if i == 0 else 1
            x = WideResUnit(self.features, stride, 0.0, train, self.dtype,
                            name=f"unit{i + 1}")(x)
        return x


class StageHead(nn.Module):
    """transition BN+LeakyReLU + global pool + 3 dense heads (f32)."""

    cont_dim: int = 128
    disc_dim: int = 10
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from jax import nn as jnn

        from shotvae_tpu.models.layers import (BatchNorm, TorchDense,
                                               global_avg_pool, leaky_relu)

        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="transition_norm")(x)
        x = leaky_relu(x)
        avg = global_avg_pool(x).astype(jnp.float32)
        m = TorchDense(self.cont_dim)(avg)
        s = TorchDense(self.cont_dim)(avg)
        a = jnn.log_softmax(TorchDense(self.disc_dim)(avg), axis=1)
        return jnp.concatenate([m, s, a], axis=1)


def time_stage(name, module, x_shape, key, rows, x_dtype=jnp.bfloat16,
               passes=4, takes_train=True):
    """fwd and fwd+bwd scan times for `passes` applications of `module`."""
    x0 = jax.random.normal(key, x_shape, x_dtype)
    kw = {"train": True} if takes_train else {}
    variables = module.init(jax.random.fold_in(key, 1), x0, **kw)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, xin):
        tot = jnp.float32(0.0)
        for j in range(passes):
            xj = jnp.tanh(xin * (1.0 + 0.1 * j))
            out = module.apply({"params": p, **rest}, xj, **kw,
                               mutable=list(rest.keys()))[0]
            tot = tot + jnp.sum(jnp.square(out.astype(jnp.float32)))
        return tot

    def fwd_scan():
        def body(carry, i):
            v = loss(params, x0 + carry)
            return (v * 1e-20).astype(x_dtype), ()
        return jax.lax.scan(body, jnp.zeros((), x_dtype), jnp.arange(K))[0]

    gradfn = jax.grad(loss, argnums=(0, 1))

    def bwd_scan():
        def body(carry, i):
            gp, gx = gradfn(params, x0 + carry)
            tot = sum(jnp.sum(t.astype(jnp.float32))
                      for t in jax.tree_util.tree_leaves(gp))
            tot = tot + jnp.sum(gx.astype(jnp.float32))
            return (tot * 1e-20).astype(x_dtype), ()
        return jax.lax.scan(body, jnp.zeros((), x_dtype), jnp.arange(K))[0]

    t_f, fl_f = device_time(fwd_scan)
    t_fb, fl_fb = device_time(bwd_scan)
    rows.append((name, t_f * 1e3, (t_fb - t_f) * 1e3, t_fb * 1e3,
                 fl_f / 1e12, (fl_fb - fl_f) / 1e12,
                 (fl_f / t_f) / 1e12 if t_f else 0.0,
                 ((fl_fb - fl_f) / (t_fb - t_f)) / 1e12 if t_fb > t_f else 0.0))
    return t_f, t_fb


# ---------------------------------------------------------------------------
# analytic per-conv occupancy ceilings
# ---------------------------------------------------------------------------


def conv_ceilings(convs):
    """[(label, B,H,W,Cin,Cout,k,stride)] -> per-conv fwd/dgrad/wgrad table.

    GEMM views (implicit im2col):
      fwd:   M=B*Ho*Wo        N=Cout        K=Cin*k*k
      dgrad: M=B*H*W          N=Cin         K=Cout*k*k
      wgrad: M=Cin*k*k        N=Cout        K=B*Ho*Wo
    ceiling = PEAK * lane(N) * depth(K) * mtile(M) where
      lane(N)  = min(N,128)/128          (output-lane underfill)
      depth(K) = min(K,128)/128          (contraction-depth underfill)
      mtile(M) = M / (ceil(M/128)*128)   (partial last M-tile; matters for
                 wgrad, whose whole output is Cin*k*k rows — e.g. 144 rows
                 occupy two 128-row tiles at 56% average utilisation)
    """
    out = []
    for (label, B, H, W, cin, cout, k, s) in convs:
        ho, wo = H // s, W // s
        fl = 2.0 * B * ho * wo * cout * cin * k * k
        views = {
            "fwd": (B * ho * wo, cout, cin * k * k, fl),
            "dgrad": (B * H * W, cin, cout * k * k, fl),
            "wgrad": (cin * k * k, cout, B * ho * wo, fl),
        }
        row = {"label": label, "flops": fl}
        for vname, (M, N, Kd, f) in views.items():
            mtile = M / (-(-M // 128) * 128)
            occ = (min(N, 128) / 128.0 * min(Kd, 128) / 128.0 * mtile)
            row[vname] = (occ, PEAK_TFLOPS * occ)
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# decoder ConvT ceilings (VERDICT r3 #4): the same lane/depth/M-tile model,
# applied to BOTH lowering strategies for a k4/s2 transposed conv
# ---------------------------------------------------------------------------


def convt_ceilings(stages):
    """[(label, B,H,W,Cin,Cout,k,s)] (H,W = INPUT spatial; out = H*s) ->
    per-ConvT fwd/dgrad/wgrad occupancy for both lowerings, as fractions of
    peak over the USEFUL FLOPs 2*B*H*W*k*k*Cin*Cout.

    subpixel (models/layers.py TorchConvTranspose default): the k4/s2
    upsample factors into s^2 sub-kernels of (k/s)^2 taps, evaluated as ONE
    k/s-conv with s^2*Cout output channels on the un-dilated input:
      fwd:   M=B*H*W      N=Cout*s^2   K=Cin*(k/s)^2      (all MACs useful)
      dgrad: M=B*H*W      N=Cin        K=Cout*k*k
      wgrad: M=Cin*(k/s)^2  N=Cout*s^2  K=B*H*W
    lhs_dilation (XLA's native conv_transpose): a k-conv over the s-dilated
    input — fwd/wgrad touch s^2 more MACs than useful (the inserted zeros
    are multiplied, not skipped), so their USEFUL-flop ceiling divides by
    s^2; dgrad of a ConvT is a plain stride-s conv and pays no penalty:
      fwd:   M=B*Ho*Wo   N=Cout  K=Cin*k*k   useful 1/s^2
      dgrad: M=B*H*W     N=Cin   K=Cout*k*k  useful 1
      wgrad: M=Cin*k*k   N=Cout  K=B*Ho*Wo   useful 1/s^2
    k1/s1 (up0) degenerates to the same plain GEMM in both forms.
    """

    def occ(M, N, Kd, useful=1.0):
        mtile = M / (-(-M // 128) * 128)
        return min(N, 128) / 128.0 * min(Kd, 128) / 128.0 * mtile * useful

    out = []
    for (label, B, H, W, cin, cout, k, s) in stages:
        ho, wo = H * s, W * s
        fl = 2.0 * B * H * W * k * k * cin * cout
        ks = max(k // s, 1)
        sub = {
            "fwd": occ(B * H * W, cout * s * s, cin * ks * ks),
            "dgrad": occ(B * H * W, cin, cout * k * k),
            "wgrad": occ(cin * ks * ks, cout * s * s, B * H * W),
        }
        dil = {
            "fwd": occ(B * ho * wo, cout, cin * k * k, 1.0 / (s * s)),
            "dgrad": occ(B * H * W, cin, cout * k * k),
            "wgrad": occ(cin * k * k, cout, B * ho * wo, 1.0 / (s * s)),
        }
        out.append({"label": label, "flops": fl, "sub": sub, "dil": dil})
    return out


class DecoderStage(nn.Module):
    """One decoder up-stage: ConvT (+BN+ReLU unless final), prod shapes."""

    features: int
    kernel: tuple
    strides: tuple
    padding: str
    final: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from shotvae_tpu.models.layers import (BatchNorm, TorchConvTranspose,
                                               relu)

        x = TorchConvTranspose(self.features, self.kernel,
                               strides=self.strides, padding=self.padding,
                               use_bias=False, dtype=self.dtype, name="up")(x)
        if self.final:
            return x
        return relu(BatchNorm(use_running_average=not train,
                              dtype=self.dtype, name="norm")(x))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="wideresnet-28-2")
    p.add_argument("--batch", type=int, default=768)
    p.add_argument("--decoder-stages", action="store_true",
                   help="also time each decoder up-stage individually and "
                        "reconcile against the ConvT ceilings (6 extra "
                        "compiles, ~5 min on the tunnel)")
    args = p.parse_args()
    B = args.batch

    from shotvae_tpu.models.decoder import Decoder
    from shotvae_tpu.models.wideresnet import parse_wideresnet_name

    depth, width = parse_wideresnet_name(args.net)
    n = (depth - 4) // 6
    w1, w2, w3 = 16 * width, 32 * width, 64 * width
    key = jax.random.key(7)
    rows = []

    # conv1: 3->16 @ 32x32 (PreProcess)
    from shotvae_tpu.models.wideresnet import PreProcess

    time_stage("conv1 (3->16 @32)", PreProcess(dtype=jnp.bfloat16),
               (B, 32, 32, 3), key, rows, takes_train=False)
    time_stage(f"block1 ({n}u 16->{w1} @32)",
               StageBlocks(w1, n, 1), (B, 32, 32, 16),
               jax.random.fold_in(key, 2), rows)
    time_stage(f"block2 ({n}u {w1}->{w2} @32->16)",
               StageBlocks(w2, n, 2), (B, 32, 32, w1),
               jax.random.fold_in(key, 3), rows)
    time_stage(f"block3 ({n}u {w2}->{w3} @16->8)",
               StageBlocks(w3, n, 2), (B, 16, 16, w2),
               jax.random.fold_in(key, 4), rows)
    time_stage(f"transition+heads ({w3} @8)", StageHead(),
               (B, 8, 8, w3), jax.random.fold_in(key, 5), rows)
    time_stage("decoder (138 -> 32x32x3)",
               Decoder(num_channel=3, kernel_size=(1, 1), dtype=jnp.bfloat16),
               (B, 1, 1, 138), jax.random.fold_in(key, 6), rows)

    print(f"\n{args.net} B={B} x4 passes — per-stage fwd/bwd "
          f"(scan K={K}, median of 5)")
    hdr = (f"{'stage':28s} {'fwd ms':>7s} {'bwd ms':>7s} {'f+b ms':>7s} "
           f"{'fTF':>6s} {'bTF':>6s} {'fwd TF/s':>8s} {'bwd TF/s':>8s}")
    print(hdr)
    tf_sum = tb_sum = 0.0
    for (name, tf, tb, tfb, ff, fb, rf, rb) in rows:
        tf_sum += tf
        tb_sum += tb
        print(f"{name:28s} {tf:7.2f} {tb:7.2f} {tfb:7.2f} "
              f"{ff:6.2f} {fb:6.2f} {rf:8.1f} {rb:8.1f}")
    print(f"{'SUM (isolated)':28s} {tf_sum:7.2f} {tb_sum:7.2f} "
          f"{tf_sum + tb_sum:7.2f}")

    # analytic ceilings for the production convs (one pass; x4 in the step)
    convs = [("conv1 3x3", B, 32, 32, 3, 16, 3, 1)]
    for i in range(n):
        cin = 16 if i == 0 else w1
        convs.append((f"b1u{i+1}c1 3x3", B, 32, 32, cin, w1, 3, 1))
        convs.append((f"b1u{i+1}c2 3x3", B, 32, 32, w1, w1, 3, 1))
    for i in range(n):
        cin, st, hw = (w1, 2, 32) if i == 0 else (w2, 1, 16)
        convs.append((f"b2u{i+1}c1 3x3", B, hw, hw, cin, w2, 3, st))
        convs.append((f"b2u{i+1}c2 3x3", B, 16, 16, w2, w2, 3, 1))
    for i in range(n):
        cin, st, hw = (w2, 2, 16) if i == 0 else (w3, 1, 8)
        convs.append((f"b3u{i+1}c1 3x3", B, hw, hw, cin, w3, 3, st))
        convs.append((f"b3u{i+1}c2 3x3", B, 8, 8, w3, w3, 3, 1))
    print("\nanalytic MXU occupancy ceilings (TFLOP/s; "
          "lane(N) * depth(K) * mtile(M) model):")
    print(f"{'conv':14s} {'GFLOP':>7s} {'fwd occ':>8s} {'ceil':>6s} "
          f"{'dgrad occ':>9s} {'ceil':>6s} {'wgrad occ':>9s} {'ceil':>6s}")
    ceil_rows = conv_ceilings(convs)
    tot_fl = 0.0
    wsum = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0}
    for r in ceil_rows:
        tot_fl += r["flops"]
        for v in ("fwd", "dgrad", "wgrad"):
            wsum[v] += r["flops"] * r[v][0]
        print(f"{r['label']:14s} {r['flops'] / 1e9:7.2f} "
              f"{r['fwd'][0]:8.2f} {r['fwd'][1]:6.1f} "
              f"{r['dgrad'][0]:9.2f} {r['dgrad'][1]:6.1f} "
              f"{r['wgrad'][0]:9.2f} {r['wgrad'][1]:6.1f}")
    print("FLOP-weighted encoder occupancy: "
          + ", ".join(f"{v}={wsum[v] / tot_fl:.2f} "
                      f"(ceil {PEAK_TFLOPS * wsum[v] / tot_fl:.0f} TF/s)"
                      for v in ("fwd", "dgrad", "wgrad")))

    # per-group time-weighted ceilings vs the measured stage rates above.
    # bwd blended per conv: equal dgrad/wgrad FLOPs -> harmonic mean.
    print("\nper-stage ceiling reconciliation (measured from the table "
          "above; ceilings time-weighted over the group's convs):")
    meas = {r[0].split(" ")[0]: r for r in rows}
    for gname, prefix in (("block1", "b1"), ("block2", "b2"),
                          ("block3", "b3")):
        grp = [r for r in ceil_rows if r["label"].startswith(prefix)]
        fl = sum(r["flops"] for r in grp)
        t_fwd_ceiled = sum(r["flops"] / r["fwd"][1] for r in grp)
        c_fwd = fl / t_fwd_ceiled
        t_bwd_ceiled = sum(r["flops"] / r["dgrad"][1]
                           + r["flops"] / r["wgrad"][1] for r in grp)
        c_bwd = 2 * fl / t_bwd_ceiled
        mrow = next((r for k, r in meas.items() if k.startswith(gname)), None)
        if mrow is None:
            continue
        _, tf_ms, tb_ms, _, ffl, bfl, rf, rb = mrow
        print(f"  {gname}: fwd {rf:6.1f} / ceil {c_fwd:6.1f} TF/s "
              f"({100 * rf / c_fwd:5.1f}%)   "
              f"bwd {rb:6.1f} / ceil {c_bwd:6.1f} TF/s "
              f"({100 * rb / c_bwd:5.1f}%)")

    # ---- decoder ConvT ceilings (VERDICT r3 #4) ----
    # stage list mirrors models/decoder.py for img 32x32 (kernel_size 1x1)
    latent = 128 + 10  # continuous_latent_dim + disc_dim (vae.py:118-124);
    # NOT the scan constant K, which only coincidentally equals 10
    dstages = [("up0 k1 138->1024 @1", B, 1, 1, latent, 1024, 1, 1),
               ("up1 k4s2 1024->512 @1->2", B, 1, 1, 1024, 512, 4, 2),
               ("up2 k4s2 512->256 @2->4", B, 2, 2, 512, 256, 4, 2),
               ("up3 k4s2 256->128 @4->8", B, 4, 4, 256, 128, 4, 2),
               ("up4 k4s2 128->64 @8->16", B, 8, 8, 128, 64, 4, 2),
               ("up5 k4s2 64->3 @16->32", B, 16, 16, 64, 3, 4, 2)]
    drows = convt_ceilings(dstages)
    print("\ndecoder ConvT occupancy ceilings over USEFUL FLOPs "
          "(subpixel form = models/layers.py default; lhs_dilation for "
          "reference):")
    print(f"{'stage':26s} {'GFLOP':>7s} "
          f"{'sub f/d/w occ':>20s} {'dil f/d/w occ':>20s} "
          f"{'sub fwd ceil':>12s} {'sub bwd ceil':>12s}")
    for r in drows:
        sub, dil = r["sub"], r["dil"]
        t_bwd = r["flops"] / (PEAK_TFLOPS * sub["dgrad"]) \
            + r["flops"] / (PEAK_TFLOPS * sub["wgrad"])
        c_bwd = 2 * r["flops"] / t_bwd
        print(f"{r['label']:26s} {r['flops'] / 1e9:7.2f} "
              f"{sub['fwd']:6.2f}/{sub['dgrad']:.2f}/{sub['wgrad']:.2f} "
              f"{dil['fwd']:6.2f}/{dil['dgrad']:.2f}/{dil['wgrad']:.2f} "
              f"{PEAK_TFLOPS * sub['fwd']:11.1f} {c_bwd:11.1f}")
    dfl = sum(r["flops"] for r in drows)
    d_tf = sum(r["flops"] / (PEAK_TFLOPS * r["sub"]["fwd"]) for r in drows)
    d_tb = sum(r["flops"] / (PEAK_TFLOPS * r["sub"]["dgrad"])
               + r["flops"] / (PEAK_TFLOPS * r["sub"]["wgrad"])
               for r in drows)
    dec_c_fwd, dec_c_bwd = dfl / d_tf, 2 * dfl / d_tb
    mrow = next((r for r in rows if r[0].startswith("decoder")), None)
    if mrow is not None:
        _, tf_ms, tb_ms, _, ffl, bfl, rf, rb = mrow
        print(f"  decoder blended: fwd {rf:6.1f} / ceil {dec_c_fwd:6.1f} "
              f"TF/s ({100 * rf / dec_c_fwd:5.1f}%)   "
              f"bwd {rb:6.1f} / ceil {dec_c_bwd:6.1f} TF/s "
              f"({100 * rb / dec_c_bwd:5.1f}%)")

    if args.decoder_stages:
        print("\nper-up-stage decoder timing (x4 passes, scan K=10):")
        srows = []
        time_stage("up0 (138->1024 @1)",
                   DecoderStage(1024, (1, 1), (1, 1), "VALID"),
                   (B, 1, 1, latent), jax.random.fold_in(key, 10), srows)
        time_stage("up1 (1024->512 @1->2)",
                   DecoderStage(512, (4, 4), (2, 2), "SAME"),
                   (B, 1, 1, 1024), jax.random.fold_in(key, 11), srows)
        time_stage("up2 (512->256 @2->4)",
                   DecoderStage(256, (4, 4), (2, 2), "SAME"),
                   (B, 2, 2, 512), jax.random.fold_in(key, 12), srows)
        time_stage("up3 (256->128 @4->8)",
                   DecoderStage(128, (4, 4), (2, 2), "SAME"),
                   (B, 4, 4, 256), jax.random.fold_in(key, 13), srows)
        time_stage("up4 (128->64 @8->16)",
                   DecoderStage(64, (4, 4), (2, 2), "SAME"),
                   (B, 8, 8, 128), jax.random.fold_in(key, 14), srows)
        time_stage("up5 (64->3 @16->32)",
                   DecoderStage(3, (4, 4), (2, 2), "SAME", final=True),
                   (B, 16, 16, 64), jax.random.fold_in(key, 15), srows)
        print(hdr)
        for (name, tf, tb, tfb, ff, fb, rf, rb) in srows:
            print(f"{name:28s} {tf:7.2f} {tb:7.2f} {tfb:7.2f} "
                  f"{ff:6.2f} {fb:6.2f} {rf:8.1f} {rb:8.1f}")
        print("\nper-up-stage ceiling reconciliation (subpixel form):")
        for (name, tf, tb, tfb, ff, fb, rf, rb), r in zip(srows, drows):
            sub = r["sub"]
            t_bwd = r["flops"] / (PEAK_TFLOPS * sub["dgrad"]) \
                + r["flops"] / (PEAK_TFLOPS * sub["wgrad"])
            c_bwd = 2 * r["flops"] / t_bwd
            c_fwd = PEAK_TFLOPS * sub["fwd"]
            print(f"  {name:26s} fwd {rf:6.1f} / ceil {c_fwd:6.1f} TF/s "
                  f"({100 * rf / c_fwd:5.1f}%)   "
                  f"bwd {rb:6.1f} / ceil {c_bwd:6.1f} TF/s "
                  f"({100 * rb / c_bwd:5.1f}%)")


if __name__ == "__main__":
    main()
