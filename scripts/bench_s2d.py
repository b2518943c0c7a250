"""Space-to-depth A/B for the lane-starved block1 convs (WRN-28-2).

Round-3 backward attribution (scripts/profile_backward.py, docs/PERF.md)
concluded block1 (C=32 @32x32, ~55% of the backward) runs AT its blended
lane/depth ceiling — the cost is intrinsic 32-lane underfill on a 128-lane
MXU. The textbook cure is space-to-depth: fold 2x2 spatial into channels so
the convs run at C=128 with full lanes. The catch, and the reason the lane
model predicts a WASH, is that a stride-1 3x3 conv folded at r=2 needs a
3x3 folded kernel with structural zeros: 4x the FLOPs at 4x the lane
occupancy (every fold position reads 9 of the 36 (tap, input-fold) slots).
A 4-conv 2x2-kernel variant (one conv per output fold position, shifted
padding) gets away with 16/9 = 1.78x FLOPs but its GEMMs are N=32 again —
re-underfilled. This script measures both against the unfolded conv so the
conclusion is empirical, not asserted:

  a) unfolded:  (B, 32, 32, 32) -> (B, 32, 32, 32), 3x3 SAME
  b) s2d-3x3:   (B, 16, 16, 128) -> (B, 16, 16, 128), 3x3 SAME,
                folded weights with structural zeros (4x FLOPs, full lanes)
  c) s2d-2x2x4: four (B, 16, 16, 128) -> (B, 16, 16, 32) convs with 2x2
                kernels and per-fold asymmetric padding (1.78x FLOPs)

All three are bit-comparable (same dot products reorganised; bf16 inputs,
f32 accumulation) — correctness is asserted before timing. Timing per
CLAUDE.md: K scan iterations inside one jit, carry-perturbed, median of 5.

Run: python scripts/bench_s2d.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 20
B, H, W, C, F = 768, 32, 32, 32, 32


def space_to_depth(x, r=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # channel layout: (dy, dx, c) -> (dy*r + dx)*C + c
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def fold_kernel_3x3(wk: np.ndarray, r=2) -> np.ndarray:
    """(3,3,C,F) -> (3,3,4C,4F) folded kernel with structural zeros.

    y_f[i,j,(py*2+px)*F+f] = sum_{u,v,c} x[2i+py+u, 2j+px+v, c] * wk[u+1,v+1,c,f]
    with 2i+py+u = 2(i+s)+d, s = floor((py+u)/2), d = (py+u) mod 2.
    """
    _, _, c, f = wk.shape
    out = np.zeros((3, 3, r * r * c, r * r * f), wk.dtype)
    for py in range(r):
        for px in range(r):
            for u in (-1, 0, 1):
                for v in (-1, 0, 1):
                    sy, dy = (py + u) // 2, (py + u) % 2
                    sx, dx = (px + v) // 2, (px + v) % 2
                    out[sy + 1, sx + 1,
                        (dy * r + dx) * c:(dy * r + dx + 1) * c,
                        (py * r + px) * f:(py * r + px + 1) * f] = \
                        wk[u + 1, v + 1]
    return out


def fold_kernel_2x2(wk: np.ndarray, py: int, px: int, r=2) -> np.ndarray:
    """(3,3,C,F) -> (2,2,4C,F) kernel for output fold position (py, px).

    Fold position (py,px) covers folded rows s_y in {floor((py-1)/2), ...}:
    py=0 -> s in {-1, 0} (pad top 1), py=1 -> s in {0, 1} (pad bottom 1).
    """
    _, _, c, f = wk.shape
    out = np.zeros((2, 2, r * r * c, f), wk.dtype)
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            sy, dy = (py + u) // 2, (py + u) % 2
            sx, dx = (px + v) // 2, (px + v) % 2
            ky = sy + (1 if py == 0 else 0)   # map s to kernel index 0/1
            kx = sx + (1 if px == 0 else 0)
            out[ky, kx, (dy * r + dx) * c:(dy * r + dx + 1) * c] = \
                wk[u + 1, v + 1]
    return out


def conv(x, wk, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, wk.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def scan_time(fn, *args, n=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1e3


def timed_pair(make_loss, x, label, weights=()):
    """Times fwd, fwd+dgrad, and (if `weights` given) fwd+dgrad+wgrad.

    `make_loss(xi)` closes over its weights; `weights` lists the same
    arrays so the full-backward arm can differentiate w.r.t. them too —
    the training step pays dgrad AND wgrad, and wgrad is where the lane
    model says small-C convs starve (its GEMM output is only 9*Cin rows
    x F lanes), so an A/B without it would miss the dominant term.
    """
    # carry in x.dtype: an f32 carry would promote `x + carry` (and the
    # whole conv under timing) to f32 — the training step runs bf16
    def fwd():
        def body(carry, _):
            return (carry + 1e-6 * make_loss(x + carry)).astype(x.dtype), None
        return jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)[0]

    def fb():
        g = jax.grad(lambda xi: make_loss(xi))

        def body(carry, _):
            return (carry + 1e-6 * jnp.sum(
                g(x + carry).astype(jnp.float32))).astype(x.dtype), None
        return jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)[0]

    t_f = scan_time(fwd)
    t_fb = scan_time(fb)
    t_full = None
    if weights:
        def full():
            def loss_all(xi, ws):
                return make_loss(xi, ws)
            g = jax.grad(loss_all, argnums=(0, 1))

            def body(carry, _):
                gx, gws = g(x + carry, weights)
                tot = jnp.sum(gx.astype(jnp.float32))
                for gw in jax.tree_util.tree_leaves(gws):
                    tot = tot + jnp.sum(gw.astype(jnp.float32))
                return (carry + 1e-6 * tot).astype(x.dtype), None
            return jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                length=K)[0]

        t_full = scan_time(full)
    extra = f"  f+d+w {t_full:7.3f}" if t_full is not None else ""
    print(f"  {label:12s} fwd {t_f:7.3f}  f+b {t_fb:7.3f}  "
          f"dgrad {t_fb - t_f:7.3f}{extra} ms")
    return t_f, t_fb, t_full


def main():
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    wk = np.asarray(jax.random.normal(kw, (3, 3, C, F), jnp.float32) * 0.05)

    xf = space_to_depth(x)
    wf3 = jnp.asarray(fold_kernel_3x3(wk))
    wf2 = {(py, px): jnp.asarray(fold_kernel_2x2(wk, py, px))
           for py in range(2) for px in range(2)}
    wk = jnp.asarray(wk)

    # ---- correctness: all three reorganise the same dot products ----
    want = space_to_depth(conv(x, wk))
    got3 = conv(xf, wf3)
    err3 = float(jnp.max(jnp.abs(got3.astype(jnp.float32)
                                 - want.astype(jnp.float32))))

    wf2_tuple = tuple(wf2[(py, px)] for py in range(2) for px in range(2))

    def conv4(xf_, ws=wf2_tuple):
        pads = {0: (1, 0), 1: (0, 1)}
        outs = []
        for (py, px), w_ in zip(((py, px) for py in range(2)
                                 for px in range(2)), ws):
            outs.append(jax.lax.conv_general_dilated(
                xf_, w_.astype(xf_.dtype), (1, 1),
                [pads[py], pads[px]],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)

    got2 = conv4(xf)
    err2 = float(jnp.max(jnp.abs(got2.astype(jnp.float32)
                                 - want.astype(jnp.float32))))
    mag = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
    print(f"correctness: s2d-3x3 max_err {err3:.2e}, s2d-2x2x4 {err2:.2e} "
          f"(mag {mag:.2f})")
    assert err3 / mag < 2e-2 and err2 / mag < 2e-2

    flops = 2 * B * H * W * 9 * C * F
    print(f"\nblock1 conv {B}x{H}x{W}x{C}->{F} (useful {flops/1e9:.1f} "
          f"GFLOP; s2d-3x3 computes 4x that, s2d-2x2x4 1.78x)")

    def loss_unfolded(xi, ws=(wk,)):
        return jnp.sum(jnp.square(conv(xi, ws[0]).astype(jnp.float32)))

    def loss_s2d3(xi, ws=(wf3,)):
        return jnp.sum(jnp.square(conv(space_to_depth(xi),
                                       ws[0]).astype(jnp.float32)))

    def loss_s2d2(xi, ws=wf2_tuple):
        return jnp.sum(jnp.square(conv4(space_to_depth(xi), ws)
                                  .astype(jnp.float32)))

    # folded arms include the fold itself (integration would pay it once
    # per block, not per conv — so also time the pre-folded input arms)
    def loss_s2d3_prefolded(xi, ws=(wf3,)):
        return jnp.sum(jnp.square(conv(xi, ws[0]).astype(jnp.float32)))

    def loss_s2d2_prefolded(xi, ws=wf2_tuple):
        return jnp.sum(jnp.square(conv4(xi, ws).astype(jnp.float32)))

    timed_pair(loss_unfolded, x, "unfolded", weights=(wk,))
    timed_pair(loss_s2d3, x, "s2d-3x3", weights=(wf3,))
    timed_pair(loss_s2d2, x, "s2d-2x2x4", weights=wf2_tuple)
    timed_pair(loss_s2d3_prefolded, xf, "s2d-3x3-pre", weights=(wf3,))
    timed_pair(loss_s2d2_prefolded, xf, "s2d-2x2x4-pre",
               weights=wf2_tuple)


if __name__ == "__main__":
    main()
