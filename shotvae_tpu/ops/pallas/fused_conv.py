"""Pallas fused BN-affine + LeakyReLU + 3x3 conv block (the north-star kernel).

Targets the WRN unit's BN -> LeakyReLU -> conv3x3 chain
(/root/reference/shot_vae_model/wideresnet.py:23-49). XLA materialises the
normalised/activated tensor between the elementwise chain and the conv
(convs are fusion barriers on TPU), costing one full write + read of the
feature map per conv site; round-3 profiling (scripts/profile_backward.py)
shows the C=128 8x8 stage running at ~37% of its lane-bound ceiling largely
for this reason. This kernel computes

    y = conv3x3_SAME(leaky_relu(x * scale + shift), w)

in ONE pass: the affine+activation happens on tiles already staged in VMEM
for the conv, never touching HBM.

Design (implicit GEMM, shifted-window formulation):
  * the batch is tiled; each grid step stages a (TB*H*W, C) row-block of x
    in VMEM, applies the affine+LeakyReLU (f32 math, stored back at the
    compute dtype) into a zero-padded flat scratch,
  * each of the 9 taps is a contiguous (M, C) slice of that scratch at row
    offset dy*W + dx, masked for image/row borders (a flat shift crosses
    row and image boundaries exactly where the conv pads with zeros),
  * 9 MXU matmuls (M, C) @ (C, Cout) accumulate in f32.
  All tensors are kept 2-D (rows, channels) so VMEM tiling is dense
  (a (B, 8, 8, C) layout would waste half the sublanes at bf16).

The BatchNorm *statistics* stay outside (tiny reductions XLA handles well):
callers pass the per-channel affine ``scale = gamma / sqrt(var + eps)`` and
``shift = beta - mean * scale``, which covers train mode (batch stats) and
eval mode (running stats) alike.

Backward is delegated to XLA via ``jax.vjp`` of the reference composition —
dgrad/wgrad convs lower to the same MXU convolutions XLA uses natively, and
the activation is recomputed from ``x`` (remat: trades one elementwise pass
for not saving the activated tensor).

Opt-in, like every Pallas kernel in this package — and on the production
shapes it DOES NOT win: scan-measured at stage level (4 WRN units,
768x8x8x128, real BN-stat math in the chain, scripts/bench_fused_conv.py)
XLA runs ~1.3x faster fwd and fwd+bwd (2.46 vs 3.16 ms fwd / 3.92 vs
4.93 ms f+b, re-measured after a review fix removed an always-allocated
im2col scratch that had halved the batch tile — full tile, same verdict;
a single K=9C GEMM staged through the im2col scratch is slower still:
the scratch round-trip exceeds the deeper-K gain). Single-conv A/B is
parity at C=128. The honest conclusion recorded in docs/PERF.md: the
block3 gap vs the analytic lane ceiling reproduces in a from-scratch
implicit-GEMM, i.e. the ceiling model overestimates what is achievable
at 8x8 spatial; XLA's conv is within ~30% of a hand kernel and the XLA
path remains the default everywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default (wideresnet.py:27)


def _pick_tile(batch: int, rows_per_image: int, cin: int, cout: int,
               itemsize: int, vmem_budget: int = 10 * 1024 * 1024,
               concat_k: bool = False) -> int:
    """Largest batch tile dividing the batch whose working set fits VMEM.

    Working set per grid step: x block + padded scratch (itemsize each),
    f32 accumulator, plus the resident (9*Cin, Cout) weight block and —
    only under ``concat_k`` — the (M, 9*Cin) im2col staging buffer; capped
    at 4096 rows to keep the M-tiling MXU-friendly.
    """
    weights = 9 * cin * cout * itemsize
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb:
            continue
        m = tb * rows_per_image
        if m > 4096:
            break
        use = (weights + m * cin * itemsize * 2
               + (m * 9 * cin * itemsize if concat_k else 0)
               + m * cout * (4 + itemsize))
        if use <= vmem_budget:
            best = tb
    if best == 0:
        # even a 1-image tile overflows VMEM (huge Cin/Cout) — fail with a
        # clear error here rather than an opaque Mosaic compile failure;
        # callers should use the XLA path (reference_bn_act_conv) instead
        raise ValueError(
            f"fused conv working set exceeds the {vmem_budget} B VMEM "
            f"budget even at batch tile 1 (cin={cin}, cout={cout}, "
            f"rows/img={rows_per_image}); use the XLA reference path")
    return best


def _kernel(x_ref, ab_ref, w_ref, out_ref, scr_ref, *maybe_im2col,
            tb: int, h: int,
            w: int, cin: int, cout: int, slope: float,
            concat_k: bool = False):
    # the (M, 9*Cin) im2col scratch exists only under concat_k — allocating
    # it unconditionally would halve the achievable batch tile for the
    # default 9-dot path (round-3 review finding)
    im2col_ref = maybe_im2col[0] if concat_k else None
    m = tb * h * w
    pad = w + 1
    scale = ab_ref[0, :].astype(jnp.float32)
    shift = ab_ref[1, :].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    pre = x * scale[None, :] + shift[None, :]
    act = jnp.where(pre > 0, pre, slope * pre).astype(scr_ref.dtype)
    # zero-padded flat staging: pad rows of zeros at both ends absorb the
    # out-of-range tap offsets; border wrap-around is masked below
    scr_ref[pl.ds(0, pad), :] = jnp.zeros((pad, cin), scr_ref.dtype)
    scr_ref[pl.ds(pad, m), :] = act
    scr_ref[pl.ds(pad + m, pad), :] = jnp.zeros((pad, cin), scr_ref.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    yy = (row // w) % h
    xx = row % w
    if concat_k:
        # one (M, 9C) @ (9C, Cout) GEMM: deeper K streams the MXU better
        # than 9 accumulating (M, C) dots. The im2col block is staged
        # through a scratch ref because Mosaic cannot concatenate vectors
        # whose sublane offsets differ (the 9 windows sit at offsets
        # -W-1..W+1); ref writes realign each window.
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * w + (dx - 1)
                win = scr_ref[pl.ds(pad + off, m), :]
                valid = ((yy + dy - 1 >= 0) & (yy + dy - 1 < h)
                         & (xx + dx - 1 >= 0) & (xx + dx - 1 < w))
                t = dy * 3 + dx
                im2col_ref[:, t * cin:(t + 1) * cin] = jnp.where(
                    valid, win, jnp.zeros_like(win))
        acc = jnp.dot(im2col_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((m, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * w + (dx - 1)
                win = scr_ref[pl.ds(pad + off, m), :]
                valid = ((yy + dy - 1 >= 0) & (yy + dy - 1 < h)
                         & (xx + dx - 1 >= 0) & (xx + dx - 1 < w))
                win = jnp.where(valid, win, jnp.zeros_like(win))
                t = dy * 3 + dx
                acc = acc + jnp.dot(win, w_ref[pl.ds(t * cin, cin), :],
                                    preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _fwd_pallas(x, scale, shift, w, *, slope: float,
                concat_k: bool = False):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    tb = _pick_tile(b, h * ww, cin, cout, x.dtype.itemsize,
                    concat_k=concat_k)
    m = tb * h * ww
    x2 = x.reshape(b * h * ww, cin)
    ab = jnp.stack([scale.astype(jnp.float32),
                    shift.astype(jnp.float32)])           # (2, C)
    w2 = w.astype(x.dtype).reshape(9 * cin, cout)
    kern = functools.partial(_kernel, tb=tb, h=h, w=ww, cin=cin, cout=cout,
                             slope=slope, concat_k=concat_k)
    out = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((m, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * ww, cout), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((m + 2 * (ww + 1), cin), x.dtype)]
            + ([pltpu.VMEM((m, 9 * cin), x.dtype)] if concat_k else [])),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ww * cout * cin * 9,
            bytes_accessed=(x2.size + 9 * cin * cout
                            + b * h * ww * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, ab, w2)
    return out.reshape(b, h, ww, cout)


def _reference_composition(x, scale, shift, w, *, slope: float):
    """The XLA arm: exactly what the fused kernel computes, as plain ops."""
    pre = x.astype(jnp.float32) * scale + shift
    act = jnp.where(pre > 0, pre, slope * pre).astype(x.dtype)
    return lax.conv_general_dilated(
        act, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(x, scale, shift, w, slope):
    return _fwd_pallas(x, scale, shift, w, slope=slope)


def _fused_fwd(x, scale, shift, w, slope):
    return _fwd_pallas(x, scale, shift, w, slope=slope), (x, scale, shift, w)


def _fused_bwd(slope, res, dy):
    x, scale, shift, w = res
    # XLA backward of the reference composition: identical math, the
    # dgrad/wgrad convs XLA would emit for the unfused path, activation
    # recomputed from x (never saved)
    _, vjp = jax.vjp(
        lambda x_, s_, b_, w_: _reference_composition(x_, s_, b_, w_,
                                                      slope=slope),
        x, scale, shift, w)
    return vjp(dy)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_bn_act_conv(x, scale, shift, w, *,
                      slope: float = LEAKY_SLOPE) -> jax.Array:
    """``conv3x3_SAME(leaky_relu(x * scale + shift), w)`` in one VMEM pass.

    x: (B, H, W, Cin); scale/shift: (Cin,) f32 per-channel affine (fold BN
    batch or running statistics into these); w: (3, 3, Cin, Cout).
    Forward is the Pallas kernel; backward is XLA's (custom VJP).
    """
    if x.ndim != 4 or w.shape[:2] != (3, 3) or w.shape[2] != x.shape[-1]:
        raise ValueError(f"expected NHWC x and (3,3,Cin,Cout) w, got "
                         f"{x.shape} / {w.shape}")
    return _fused(x, scale, shift, w, slope)


def bn_affine_from_stats(mean, var, gamma, beta,
                         eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold BatchNorm statistics + learned affine into (scale, shift)."""
    scale = gamma * lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def reference_bn_act_conv(x, scale, shift, w,
                          *, slope: float = LEAKY_SLOPE) -> jax.Array:
    """The unfused XLA composition (benchmark/test arm)."""
    return _reference_composition(x, scale, shift, w, slope=slope)
