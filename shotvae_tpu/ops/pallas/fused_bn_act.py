"""Fused training-mode BatchNorm + LeakyReLU as Pallas TPU kernels.

The conv+BN+activation epilogue is the hot elementwise chain of every
encoder block (shot_vae_model/wideresnet.py:23-49 etc.). This implements it
as two single-pass kernels per direction:

  forward:  [stats reduce over rows]  ->  [normalize + affine + leaky]
  backward: [grad reduce (sum g', sum g'*xhat)] -> [dx apply]

with a ``jax.custom_vjp`` so it drops into any flax module. Input layout is
``(M, C)`` — callers reshape NHWC activations to (N*H*W, C); C rides the
128-lane axis, M tiles over sublanes. All accumulation in float32.

The matching jnp reference (``bn_leaky_train_reference``) defines the exact
semantics and backs the tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_SLOPE = 0.01  # torch LeakyReLU default


def _tile_rows(c: int) -> int:
    """Row-tile size bounded so each (TM, C) f32 buffer stays ~<=1.5 MB —
    several live buffers + double buffering must fit 16 MB VMEM."""
    tm = (1_500_000 // (4 * c)) // 8 * 8
    return max(8, min(1024, tm))


def _fold_factor(c: int) -> int:
    """Lane-packing factor: narrow channel counts waste the 128-lane VPU
    (C=32 uses 1/4 of every vector op). Fold k row-groups into the lane axis
    so the kernels see C' = k*C >= 128; per-channel stats are recovered by
    summing the k lane groups on the host side (exact)."""
    if c >= 128:
        return 1
    return max(1, 128 // c)


def _fold(x, k):
    """(M, C) -> (M/k, k*C), padding M to a multiple of k with zero rows."""
    m, c = x.shape
    pad = (-m) % k
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape((m + pad) // k, k * c)


def _unfold(x_folded, m, c, k):
    return x_folded.reshape(-1, c)[:m]


def _pad_rows(x, tm):
    m = x.shape[0]
    pad = (-m) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


# --------------------------- forward kernels ---------------------------


def _stats_kernel(x_ref, out_ref):
    """Accumulate per-channel sum and sum-of-squares across row tiles."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:].astype(jnp.float32)
    out_ref[0, :] += jnp.sum(x, axis=0)
    out_ref[1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(slope, x_ref, mean_ref, invstd_ref, gamma_ref, beta_ref,
                  y_ref, xhat_ref):
    x = x_ref[:].astype(jnp.float32)
    xhat = (x - mean_ref[0, :]) * invstd_ref[0, :]
    y = xhat * gamma_ref[0, :] + beta_ref[0, :]
    y_ref[:] = jnp.where(y >= 0, y, slope * y).astype(y_ref.dtype)
    xhat_ref[:] = xhat.astype(xhat_ref.dtype)


# --------------------------- backward kernels ---------------------------


def _bwd_reduce_kernel(slope, g_ref, xhat_ref, gamma_ref, beta_ref, out_ref):
    """Accumulate sum(g') and sum(g' * xhat), g' = grad through leaky."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xhat = xhat_ref[:].astype(jnp.float32)
    pre = xhat * gamma_ref[0, :] + beta_ref[0, :]
    gp = g_ref[:].astype(jnp.float32) * jnp.where(pre >= 0, 1.0, slope)
    out_ref[0, :] += jnp.sum(gp, axis=0)
    out_ref[1, :] += jnp.sum(gp * xhat, axis=0)


def _bwd_apply_kernel(slope, inv_m, g_ref, xhat_ref, gamma_ref, beta_ref,
                      invstd_ref, sums_ref, dx_ref):
    xhat = xhat_ref[:].astype(jnp.float32)
    pre = xhat * gamma_ref[0, :] + beta_ref[0, :]
    gp = g_ref[:].astype(jnp.float32) * jnp.where(pre >= 0, 1.0, slope)
    sum_gp = sums_ref[0, :]
    sum_gpx = sums_ref[1, :]
    dx = (gamma_ref[0, :] * invstd_ref[0, :]) * (
        gp - inv_m * (sum_gp + xhat * sum_gpx))
    dx_ref[:] = dx.astype(dx_ref.dtype)


# --------------------------- host-side wrappers ---------------------------


def _row_tiles(m_padded, tm):
    return (m_padded // tm,)


def _tile_spec(c, tm):
    return pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(rows, c):
    return pl.BlockSpec((rows, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _stats(x_padded, tm):
    m_pad, c = x_padded.shape
    return pl.pallas_call(
        _stats_kernel,
        grid=_row_tiles(m_pad, tm),
        in_specs=[_tile_spec(c, tm)],
        out_specs=_full_spec(2, c),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
    )(x_padded)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_leaky_train(x, gamma, beta, eps: float = 1e-5,
                   slope: float = DEFAULT_SLOPE):
    """y = leaky_relu(gamma * (x - mean) / sqrt(var + eps) + beta).

    x: (M, C); mean/var are biased batch statistics over M (torch BN
    semantics for normalisation). Returns (y, mean, var) — mean/var feed the
    running-stat update in the caller.
    """
    y, mean, var, _, _ = _fwd_impl(x, gamma, beta, eps, slope)
    return y, mean, var


def _fwd_impl(x, gamma, beta, eps, slope):
    m, c = x.shape
    k = _fold_factor(c)
    cf = k * c
    xf = _fold(x, k)
    tm = _tile_rows(cf)
    x_padded, _ = _pad_rows(xf, tm)
    sums_f = _stats(x_padded, tm)                     # (2, k*c)
    sums = sums_f.reshape(2, k, c).sum(axis=1)        # exact group combine
    mean = sums[0] / m                                # zero padding adds 0
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    tile = lambda v: jnp.tile(v.astype(jnp.float32), k)[None]  # (1, k*c)
    m_pad = x_padded.shape[0]
    y_padded, xhat_padded = pl.pallas_call(
        partial(_apply_kernel, slope),
        grid=_row_tiles(m_pad, tm),
        in_specs=[_tile_spec(cf, tm), _full_spec(1, cf), _full_spec(1, cf),
                  _full_spec(1, cf), _full_spec(1, cf)],
        out_specs=(_tile_spec(cf, tm), _tile_spec(cf, tm)),
        out_shape=(jax.ShapeDtypeStruct((m_pad, cf), x.dtype),
                   jax.ShapeDtypeStruct((m_pad, cf), jnp.float32)),
    )(x_padded, tile(mean), tile(invstd), tile(gamma), tile(beta))
    return _unfold(y_padded, m, c, k), mean, var, xhat_padded, invstd


def _bn_fwd(x, gamma, beta, eps, slope):
    y, mean, var, xhat_padded, invstd = _fwd_impl(x, gamma, beta, eps, slope)
    residuals = (xhat_padded, invstd, gamma.astype(jnp.float32),
                 beta.astype(jnp.float32))
    return (y, mean, var), residuals


def _bn_bwd(eps, slope, residuals, cotangents):
    g, _g_mean, _g_var = cotangents  # mean/var outputs feed running stats
    xhat_padded, invstd, gamma, beta = residuals
    x_dtype = g.dtype
    m, c = g.shape
    k = _fold_factor(c)
    cf = k * c
    tm = _tile_rows(cf)
    g_padded, _ = _pad_rows(_fold(g.astype(jnp.float32), k), tm)
    m_pad = g_padded.shape[0]
    tile = lambda v: jnp.tile(v.astype(jnp.float32), k)[None]
    sums_f = pl.pallas_call(
        partial(_bwd_reduce_kernel, slope),
        grid=_row_tiles(m_pad, tm),
        in_specs=[_tile_spec(cf, tm), _tile_spec(cf, tm), _full_spec(1, cf),
                  _full_spec(1, cf)],
        out_specs=_full_spec(2, cf),
        out_shape=jax.ShapeDtypeStruct((2, cf), jnp.float32),
    )(g_padded, xhat_padded, tile(gamma), tile(beta))
    sums = sums_f.reshape(2, k, c).sum(axis=1)
    dgamma = sums[1]
    dbeta = sums[0]
    dx_padded = pl.pallas_call(
        partial(_bwd_apply_kernel, slope, 1.0 / m),
        grid=_row_tiles(m_pad, tm),
        in_specs=[_tile_spec(cf, tm), _tile_spec(cf, tm), _full_spec(1, cf),
                  _full_spec(1, cf), _full_spec(1, cf), _full_spec(2, cf)],
        out_specs=_tile_spec(cf, tm),
        out_shape=jax.ShapeDtypeStruct((m_pad, cf), x_dtype),
    )(g_padded, xhat_padded, tile(gamma), tile(beta), tile(invstd),
      jnp.tile(sums, (1, k)))
    return _unfold(dx_padded, m, c, k), dgamma, dbeta


bn_leaky_train.defvjp(_bn_fwd, _bn_bwd)


def bn_leaky_train_reference(x, gamma, beta, eps: float = 1e-5,
                             slope: float = DEFAULT_SLOPE):
    """jnp reference semantics for tests."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=0)
    var = jnp.mean(x32 * x32, axis=0) - mean * mean
    var = jnp.maximum(var, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    y = jnp.where(y >= 0, y, slope * y)
    return y.astype(x.dtype), mean, var


def _inference_kernel(slope, x_ref, scale_ref, shift_ref, y_ref):
    y = x_ref[:].astype(jnp.float32) * scale_ref[0, :] + shift_ref[0, :]
    y_ref[:] = jnp.where(y >= 0, y, slope * y).astype(y_ref.dtype)


def bn_act_inference(x, gamma, beta, running_mean, running_var,
                     eps: float = 1e-5, slope: float = DEFAULT_SLOPE):
    """Eval-mode BN + LeakyReLU folded to one scale/shift pass. x: (M, C)."""
    invstd = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    scale = (gamma * invstd).astype(jnp.float32)
    shift = (beta - running_mean * gamma * invstd).astype(jnp.float32)
    m, c = x.shape
    k = _fold_factor(c)
    cf = k * c
    tm = _tile_rows(cf)
    x_padded, _ = _pad_rows(_fold(x, k), tm)
    m_pad = x_padded.shape[0]
    y = pl.pallas_call(
        partial(_inference_kernel, slope),
        grid=_row_tiles(m_pad, tm),
        in_specs=[_tile_spec(cf, tm), _full_spec(1, cf), _full_spec(1, cf)],
        out_specs=_tile_spec(cf, tm),
        out_shape=jax.ShapeDtypeStruct((m_pad, cf), x.dtype),
    )(x_padded, jnp.tile(scale, k)[None], jnp.tile(shift, k)[None])
    return _unfold(y, m, c, k)
