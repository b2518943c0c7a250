"""Scan-timed A/B of the Pallas fused BN+LeakyReLU+conv3x3 vs XLA.

Production shapes from the WRN-28-2/28-10 SHOT-VAE step (B=768 per stream):
block3 C=128 @8x8 (the stage measured at ~37% of its lane ceiling, the
kernel's target), block2 C=64 @16x16, block1 C=32 @32x32 (lane-starved:
expected XLA parity — the ceiling is the lanes, not the fusion), and the
28-10 widths. Timing discipline per CLAUDE.md: K iterations of a lax.scan
inside ONE jit, carry-perturbed inputs, full-output consumption; fwd and
fwd+bwd variants (bwd = difference).

Run: python scripts/bench_fused_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shotvae_tpu.ops.pallas.fused_conv import (bn_affine_from_stats,
                                               fused_bn_act_conv,
                                               reference_bn_act_conv)

K = 20
SHAPES = [
    # (label, B, H, W, Cin, Cout)
    ("block3 28-2 (768,8,8,128->128)", 768, 8, 8, 128, 128),
    ("block2 28-2 (768,16,16,64->64)", 768, 16, 16, 64, 64),
    ("block1 28-2 (768,32,32,32->32)", 768, 32, 32, 32, 32),
    ("block3 28-10 (768,8,8,640->640)", 768, 8, 8, 640, 640),
]


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
    return float(np.median(ts)) / K * 1e3  # ms per iteration


def main():
    key = jax.random.key(0)
    print(f"fused conv A/B (scan K={K}, median of 5) — ms per call")
    print(f"{'shape':36s} {'impl':7s} {'fwd':>7s} {'f+b':>7s} {'bwd':>7s}")
    for label, b, h, w_, cin, cout in SHAPES:
        kx, ks, kb, kw = jax.random.split(jax.random.fold_in(key, cin), 4)
        x = jax.random.normal(kx, (b, h, w_, cin), jnp.bfloat16)
        scale = jax.random.uniform(ks, (cin,), jnp.float32, 0.5, 1.5)
        shift = jax.random.normal(kb, (cin,), jnp.float32) * 0.1
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.05

        # numerics check
        got = fused_bn_act_conv(x, scale, shift, w)
        want = reference_bn_act_conv(x, scale, shift, w)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        ref_mag = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
        assert err / ref_mag < 2e-2, (label, err, ref_mag)

        for name, fn in (("pallas", fused_bn_act_conv),
                         ("xla", reference_bn_act_conv)):
            def loss(xi):
                out = fn(xi, scale, shift, w)
                return jnp.sum(jnp.square(out.astype(jnp.float32)))

            def fwd_scan():
                def body(c, i):
                    v = loss(x + c)
                    return (v * 1e-20).astype(x.dtype), ()
                return jax.lax.scan(body, jnp.zeros((), x.dtype),
                                    jnp.arange(K))[0]

            g = jax.grad(loss)

            def bwd_scan():
                def body(c, i):
                    gx = g(x + c)
                    return (jnp.sum(gx.astype(jnp.float32))
                            * 1e-20).astype(x.dtype), ()
                return jax.lax.scan(body, jnp.zeros((), x.dtype),
                                    jnp.arange(K))[0]

            tf = scan_time(fwd_scan)
            tfb = scan_time(bwd_scan)
            print(f"{label:36s} {name:7s} {tf:7.3f} {tfb:7.3f} "
                  f"{tfb - tf:7.3f}")


if __name__ == "__main__":
    import sys as _sys
    if "--stage-only" not in _sys.argv:
        main()


# ---------------------------------------------------------------------------
# stage-level A/B: 4 WRN units (block3 shape) with REAL BatchNorm-stat math
# in the chain — the integration-level comparison (the single-conv A/B above
# gives XLA a precomputed affine, which hides the stat/normalize traffic the
# fused kernel is designed to absorb).
# ---------------------------------------------------------------------------


def _unit_params(key, cin, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = {
        "g1": jnp.ones((cin,), dtype), "b1": jnp.zeros((cin,), dtype),
        "k1": jax.random.normal(ks[0], (3, 3, cin, cout), dtype) * 0.05,
        "g2": jnp.ones((cout,), dtype), "b2": jnp.zeros((cout,), dtype),
        "k2": jax.random.normal(ks[1], (3, 3, cout, cout), dtype) * 0.05,
    }
    if cin != cout:
        p["gs"] = jnp.ones((cin,), dtype)
        p["bs"] = jnp.zeros((cin,), dtype)
        p["ks"] = jax.random.normal(ks[2], (1, 1, cin, cout), dtype) * 0.1
    return p


def _bn_affine(x, gamma, beta):
    # batch-stat reduction stays here; the fold math comes from the kernel
    # module so the A/B always measures exactly what the kernel implements
    m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
    v = jnp.var(x.astype(jnp.float32), axis=(0, 1, 2))
    return bn_affine_from_stats(m, v, gamma, beta)


def _stage_forward(params, x, site):
    """4 stride-1 units, identity shortcuts (block3 units 2-4 pattern).

    ``site(x, scale, shift, w)`` implements BN-affine+LeakyReLU+conv3x3 —
    the fused kernel or the XLA composition; everything else identical.
    """
    for p in params:
        s1, t1 = _bn_affine(x, p["g1"], p["b1"])
        h = site(x, s1, t1, p["k1"])
        s2, t2 = _bn_affine(h, p["g2"], p["b2"])
        h = site(h, s2, t2, p["k2"])
        x = x + h
    return x


def stage_ab():
    b, hw, c = 768, 8, 128
    key = jax.random.key(42)
    x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
    params = [_unit_params(jax.random.fold_in(key, i), c, c)
              for i in range(4)]

    got = _stage_forward(params, x, fused_bn_act_conv)
    want = _stage_forward(params, x, reference_bn_act_conv)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    mag = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
    assert err / mag < 2e-2, (err, mag)

    print(f"\nstage-level A/B: 4 units (768,{hw},{hw},{c}), real BN stats "
          f"(scan K={K})")
    for name, site in (("pallas", fused_bn_act_conv),
                       ("xla", reference_bn_act_conv)):
        def loss(xi, ps):
            out = _stage_forward(ps, xi, site)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        def fwd_scan():
            def body(carry, i):
                v = loss(x + carry, params)
                return (v * 1e-20).astype(x.dtype), ()
            return jax.lax.scan(body, jnp.zeros((), x.dtype),
                                jnp.arange(K))[0]

        g = jax.grad(loss, argnums=(0, 1))

        def bwd_scan():
            def body(carry, i):
                gx, gp = g(x + carry, params)
                tot = jnp.sum(gx.astype(jnp.float32)) + sum(
                    jnp.sum(t.astype(jnp.float32))
                    for t in jax.tree_util.tree_leaves(gp))
                return (tot * 1e-20).astype(x.dtype), ()
            return jax.lax.scan(body, jnp.zeros((), x.dtype),
                                jnp.arange(K))[0]

        tf = scan_time(fwd_scan)
        tfb = scan_time(bwd_scan)
        print(f"  {name:7s} fwd {tf:7.3f}  f+b {tfb:7.3f}  "
              f"bwd {tfb - tf:7.3f} ms")


if __name__ == "__main__":
    stage_ab()
