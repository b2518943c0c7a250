"""Microbenchmark of augmentation formulations on the real chip (dev tool).

Each arm is timed as K iterations of a ``lax.scan`` inside one jitted
program — the cost that matters is the arm's cost INSIDE a larger compiled
program (the production step), and isolated per-call timing is doubly
misleading here: the tunnel has a multi-ms dispatch floor, and XLA lays
out/fuses a lone gather very differently than one embedded in a training
step (a lone v0 gather measures ~0.06 ms per call; embedded, ~22 ms).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


K_SCAN = 20


def timeit(fn, key, img_u8, n=5):
    """Median per-iteration device time of a K_SCAN-long scan of fn."""
    def scan():
        def body(carry, i):
            out = fn(jax.random.fold_in(key, i), img_u8)
            return carry + jnp.sum(out[:1, :1, :1, :1]), ()
        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_SCAN))[0]
    jitted = jax.jit(scan)
    jax.block_until_ready(jitted())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_SCAN


B, H, W, C, PAD, CROP = 768, 32, 32, 3, 4, 32


def v0_vmap_dynamic_slice(key, img_u8):
    # the ORIGINAL round-1 formulation, inlined: augment_batch no longer
    # uses it (rewritten to select chains in round 2), so the ~22 ms
    # gather baseline stays reproducible here
    from shotvae_tpu.data.pipeline import to_float

    x = to_float(img_u8)
    key_y, key_x, key_f = jax.random.split(key, 3)
    padded = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode="reflect")
    off_y = jax.random.randint(key_y, (B,), 0, H + 2 * PAD - CROP + 1)
    off_x = jax.random.randint(key_x, (B,), 0, W + 2 * PAD - CROP + 1)
    out = jax.vmap(lambda img, oy, ox: jax.lax.dynamic_slice(
        img, (oy, ox, 0), (CROP, CROP, C)))(padded, off_y, off_x)
    do_flip = jax.random.bernoulli(key_f, 0.5, (B, 1, 1, 1))
    return jnp.where(do_flip, out[:, :, ::-1, :], out)


def v4_production(key, img_u8):
    from shotvae_tpu.data.pipeline import augment_batch, to_float

    return augment_batch(key, to_float(img_u8))


def v1_flat_gather(key, img_u8):
    x = img_u8
    key_y, key_x, key_f = jax.random.split(key, 3)
    padded = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode="reflect")
    Hp = H + 2 * PAD
    Wp = W + 2 * PAD
    off_y = jax.random.randint(key_y, (B, 1, 1), 0, Hp - CROP + 1)
    off_x = jax.random.randint(key_x, (B, 1, 1), 0, Wp - CROP + 1)
    flip = jax.random.bernoulli(key_f, 0.5, (B, 1, 1))
    rows = off_y + jnp.arange(CROP)[None, :, None]          # (B, CROP, 1)
    cols_f = jnp.arange(CROP)[None, None, :]
    cols = off_x + jnp.where(flip, CROP - 1 - cols_f, cols_f)  # (B, 1, CROP)
    flat = (rows * Wp + cols).reshape(B, CROP * CROP)       # (B, CROP*CROP)
    src = padded.reshape(B, Hp * Wp, C)
    out = jnp.take_along_axis(src, flat[:, :, None], axis=1)
    return out.reshape(B, CROP, CROP, C).astype(jnp.float32) / 255.0


def v2_two_gathers(key, img_u8):
    x = img_u8
    key_y, key_x, key_f = jax.random.split(key, 3)
    padded = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode="reflect")
    Hp = H + 2 * PAD
    Wp = W + 2 * PAD
    off_y = jax.random.randint(key_y, (B, 1), 0, Hp - CROP + 1)
    off_x = jax.random.randint(key_x, (B, 1), 0, Wp - CROP + 1)
    flip = jax.random.bernoulli(key_f, 0.5, (B, 1))
    rows = off_y + jnp.arange(CROP)[None, :]                # (B, CROP)
    cols_base = jnp.arange(CROP)[None, :]
    cols = off_x + jnp.where(flip, CROP - 1 - cols_base, cols_base)
    h_cut = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    out = jnp.take_along_axis(h_cut, cols[:, None, :, None], axis=2)
    return out.astype(jnp.float32) / 255.0


def v3_onehot_matmul(key, img_u8):
    # crop+flip as two small batched matmuls: selection matrices hit the MXU
    x = img_u8.astype(jnp.bfloat16)
    key_y, key_x, key_f = jax.random.split(key, 3)
    padded = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode="reflect")
    Hp = H + 2 * PAD
    Wp = W + 2 * PAD
    off_y = jax.random.randint(key_y, (B, 1), 0, Hp - CROP + 1)
    off_x = jax.random.randint(key_x, (B, 1), 0, Wp - CROP + 1)
    flip = jax.random.bernoulli(key_f, 0.5, (B, 1))
    rows = off_y + jnp.arange(CROP)[None, :]
    cols_base = jnp.arange(CROP)[None, :]
    cols = off_x + jnp.where(flip, CROP - 1 - cols_base, cols_base)
    sel_r = jax.nn.one_hot(rows, Hp, dtype=jnp.bfloat16)     # (B, CROP, Hp)
    sel_c = jax.nn.one_hot(cols, Wp, dtype=jnp.bfloat16)     # (B, CROP, Wp)
    # (B,CROP,Hp) @ (B,Hp,Wp*C) -> (B,CROP,Wp*C)
    t = jnp.einsum("brh,bhwc->brwc", sel_r, padded)
    out = jnp.einsum("bcw,brwk->brck", sel_c, t)             # -> B,CROP,CROP,C
    return out.astype(jnp.float32) / 255.0


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, H, W, C)), dtype=jnp.uint8)
    key = jax.random.key(0)
    for name, fn in [("v0_vmap_dslice", v0_vmap_dynamic_slice),
                     ("v1_flat_gather", v1_flat_gather),
                     ("v2_two_gathers", v2_two_gathers),
                     ("v3_onehot_matmul", v3_onehot_matmul),
                     ("v4_production_select", v4_production)]:
        jitted = jax.jit(fn)
        dt = timeit(jitted, key, img)
        print(f"{name}: {dt * 1e3:.2f} ms")
        # sanity: values must come from the source value set
        out = np.asarray(jitted(key, img))
        assert out.shape == (B, CROP, CROP, C), out.shape


if __name__ == "__main__":
    main()
