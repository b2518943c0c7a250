"""Pin real multi-chip parallelization by inspecting the compiled HLO.

A replicated (non-parallel) program would show full-batch parameter shapes
and no cross-device collectives. The GSPMD-partitioned SHOT-VAE step must
instead show (a) per-device entry shapes of B/num_devices for every batch
argument and (b) all-reduces spanning the full 8-device group. With the
default sync-BN design the all-reduce set is: one per BatchNorm layer per
forward (global-batch statistics) + the gradient reductions (XLA fuses
those per-parameter-group); the global-batch mixup/label-smoothing
permutations additionally emit all-gathers. The per-replica-BN shard_map
variant (parallel/mesh.py) reduces collectives to the single gradient
pmean — covered by its own test.
"""

import re

import jax
import jax.numpy as jnp
import pytest

GLOBAL_BATCH = 16
N_DEV = 8


@pytest.fixture(scope="module")
def compiled_text():
    from shotvae_tpu.models import VariationalAutoEncoder
    from shotvae_tpu.parallel import DataParallel, make_mesh
    from shotvae_tpu.train import steps as steps_lib
    from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

    dp = DataParallel(make_mesh(N_DEV))
    model = VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(0),
                            jnp.zeros((2, 32, 32, 3)))
    state = dp.replicate(TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=bs,
        tx=sgd_torch(0.1)))
    step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)
    key = jax.random.key(42)
    img = jax.random.randint(key, (GLOBAL_BATCH, 32, 32, 3), 0, 256,
                             dtype=jnp.int32).astype(jnp.uint8)
    lab = jax.random.randint(jax.random.fold_in(key, 1), (GLOBAL_BATCH,),
                             0, 10)
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
        pwm=1.0, ucw=1.0).items()}
    img_s = jax.device_put(img, dp.batch_sharding(4))
    lab_s = jax.device_put(lab, dp.batch_sharding(1))
    compiled = jax.jit(step).lower(
        state, img_s, lab_s, img_s, lab_s, sched,
        jax.random.fold_in(key, 2)).compile()
    return compiled.as_text()


def test_batch_inputs_are_sharded_one_eighth_per_device(compiled_text):
    local = GLOBAL_BATCH // N_DEV
    for name in ("img_l", "img_u"):
        lines = [l for l in compiled_text.splitlines()
                 if f'op_name="{name}"' in l and "parameter(" in l]
        assert lines, f"no entry parameter found for {name}"
        for l in lines:
            # per-device (local) shape, not the global batch
            assert f"u8[{local},32,32,3]" in l, l
            assert f"sharding={{devices=[{N_DEV},1,1,1]" in l, l
    for name in ("lab_l", "lab_u"):
        lines = [l for l in compiled_text.splitlines()
                 if f'op_name="{name}"' in l and "parameter(" in l]
        assert lines, f"no entry parameter found for {name}"
        for l in lines:
            assert f"s32[{local}]" in l, l
            assert f"sharding={{devices=[{N_DEV}]" in l, l


def test_all_reduces_span_the_full_device_group(compiled_text):
    ar_lines = [l for l in compiled_text.splitlines()
                if re.search(r"all-reduce(-start)?\(", l)]
    assert len(ar_lines) >= 1, "no cross-device all-reduce: replicated, not DP"
    full_group = f"replica_groups=[1,{N_DEV}]<=[{N_DEV}]"
    for l in ar_lines:
        assert full_group in l, f"partial-group all-reduce: {l.strip()[:160]}"


def test_gradient_reduction_covers_every_param_width(compiled_text):
    # the widest conv kernel gradient of wideresnet-10-1 (64ch 3x3) must be
    # all-reduced: look for a reduced f32 operand of >= 64*64*9 elements
    import math

    ar_lines = [l for l in compiled_text.splitlines()
                if re.search(r"all-reduce(-start)?\(", l)]
    sizes = [math.prod(int(d) for d in m.split(","))
             for l in ar_lines for m in re.findall(r"f32\[([\d,]+)\]", l)]
    assert sizes and max(sizes) >= 64 * 64 * 9, (
        "no large gradient all-reduce found — grads may not be synced")
