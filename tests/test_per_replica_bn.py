"""Per-replica BatchNorm (DataParallel-faithful) shard_map step tests.

``nn.DataParallel`` never syncs BN: each replica normalises with local-batch
statistics and the surviving running stats are replica 0's (SURVEY.md §2.6).
These tests pin that the shard_map mode reproduces exactly that on the
8-virtual-device mesh, and that it differs from the default sync-BN GSPMD
mode.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shotvae_tpu.models import VariationalAutoEncoder
from shotvae_tpu.parallel import DataParallel, make_mesh
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

N_DEV = 8
LOCAL = 2
B = LOCAL * N_DEV


def _setup():
    dp = DataParallel(make_mesh(N_DEV))
    model = VariationalAutoEncoder(
        encoder_name="wideresnet-10-1", num_input_channels=3,
        continuous_latent_dim=8, disc_latent_dim=10)
    params, bs = init_model(model, jax.random.key(0),
                            jnp.zeros((2, 32, 32, 3)))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=bs, tx=sgd_torch(0.1))
    key = jax.random.key(3)
    img = np.asarray(jax.random.randint(key, (B, 32, 32, 3), 0, 256,
                                        dtype=jnp.int32), dtype=np.uint8)
    lab = np.asarray(jax.random.randint(jax.random.fold_in(key, 1), (B,),
                                        0, 10), dtype=np.int32)
    sched = {k: jnp.float32(v) for k, v in dict(
        cmi=0.0, dmi=2.3, ew=1e-3, kl_beta_c=1e-3, kl_beta_d=1e-3,
        pwm=1.0, ucw=1.0).items()}
    return dp, model, state, img, lab, sched


@pytest.fixture(scope="module")
def run_all():
    """One shard_map step + the matching local replica-0 step + sync-BN."""
    dp, model, state, img, lab, sched = _setup()
    step_key = jax.random.key(42)

    pr_step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False, axis_name=dp.axis_name)
    pr_jit = dp.shard_map_step(pr_step, batch_argnums=(0, 1, 2, 3),
                               donate_state=False)
    pr_state, pr_metrics = pr_jit(dp.replicate(state), img, lab, img, lab,
                                  sched, step_key)

    # replica 0's step in isolation: local shard + the same folded key
    local_step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False)
    loc_state, loc_metrics = jax.jit(local_step)(
        state, jnp.asarray(img[:LOCAL]), jnp.asarray(lab[:LOCAL]),
        jnp.asarray(img[:LOCAL]), jnp.asarray(lab[:LOCAL]), sched,
        jax.random.fold_in(step_key, 0))

    sync_jit = dp.jit_step(
        steps_lib.make_shot_vae_train_step(
            model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
            optimal_match=False),
        batch_argnums=(0, 1, 2, 3), donate_state=False)
    sync_state, _ = sync_jit(dp.replicate(state), img, lab, img, lab, sched,
                             step_key)
    return pr_state, pr_metrics, loc_state, sync_state


def test_step_runs_and_outputs_replicated(run_all):
    pr_state, pr_metrics, _, _ = run_all
    assert bool(jnp.isfinite(pr_metrics["loss"]))
    assert int(pr_state.step) == 1
    leaf = jax.tree_util.tree_leaves(pr_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_running_stats_are_replica0_locals(run_all):
    """bn_stats='replica0': the surviving EMA update is exactly what
    replica 0 computes from its OWN shard (never the global batch)."""
    pr_state, _, loc_state, _ = run_all
    pr_bs = jax.tree_util.tree_leaves(pr_state.batch_stats)
    loc_bs = jax.tree_util.tree_leaves(loc_state.batch_stats)
    assert len(pr_bs) == len(loc_bs) and len(pr_bs) > 0
    for a, b in zip(pr_bs, loc_bs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_differs_from_sync_bn(run_all):
    pr_state, _, _, sync_state = run_all
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(pr_state.batch_stats),
        jax.tree_util.tree_leaves(sync_state.batch_stats))]
    assert max(diffs) > 1e-4, "per-replica stats identical to sync-BN?"


def test_collectives_reduce_to_gradient_pmean():
    """Per-replica mode must NOT emit per-BN-layer all-reduces: only the
    gradient pmean + BN replica-0 psum + metric pmeans remain (XLA's
    combiner may split/merge them, but the count stays far below sync-BN's
    one-per-BN-layer-per-forward)."""
    dp, model, state, img, lab, sched = _setup()
    pr_step = steps_lib.make_shot_vae_train_step(
        model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
        optimal_match=False, axis_name=dp.axis_name)
    from jax.sharding import PartitionSpec as P

    in_specs = (P(),) + tuple([P(dp.axis_name)] * 4) + (P(), P())
    smapped = jax.shard_map(pr_step, mesh=dp.mesh, in_specs=in_specs,
                            out_specs=(P(), P()), check_vma=False)
    img_s = jax.device_put(img, dp.batch_sharding(4))
    lab_s = jax.device_put(lab, dp.batch_sharding(1))
    compiled = jax.jit(smapped).lower(
        dp.replicate(state), img_s, lab_s, img_s, lab_s, sched,
        jax.random.key(42)).compile()
    txt = compiled.as_text()
    n_ar = len([l for l in txt.splitlines()
                if re.search(r"all-reduce(-start)?\(", l)])
    assert 1 <= n_ar <= 12, f"expected a handful of all-reduces, got {n_ar}"
