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


class TestGlobalMixup:
    """--global-mixup (VERDICT r4 #7): partner draws over the all_gathered
    GLOBAL batch with a replica-shared key == DataParallel's
    gathered-device-0 mixup (main_shot_vae.py:297-322)."""

    def test_gather_mixup_matches_host_global(self):
        from jax.sharding import PartitionSpec as P

        from shotvae_tpu.ops import mixup

        dp = DataParallel(make_mesh(N_DEV))
        k = jax.random.key(7)
        x = jax.random.normal(jax.random.fold_in(k, 0), (B, 8, 8, 3))
        mean = jax.random.normal(jax.random.fold_in(k, 1), (B, 8))
        ls = 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (B, 8))
        la = jax.nn.log_softmax(
            jax.random.normal(jax.random.fold_in(k, 3), (B, 10)))
        lab = jax.random.randint(jax.random.fold_in(k, 4), (B,), 0, 10)
        key_sm, key_mx = jax.random.split(jax.random.key(11))

        def f(x, mean, ls, la, lab):
            sm = steps_lib.gather_mixup(
                dp.axis_name, mixup.label_smoothing, key_sm,
                (x, mean, ls, la, lab), LOCAL, epsilon=0.1)
            mx = steps_lib.gather_mixup(
                dp.axis_name, mixup.mixup_vae_data, key_mx,
                (x, mean, ls, la), LOCAL, optimal_match=True)
            return sm.image, sm.partner_labels, mx.image, mx.disc_alpha

        smapped = jax.jit(jax.shard_map(
            f, mesh=dp.mesh, in_specs=(P(dp.axis_name),) * 5,
            out_specs=(P(dp.axis_name),) * 4, check_vma=False))
        args = [jax.device_put(a, dp.batch_sharding(a.ndim))
                for a in (x, mean, ls, la, lab)]
        sm_img, sm_plab, mx_img, mx_alpha = smapped(*args)

        # the host computation over the FULL batch with the same keys is the
        # DataParallel-gathered reference semantics
        sm_h = mixup.label_smoothing(key_sm, x, mean, ls, la, lab, epsilon=0.1)
        mx_h = mixup.mixup_vae_data(key_mx, x, mean, ls, la,
                                    optimal_match=True)
        # partner selection is the semantics under test: EXACT. The
        # interpolations differ from host-eager in the last ulp only
        # (shard_map compiles the lam*x + (1-lam)*x[perm] chain with
        # different fma fusion than the eager host program).
        np.testing.assert_array_equal(np.asarray(sm_plab),
                                      np.asarray(sm_h.partner_labels))
        np.testing.assert_allclose(np.asarray(sm_img),
                                   np.asarray(sm_h.image),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mx_img),
                                   np.asarray(mx_h.image),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mx_alpha),
                                   np.asarray(mx_h.disc_alpha),
                                   rtol=1e-4, atol=1e-6)

    def test_global_mixup_step_runs_and_differs_from_within_shard(self):
        dp, model, state, img, lab, sched = _setup()
        step_key = jax.random.key(42)
        kw = dict(num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
                  optimal_match=True, axis_name=dp.axis_name)
        out = {}
        for name, gm in (("global", True), ("local", False)):
            step = steps_lib.make_shot_vae_train_step(model, global_mixup=gm,
                                                      **kw)
            jit = dp.shard_map_step(step, batch_argnums=(0, 1, 2, 3),
                                    donate_state=False)
            st, metrics = jit(dp.replicate(state), img, lab, img, lab,
                              sched, step_key)
            assert bool(jnp.isfinite(metrics["loss"]))
            assert jax.tree_util.tree_leaves(
                st.params)[0].sharding.is_fully_replicated
            out[name] = st
        # cross-replica partners (and the shared lambda) must change the
        # update relative to within-shard draws
        diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(out["global"].params),
            jax.tree_util.tree_leaves(out["local"].params))]
        assert max(diffs) > 1e-7, "global mixup produced identical update?"

    def test_global_mixup_requires_axis(self):
        _, model, *_ = _setup()
        with pytest.raises(ValueError):
            steps_lib.make_shot_vae_train_step(
                model, num_classes=10, bce=True, x_sigma=1.0, epsilon=0.1,
                optimal_match=False, global_mixup=True)


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
