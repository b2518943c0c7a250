"""Per-step NaN probe for the smooth-ELBO SVHN learning arm.

Replicates scripts/smooth_elbo_learning.py's SVHN arm (hard synthetic data,
capacity anneal scaled to the run length) but drives the train step manually
with per-step metric fetch + param/logvar stats, to locate the first
non-finite value and the term that produced it.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SHOTVAE_COMPILE_CACHE",
                                 "/tmp/shotvae_jax_cache"))

import jax.numpy as jnp

from ssl_value_bench import make_hard_synthetic

from shotvae_tpu.config import svhn_smooth_defaults
from shotvae_tpu.data.splits import labeled_subset_per_class
from shotvae_tpu.data.pipeline import epoch_batches, infinite_batches
from shotvae_tpu.models.smooth_vae import SmoothVAE, svhn_vae_config
from shotvae_tpu.train import steps as steps_lib
from shotvae_tpu.train.state import TrainState, adam_torch, init_model


def main():
    n_train, n_test, epochs, seed = 8192, 2048, 80, 1
    (xtr, ytr), (xte, yte) = make_hard_synthetic(
        n_train=n_train, n_test=n_test, seed=seed)

    cfg = svhn_smooth_defaults()
    cfg.seed = seed
    ref_steps = cfg.epochs * math.ceil(73257 / cfg.unlabeled_batch_size)
    steps_per_epoch = math.ceil(n_train / cfg.unlabeled_batch_size)
    run_steps = epochs * steps_per_epoch
    scale = run_steps / ref_steps
    cfg.cont_capacity = (cfg.cont_capacity[0], cfg.cont_capacity[1],
                         max(1, round(cfg.cont_capacity[2] * scale)),
                         cfg.cont_capacity[3])
    cfg.disc_capacity = (cfg.disc_capacity[0], cfg.disc_capacity[1],
                         max(1, round(cfg.disc_capacity[2] * scale)),
                         cfg.disc_capacity[3])
    print("cont_capacity", cfg.cont_capacity, "steps/epoch", steps_per_epoch)

    labeled_idx = labeled_subset_per_class(ytr, cfg.size_labeled_data, 10,
                                           seed=cfg.seed)
    mcfg = svhn_vae_config()
    mcfg["latent_cont_dim"] = cfg.latent_spec_cont
    mcfg["disc_dims"] = tuple(cfg.latent_spec_disc)
    model = SmoothVAE(**mcfg)

    tx = adam_torch(cfg.learning_rate)
    params, batch_stats = init_model(
        model, jax.random.key(cfg.seed),
        jnp.zeros((2, 32, 32, mcfg["img_channels"])))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=batch_stats, tx=tx)

    raw_step = steps_lib.make_smooth_elbo_train_step(
        model, alpha=cfg.alpha, cont_capacity=tuple(cfg.cont_capacity),
        disc_capacity=tuple(cfg.disc_capacity),
        disc_dims=tuple(cfg.latent_spec_disc))

    xtr_dev = jnp.asarray(xtr)

    def probe_stats(state):
        leaves = jax.tree_util.tree_leaves(state.params)
        amax = jnp.max(jnp.stack([jnp.max(jnp.abs(l)) for l in leaves]))
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(l)) for l in leaves]))
        return amax, finite

    @jax.jit
    def full_step(state, img_u, img_l, lab_l, key):
        state, metrics = raw_step(state, img_u, img_l, lab_l, key)
        amax, finite = probe_stats(state)
        metrics["param_amax"] = amax
        metrics["param_finite"] = finite
        return state, metrics

    rng_u = np.random.default_rng(cfg.seed + 1)
    rng_l = np.random.default_rng(cfg.seed + 2)
    labeled_iter = infinite_batches(rng_l, labeled_idx, cfg.labeled_batch_size)
    base_key = jax.random.key(cfg.seed + 1000)
    unlabeled_idx = np.arange(n_train)

    step_no = 0
    for epoch in range(4):
        for i, idx_u in enumerate(epoch_batches(rng_u, unlabeled_idx,
                                                cfg.unlabeled_batch_size)):
            idx_l = next(labeled_iter)
            img_u = xtr_dev[jnp.asarray(idx_u)]
            img_l = xtr_dev[jnp.asarray(idx_l)]
            lab_l = jnp.asarray(ytr[idx_l])
            key = jax.random.fold_in(jax.random.fold_in(base_key, epoch), i)
            state, metrics = full_step(state, img_u, img_l, lab_l, key)
            m = {k: float(v) for k, v in jax.device_get(metrics).items()
                 if getattr(v, "ndim", 0) == 0}
            bad = [k for k, v in m.items() if not math.isfinite(v)]
            print(f"e{epoch} s{i} g{step_no}: loss={m['loss']:.1f} "
                  f"u_recon={m['u_recon']:.1f} kl_cont={m['kl_cont']:.2f} "
                  f"kl_disc={m['kl_disc']:.3f} cls={m['classification']:.2f} "
                  f"l_recon={m['l_recon']:.1f} amax={m['param_amax']:.2e} "
                  f"finite={m['param_finite']}" + (f"  BAD={bad}" if bad else ""))
            step_no += 1
            if bad or not m["param_finite"]:
                print("FIRST NON-FINITE at global step", step_no - 1)
                return


if __name__ == "__main__":
    main()
