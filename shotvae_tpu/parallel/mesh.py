"""Data parallelism over a 1-D device mesh (the TPU-native nn.DataParallel).

The reference's only distribution strategy is single-process
``nn.DataParallel`` (SURVEY.md §2.6, shot_vae_model/vae.py:96-132). Its
TPU-native equivalent: a ``Mesh(('data',))`` over all chips, batches sharded
on the leading axis, parameters/optimizer state replicated, and the gradient
all-reduce emitted automatically by XLA's SPMD partitioner over ICI — no
hand-written collectives in the step function.

Design notes:
  * GSPMD jit (NamedSharding in/out specs) rather than shard_map: the step
    stays a plain single-device program; XLA inserts the psum. This also
    means BatchNorm statistics are computed over the *global* batch (sync-BN)
    — a documented deviation from DataParallel's per-replica stats that only
    strengthens the statistics (global batch == the reference's single-GPU
    batch when run on one chip).
  * datasets are replicated uint8 in HBM; only int32 index arrays are
    sharded per step, so PCIe traffic per step is a few KB.
  * mesh construction is host-count-agnostic: ``jax.devices()`` spans all
    processes if ``jax.distributed.initialize`` was called (multi-host DCN
    works unchanged, though out of scope for parity).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, *,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


class DataParallel:
    """Sharding helpers for a 1-D data mesh."""

    def __init__(self, mesh: Optional[Mesh] = None, *, axis_name: str = "data"):
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.axis_name = axis_name

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def batch_sharding(self, ndim: int = 1) -> NamedSharding:
        """Leading-axis sharding for a rank-``ndim`` batch array."""
        return NamedSharding(self.mesh,
                             P(self.axis_name, *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, tree: Any) -> Any:
        """device_put every leaf with its leading axis sharded."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding(np.ndim(x))), tree)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated())

    def pad_batch_size(self, n: int) -> int:
        """Round a batch size up to a multiple of the mesh size."""
        d = self.num_devices
        return -(-n // d) * d

    def jit_step(self, step_fn, *, batch_argnums: Sequence[int],
                 donate_state: bool = True):
        """jit a step whose args after ``state`` at positions in
        ``batch_argnums`` (0-based, counted after state) are batch-sharded;
        everything else (state, schedules, keys) replicated.

        Relies on sharding propagation from the device_put layout of the
        inputs — in/out shardings are left to XLA, which keeps this helper
        signature-agnostic. ``donate_state`` donates argument 0 (the train
        state) so params/opt-state update in place in HBM.
        """
        donate = (0,) if donate_state else ()
        jitted = jax.jit(step_fn, donate_argnums=donate)
        batch_argnums = set(batch_argnums)

        def wrapped(state, *args):
            args = list(args)
            for i in batch_argnums:
                args[i] = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x, self.batch_sharding(np.ndim(x))), args[i])
            return jitted(state, *args)

        return wrapped

    def shard_map_step(self, step_fn, *, batch_argnums: Sequence[int],
                       donate_state: bool = True):
        """shard_map a step for the per-replica-BatchNorm mode.

        ``step_fn`` must have been built with ``axis_name=self.axis_name``
        (``make_*_train_step``): each device runs it on its local batch shard
        with its OWN BatchNorm batch statistics — the DataParallel-faithful
        policy (nn.DataParallel never syncs BN, SURVEY.md §2.6) — and the
        step itself pmean's gradients/metrics and resolves running stats.
        Contrast with ``jit_step`` (GSPMD), where BN pools over the global
        batch and XLA emits one all-reduce per BN layer per forward; here the
        only collectives are the single gradient pmean + the tiny stats ones.

        Same calling convention as ``jit_step``: args after ``state`` at
        ``batch_argnums`` positions are batch-sharded, the rest replicated.
        """
        from jax.sharding import PartitionSpec

        batch_argnums = frozenset(batch_argnums)
        donate = (0,) if donate_state else ()
        jitted_cache: dict = {}

        def wrapped(state, *args):
            nargs = len(args)
            if nargs not in jitted_cache:
                in_specs = (PartitionSpec(),) + tuple(
                    PartitionSpec(self.axis_name) if i in batch_argnums
                    else PartitionSpec() for i in range(nargs))
                smapped = jax.shard_map(
                    step_fn, mesh=self.mesh, in_specs=in_specs,
                    out_specs=(PartitionSpec(), PartitionSpec()),
                    check_vma=False)
                jitted_cache[nargs] = jax.jit(smapped, donate_argnums=donate)
            args = list(args)
            for i in batch_argnums:
                args[i] = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x, self.batch_sharding(np.ndim(x))), args[i])
            return jitted_cache[nargs](state, *args)

        return wrapped
