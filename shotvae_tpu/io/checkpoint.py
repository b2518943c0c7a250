"""Orbax checkpointing with the reference's directory layout and cadence.

The reference saves ``{epoch, args, state_dict, optimizer}`` every epoch to
``<bp>/<dataset>-SHOT-VAE/parameter/train_time_<t>/checkpoint.pth.tar`` and a
``best.pth.tar`` after the final LR milestone
(/root/reference/main_shot_vae.py:237-251,386-406). Here the same layout
holds orbax directories ``checkpoint/`` and ``best/`` containing
{step, epoch, params, batch_stats, opt_state, config}.

Resume restores epoch, model and optimizer state, and the stored config dict
(the reference restores argparse args wholesale, main_shot_vae.py:202-213).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, base_path: str, dataset: str, train_time: int,
                 *, tag: str = "SHOT-VAE"):
        self.folder = os.path.join(
            base_path, f"{dataset}-{tag}", "parameter", f"train_time_{train_time}")
        os.makedirs(self.folder, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, best: bool) -> str:
        return os.path.abspath(
            os.path.join(self.folder, "best" if best else "checkpoint"))

    def save(self, state, *, epoch: int, config: Optional[dict] = None,
             best: bool = False):
        """Save {params, batch_stats, opt_state, step, epoch, config}."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        path = self._path(best)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        # free-form metadata in a sidecar file (orbax array tree stays uniform)
        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "config": config or {}}, f, default=str)
        return path

    def restore(self, state, *, best: bool = False, path: Optional[str] = None):
        """Restore into ``state``; returns (state, epoch, config).

        Raises FileNotFoundError on a missing path, matching the reference's
        resume guard (main_shot_vae.py:213).
        """
        path = os.path.abspath(path) if path else self._path(best)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Checkpoint Resume File {path} Not Found")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._ckptr.restore(path, template)
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        meta = {"epoch": 0, "config": {}}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return new_state, int(meta["epoch"]), meta["config"]


def tree_bytes(tree: Any) -> int:
    """Total parameter bytes (for logging)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))
