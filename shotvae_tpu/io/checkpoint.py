"""Orbax checkpointing with the reference's directory layout and cadence.

The reference saves ``{epoch, args, state_dict, optimizer}`` every epoch to
``<bp>/<dataset>-SHOT-VAE/parameter/train_time_<t>/checkpoint.pth.tar`` and a
``best.pth.tar`` after the final LR milestone
(/root/reference/main_shot_vae.py:237-251,386-406). Here the same layout
holds orbax checkpoints {step, params, batch_stats, opt_state} plus a
sidecar ``.meta.json`` {epoch, config}.

Crash-safety: each logical checkpoint alternates between two slot
directories (``checkpoint.slot0`` / ``checkpoint.slot1``) and a pointer file
records the last COMPLETED slot after orbax's atomic commit — overwriting a
live checkpoint in place (what the reference's torch.save does) can corrupt
it on a crash mid-write. ``restore`` follows the pointer; passing an explicit
path also accepts a raw orbax directory.

Resume restores epoch, model and optimizer state, and the stored config dict
(the reference restores argparse args wholesale, main_shot_vae.py:202-213).
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def resolve_checkpoint_path(path: str,
                            names: tuple = ("checkpoint", "best")) -> str:
    """Resolve an explicit path per the manager's pointer conventions.

    Accepts a pointer-managed name (``<path>.current`` file beside it), a
    run folder containing ``<name>.current`` for any of ``names`` (first
    match wins), or a raw orbax directory (returned as-is). Shared by
    CheckpointManager.restore and scripts/export_torch_checkpoint.py so
    the slot/pointer layout has a single authority.
    """
    p = os.path.abspath(path)
    if os.path.isfile(p + ".current"):
        return open(p + ".current").read().strip()
    if os.path.isdir(p):
        for name in names:
            pointer = os.path.join(p, name + ".current")
            if os.path.isfile(pointer):
                return open(pointer).read().strip()
    return p


class CheckpointManager:
    def __init__(self, base_path: str, dataset: str, train_time: int,
                 *, tag: str = "SHOT-VAE", prewarm: bool = True,
                 async_save: bool = True):
        self.folder = os.path.join(
            base_path, f"{dataset}-{tag}", "parameter", f"train_time_{train_time}")
        os.makedirs(self.folder, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._next_slot = {"checkpoint": 0, "best": 0}
        self._prewarm_thread = None
        # async_save: ``save`` snapshots the state to host (fast; ~0.1 s at
        # WRN-28-2 scale on this tunnel) and runs the tensorstore write +
        # slot/pointer commit in ONE background writer thread, so the
        # ~200 s first-write init (and every later ~0.1 s write) never
        # stalls the train loop. Exactly one writer is outstanding: the
        # next save/restore joins it first, preserving write order, the
        # A/B-slot crash-safety contract (pointer updated only after
        # orbax's atomic commit, now inside the writer), and surfacing any
        # writer exception on the next manager call.
        self._async = async_save
        self._write_thread: Optional[threading.Thread] = None
        self._write_error: Optional[BaseException] = None
        atexit.register(self.wait_until_finished)
        if prewarm:
            self._start_prewarm()

    def _start_prewarm(self):
        """Start the ~200 s one-time tensorstore init at construction.

        The FIRST orbax/tensorstore save in a process costs ~200 s on this
        image (one-time library init over the axon tunnel; measured >1200 s
        on a congested day — later saves are ~0.1 s; CLAUDE.md gotchas,
        VERDICT r4 #5). Saving a tiny dummy array from a daemon thread at
        manager construction overlaps that init with epoch-0 compile+train.
        Best-effort: any failure just means the first real write pays the
        init as before. The background WRITER joins this thread (not the
        train loop), so prewarm and real writes never run concurrently and
        the main thread never blocks on the init.
        """
        import numpy as np

        def _go():
            try:
                path = os.path.abspath(os.path.join(self.folder, ".prewarm"))
                shutil.rmtree(path, ignore_errors=True)
                ck = ocp.StandardCheckpointer()
                ck.save(path, {"x": np.zeros(1, np.float32)}, force=True)
                ck.wait_until_finished()
                ck.close()
                shutil.rmtree(path, ignore_errors=True)
            except Exception:  # noqa: BLE001 - prewarm must never kill a run
                pass

        self._prewarm_thread = threading.Thread(target=_go, daemon=True)
        self._prewarm_thread.start()

    def _join_prewarm(self):
        if self._prewarm_thread is not None:
            self._prewarm_thread.join()
            self._prewarm_thread = None

    def _join_writer(self):
        if self._write_thread is not None:
            self._write_thread.join()
            self._write_thread = None
        if self._write_error is not None:
            err, self._write_error = self._write_error, None
            raise err

    def wait_until_finished(self):
        """Join the in-flight background write (and the prewarm); re-raise
        any exception the writer hit. Registered atexit so the last
        checkpoint always lands before the process exits."""
        self._join_writer()
        self._join_prewarm()

    def _name(self, best: bool) -> str:
        return "best" if best else "checkpoint"

    def _pointer(self, name: str) -> str:
        return os.path.join(self.folder, name + ".current")

    def save(self, state, *, epoch: int, config: Optional[dict] = None,
             best: bool = False):
        """Save {params, batch_stats, opt_state, step} (+epoch/config meta).

        With ``async_save`` (default) this returns after the host snapshot
        (~0.1 s at WRN-28-2 scale); the tensorstore write + meta + pointer
        commit run in a background writer. The returned path is where the
        checkpoint WILL land; call ``wait_until_finished`` to block on it.
        """
        payload = jax.device_get({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        })
        # one outstanding writer: join the previous write (and surface its
        # error) before starting the next, preserving write/pointer order.
        # NOT wait_until_finished: the prewarm join belongs to the WRITER
        # thread — joining it here would stall the first save on the init.
        self._join_writer()
        name = self._name(best)
        slot = self._next_slot[name]
        self._next_slot[name] = 1 - slot
        path = os.path.abspath(os.path.join(self.folder,
                                            f"{name}.slot{slot}"))

        def _write():
            try:
                self._join_prewarm()  # serialize with the init, off-main
                if os.path.exists(path):
                    shutil.rmtree(path, ignore_errors=True)
                self._ckptr.save(path, payload, force=True)
                self._ckptr.wait_until_finished()  # atomic commit done
                with open(path + ".meta.json", "w") as f:
                    json.dump({"epoch": epoch, "config": config or {}}, f,
                              default=str)
                with open(self._pointer(name), "w") as f:
                    f.write(path)
            except BaseException as e:  # noqa: BLE001 - surfaced on next call
                self._write_error = e

        if self._async:
            self._write_thread = threading.Thread(target=_write, daemon=True)
            self._write_thread.start()
        else:
            _write()
            if self._write_error is not None:
                err, self._write_error = self._write_error, None
                raise err
        return path

    def _resolve(self, best: bool, path: Optional[str]) -> str:
        if path:
            # accept a pointer-managed name, a raw orbax dir, or a folder
            return resolve_checkpoint_path(path, (self._name(best),))
        pointer = self._pointer(self._name(best))
        if os.path.isfile(pointer):
            return open(pointer).read().strip()
        return os.path.abspath(os.path.join(self.folder, self._name(best)))

    def restore(self, state, *, best: bool = False, path: Optional[str] = None):
        """Restore into ``state``; returns (state, epoch, config).

        Raises FileNotFoundError on a missing path, matching the reference's
        resume guard (main_shot_vae.py:213).
        """
        self._join_writer()  # the pointer must reflect any in-flight write
        path = self._resolve(best, path)
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
