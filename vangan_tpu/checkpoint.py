"""Checkpointing via orbax: save/restore-by-epoch of the full VanGanState.

TPU-native equivalent of the reference's ``tf.train.Checkpoint`` over 4 models
+ 4 optimizers (vangan.py:238-268): the whole ``VanGanState`` pytree
(parameters, optimizer states, mutable collections, step counter) is one orbax
checkpoint named ``checkpoint_e{N}``. Because LR schedules are indexed by
``state.step``, restoring a checkpoint restores the schedule position exactly
— no resume-time re-derivation (custom_callback.py:367-397) needed.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class VanGanCheckpointer:
    """Save/load VanGanState by epoch number (vangan.py:247-268 API parity)."""

    def __init__(self, output_dir: str):
        self.checkpoint_dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int, newpath: Optional[str] = None) -> str:
        base = os.path.abspath(newpath) if newpath else self.checkpoint_dir
        return os.path.join(base, f"checkpoint_e{epoch}")

    def save(self, state: Any, epoch: int) -> None:
        """Write checkpoint_e{epoch+1}, overwriting if present (vangan.py:247-250)."""
        path = self._path(epoch + 1)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        print(f"\nSaved checkpoint to {path}\n")

    def load(self, template: Any, epoch: int, newpath: Optional[str] = None) -> Optional[Any]:
        """Restore checkpoint_e{epoch} into the structure of ``template``
        (vangan.py:252-268). Returns None if missing."""
        path = self._path(epoch, newpath)
        print(f"Trying to load checkpoint from path: {path}")
        if not os.path.isdir(path):
            print("Error: Checkpoint not found!")
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        state = self._ckptr.restore(path, abstract)
        print(f"Loaded checkpoint from {path}\n")
        return state

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for d in os.listdir(self.checkpoint_dir):
            if d.startswith("checkpoint_e"):
                try:
                    epochs.append(int(d[len("checkpoint_e"):]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None
