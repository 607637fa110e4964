"""Checkpointing via orbax: save/restore-by-epoch of the full VanGanState.

TPU-native equivalent of the reference's ``tf.train.Checkpoint`` over 4 models
+ 4 optimizers (vangan.py:238-268): the whole ``VanGanState`` pytree
(parameters, optimizer states, mutable collections, step counter) is one orbax
checkpoint named ``checkpoint_e{N}``. Because LR schedules are indexed by
``state.step``, restoring a checkpoint restores the schedule position exactly
— no resume-time re-derivation (custom_callback.py:367-397) needed.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class VanGanCheckpointer:
    """Save/load VanGanState by epoch number (vangan.py:247-268 API parity).

    Saves are ASYNCHRONOUS (SURVEY §5 build plan): ``save`` serialises device
    arrays to host, dispatches the disk write to a background thread and
    returns — the epoch loop never blocks on IO. ``AsyncCheckpointer.save``
    itself waits for any previous in-flight write first, so back-to-back
    saves stay atomic; call :meth:`wait_until_finished` before reading a
    just-written checkpoint or exiting the process.
    """

    def __init__(self, output_dir: str):
        self.checkpoint_dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def _path(self, epoch: int, newpath: Optional[str] = None) -> str:
        base = os.path.abspath(newpath) if newpath else self.checkpoint_dir
        return os.path.join(base, f"checkpoint_e{epoch}")

    def save(self, state: Any, epoch: int) -> None:
        """Write checkpoint_e{epoch+1}, overwriting if present (vangan.py:247-250).

        Returns as soon as the write is dispatched (async)."""
        path = self._path(epoch + 1)
        self._ckptr.save(path, state, force=True)
        print(f"\nSaving checkpoint to {path} (async)\n")

    def wait_until_finished(self) -> None:
        """Block until every dispatched save has committed to disk."""
        self._ckptr.wait_until_finished()

    def load(
        self,
        template: Any,
        epoch: int,
        newpath: Optional[str] = None,
        expect_partial: bool = False,
    ) -> Optional[Any]:
        """Restore checkpoint_e{epoch} into the structure of ``template``
        (vangan.py:252-268). Returns None if missing.

        ``expect_partial`` mirrors tf.train.Checkpoint semantics honestly:
        False (default) requires the stored tree to match ``template``
        exactly and errors loudly listing the mismatched paths; True merges
        the intersection — shape-matching leaves are restored (value-cast to
        the template dtype when dtypes differ, the bf16/f32 compute-dtype
        resume case), shape-MISmatching leaves keep template values — and
        reports what was skipped.
        """
        path = self._path(epoch, newpath)
        print(f"Trying to load checkpoint from path: {path}")
        self._ckptr.wait_until_finished()  # the ckpt may still be in flight
        if not os.path.isdir(path):
            print("Error: Checkpoint not found!")
            return None
        # restore as-saved (no template), then merge by path so structure
        # mismatches are OUR diagnostic, not an orbax traceback
        stored = self._ckptr.restore(path)
        stored_flat = dict(_flatten_paths(stored))
        template_flat = _flatten_paths(template)
        missing = [k for k, _ in template_flat if k not in stored_flat]
        extra = sorted(set(stored_flat) - {k for k, _ in template_flat})
        if not expect_partial and (missing or extra):
            raise ValueError(
                f"checkpoint {path} does not match the model/optimizer tree "
                f"(pass expect_partial=True to merge the intersection).\n"
                f"  missing from checkpoint: {missing[:8]}{'...' if len(missing) > 8 else ''}\n"
                f"  extra in checkpoint: {extra[:8]}{'...' if len(extra) > 8 else ''}"
            )
        skipped = []
        merged_leaves = []
        for key, tleaf in template_flat:
            sleaf = stored_flat.get(key)
            if sleaf is None:
                skipped.append(key)
                merged_leaves.append(tleaf)
                continue
            t = np.asarray(tleaf)
            s = np.asarray(sleaf)
            if s.shape != t.shape or (not expect_partial and s.dtype != t.dtype):
                if not expect_partial:
                    raise ValueError(
                        f"checkpoint leaf {key} has shape/dtype {s.shape}/{s.dtype}, "
                        f"model expects {t.shape}/{t.dtype}"
                    )
                skipped.append(key)
                merged_leaves.append(tleaf)
                continue
            merged_leaves.append(s.astype(t.dtype))
        if skipped or extra:
            print(f"expect_partial: kept template values for {len(skipped)} leaves; "
                  f"ignored {len(extra)} checkpoint-only leaves")
        treedef = jax.tree_util.tree_structure(template)
        state = jax.tree_util.tree_unflatten(treedef, merged_leaves)
        print(f"Loaded checkpoint from {path}\n")
        return state


    def latest_epoch(self) -> Optional[int]:
        self._ckptr.wait_until_finished()  # commit in-flight saves first
        epochs = []
        for d in os.listdir(self.checkpoint_dir):
            if d.startswith("checkpoint_e"):
                try:
                    epochs.append(int(d[len("checkpoint_e"):]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None


def _canon_path(path) -> str:
    """Canonical container-style-independent key: orbax restores NamedTuples/
    dataclasses as plain dicts, so `.step` / `(...).count` (template) and
    `['step']` / `['count']` (stored) must compare equal."""
    parts = []
    for e in path:
        if hasattr(e, "key"):  # DictKey
            parts.append(str(e.key))
        elif hasattr(e, "name"):  # GetAttrKey
            parts.append(e.name)
        elif hasattr(e, "idx"):  # SequenceKey
            parts.append(str(e.idx))
        else:
            parts.append(str(e))
    return "/".join(parts)


def _flatten_paths(tree: Any):
    """[(canonical_key, leaf)] in tree-flatten order."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(_canon_path(path), leaf) for path, leaf in flat]


# --- config-bundled model export (SavedModel analogue) ---
#
# The reference exports full Keras SavedModels of all four networks —
# architecture + weights, reloadable standalone (custom_callback.py:33-45).
# The flax analogue: per-network .npz weight archives PLUS the full config
# YAML and a manifest naming each network's builder, so ``load_exported``
# can rebuild the modules and variables with no training run in hand.

_KEY_RE = re.compile(r"\['([^']*)'\]")


def _flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Rebuild the nested dict a flax module expects from keystr-keyed leaves
    (keys look like ``['encoder']['Conv_0']['kernel']``)."""
    tree: Dict[str, Any] = {}
    for keystr, leaf in flat.items():
        parts = _KEY_RE.findall(keystr)
        if not parts:
            raise ValueError(f"unparseable export key {keystr!r}")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def export_models(cfg, state: Any, epoch: int, out_dir: Optional[str] = None) -> str:
    """Export all four networks + the config as a standalone bundle.

    Writes ``{out_dir}/exports/e{epoch+1}/`` containing ``config.yaml``,
    ``manifest.json`` and one ``{name}.npz`` per network (params + mutable
    collections). Returns the bundle path.
    """
    from vangan_tpu.training.state import NETWORKS

    base = out_dir or cfg.output_dir
    path = os.path.join(base, "exports", f"e{epoch + 1}")
    os.makedirs(path, exist_ok=True)
    cfg.to_yaml(os.path.join(path, "config.yaml"))
    roles = {"gen_IS": ("generator", cfg.gen_i2s, "i2s"),
             "gen_SI": ("generator", cfg.gen_s2i, "s2i"),
             "disc_I": ("discriminator", None, None),
             "disc_S": ("discriminator", None, None)}
    manifest = {"format": 1, "epoch": epoch + 1, "networks": {}}
    for name in NETWORKS:
        builder, kind, role = roles[name]
        arrays = {f"params{k}": v for k, v in _flatten_tree(state.params[name]).items()}
        arrays.update(
            {f"state{k}": v for k, v in _flatten_tree(state.model_state[name]).items()}
        )
        np.savez(os.path.join(path, f"{name}.npz"), **arrays)
        manifest["networks"][name] = {"builder": builder, "kind": kind, "role": role,
                                      "file": f"{name}.npz"}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_exported(path: str) -> Tuple[Any, Dict[str, Tuple[Any, Dict[str, Any]]]]:
    """Load a bundle written by :func:`export_models`.

    Returns ``(cfg, {name: (module, variables)})`` — each module rebuilt from
    the bundled config via the model factory, each ``variables`` ready for
    ``module.apply(variables, x, train=False)``.
    """
    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator

    cfg = VanGanConfig.from_yaml(os.path.join(path, "config.yaml"))
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    nets = {}
    for name, meta in manifest["networks"].items():
        if meta["builder"] == "generator":
            module = build_generator(meta["kind"], cfg, role=meta["role"])
        else:
            module = build_discriminator(cfg)
        with np.load(os.path.join(path, meta["file"])) as data:
            params = _unflatten_tree(
                {k[len("params"):]: data[k] for k in data.files if k.startswith("params")}
            )
            collections = _unflatten_tree(
                {k[len("state"):]: data[k] for k in data.files if k.startswith("state")}
            ) if any(k.startswith("state") for k in data.files) else {}
        nets[name] = (module, {"params": params, **collections})
    return cfg, nets
