"""The VanGan facade: models + optimizers + checkpointing + jitted steps.

Public-API parity with the reference's ``VanGan`` class + free ``train()``
loop (vangan.py:20-550), built on the TPU-native core:

- one jit-compiled global-batch train step (training/step.py) sharded over a
  1-D data mesh (parallel.py) — the MirroredStrategy equivalent,
- per-epoch mutable behaviours (LR decay, discriminator noise σ) are pure
  step/epoch-indexed schedule values fed to the step as traced arguments,
- checkpointing via orbax (checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vangan_tpu.checkpoint import VanGanCheckpointer
from vangan_tpu.config import VanGanConfig
from vangan_tpu.models.factory import build_discriminator, build_generator
from vangan_tpu.parallel import (
    batch_sharding,
    jit_microbatch_step,
    jit_split_step,
    jit_test_step,
    jit_train_step,
    make_mesh,
    put_batch,
    put_replicated,
)
from vangan_tpu.training.step import make_step_fns


def append_dict(dict1: dict, dict2: dict, replace: bool = False) -> dict:
    """Accumulate per-step loss dicts into lists (utils.py:319-350)."""
    for key, value in dict2.items():
        if replace:
            dict1[key] = value
        else:
            dict1.setdefault(key, []).append(value)
    return dict1


class VanGan:
    """VAN-GAN trainer (vangan.py:20 API surface, TPU-native internals)."""

    def __init__(
        self,
        cfg: VanGanConfig,
        gen_i2s: Optional[str] = None,
        gen_s2i: Optional[str] = None,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
        init_rng: Optional[jax.Array] = None,
        models: Optional[Dict[str, object]] = None,
    ):
        self.cfg = cfg
        self.gen_i2s_typ = gen_i2s or cfg.gen_i2s
        self.gen_s2i_typ = gen_s2i or cfg.gen_s2i
        self.wasserstein = cfg.wasserstein
        self.ncritic = cfg.ncritic
        self.icritic = 1
        self.updateGen = True
        self.current_epoch = 0
        self.layer_noise = cfg.layer_noise
        self.checkpoint_loaded = False
        self.steps_per_epoch = steps_per_epoch or cfg.train_steps or 1

        self.models = models or {
            "gen_IS": build_generator(self.gen_i2s_typ, cfg, role="i2s"),
            "gen_SI": build_generator(self.gen_s2i_typ, cfg, role="s2i"),
            "disc_I": build_discriminator(cfg),
            "disc_S": build_discriminator(cfg),
        }
        self.fns = make_step_fns(cfg, self.models, self.steps_per_epoch)

        self.mesh = mesh if mesh is not None else make_mesh(cfg.N_DEVICES, cfg.mesh_axis)
        if getattr(cfg, "micro_batches", 1) > 1:
            self._train_step = jit_microbatch_step(
                self.fns, self.mesh, cfg.micro_batches, donate=cfg.donate_state,
                axis_name=cfg.mesh_axis)
        elif cfg.backward_mode == "split":
            self._train_step = jit_split_step(self.fns, self.mesh, donate=cfg.donate_state,
                                              axis_name=cfg.mesh_axis)
        else:
            self._train_step = jit_train_step(self.fns, self.mesh, donate=cfg.donate_state,
                                              axis_name=cfg.mesh_axis)
        self._test_step = jit_test_step(self.fns, self.mesh, axis_name=cfg.mesh_axis)

        rng = init_rng if init_rng is not None else jax.random.PRNGKey(cfg.seed)
        self.state = put_replicated(self.fns.init(rng), self.mesh)
        self._step_rng = jax.random.PRNGKey(cfg.seed + 1)

        self.checkpointer = VanGanCheckpointer(cfg.output_dir)

        # jitted batched generator applications for inference/monitoring
        self._gen_batched: Dict[str, Callable] = {}

    # --- inference-facing generator callables ---

    def _make_gen_batched(self, name: str) -> Callable[[np.ndarray], np.ndarray]:
        model = self.models[name]

        @jax.jit
        def fwd(params, model_state, x):
            return model.apply({"params": params, **model_state}, x, train=False)

        def call(x: np.ndarray) -> np.ndarray:
            return np.asarray(
                fwd(self.state.params[name], self.state.model_state[name], jnp.asarray(x))
            )

        return call

    @property
    def gen_IS_batched(self) -> Callable[[np.ndarray], np.ndarray]:
        if "gen_IS" not in self._gen_batched:
            self._gen_batched["gen_IS"] = self._make_gen_batched("gen_IS")
        return self._gen_batched["gen_IS"]

    @property
    def gen_SI_batched(self) -> Callable[[np.ndarray], np.ndarray]:
        if "gen_SI" not in self._gen_batched:
            self._gen_batched["gen_SI"] = self._make_gen_batched("gen_SI")
        return self._gen_batched["gen_SI"]

    def gen_apply(self, name: str) -> Tuple[Callable, dict]:
        """(apply_fn, variables) for the on-device stitcher: ``apply_fn`` is a
        stable jittable closure (cached per network so the stitcher's jit
        cache keys stay valid); ``variables`` reflect the CURRENT state."""
        key = f"_apply_{name}"
        if key not in self._gen_batched:
            model = self.models[name]

            def apply_fn(variables, x, _model=model):
                return _model.apply(variables, x, train=False)

            self._gen_batched[key] = apply_fn
        variables = {"params": self.state.params[name], **self.state.model_state[name]}
        return self._gen_batched[key], variables

    # --- train/test steps (vangan.py:380-507) ---

    def _next_rng(self) -> jax.Array:
        self._step_rng, sub = jax.random.split(self._step_rng)
        return sub

    def distributed_train_step(
        self, real_I: np.ndarray, real_S: np.ndarray, noise_std: float, update_gen: bool
    ) -> Dict[str, float]:
        x = put_batch(jnp.asarray(real_I), self.mesh, self.cfg.mesh_axis)
        y = put_batch(jnp.asarray(real_S), self.mesh, self.cfg.mesh_axis)
        self.state, result = self._train_step(
            self.state, x, y, self._next_rng(), jnp.asarray(noise_std, jnp.float32),
            jnp.asarray(update_gen),
        )
        return result

    def distributed_test_step(self, real_I: np.ndarray, real_S: np.ndarray) -> Dict[str, float]:
        x = put_batch(jnp.asarray(real_I), self.mesh, self.cfg.mesh_axis)
        y = put_batch(jnp.asarray(real_S), self.mesh, self.cfg.mesh_axis)
        return self._test_step(self.state, x, y, self._next_rng())

    # --- checkpointing (vangan.py:247-268) ---

    def save_checkpoint(self, epoch: int) -> None:
        self.checkpointer.save(self.state, epoch)

    def load_checkpoint(self, epoch: Optional[int] = None, expect_partial: bool = False,
                        newpath: Optional[str] = None) -> None:
        restored = self.checkpointer.load(self.state, epoch, newpath=newpath,
                                          expect_partial=expect_partial)
        if restored is not None:
            self.state = put_replicated(restored, self.mesh)
            self._gen_batched.clear()
            self.checkpoint_loaded = True


def train(
    ds: Iterable[Tuple[np.ndarray, np.ndarray]],
    gan: VanGan,
    summary,
    epoch: int,
    steps: Optional[int] = None,
    desc: Optional[str] = None,
    training: bool = True,
    noise_std: float = 0.0,
) -> Dict[str, list]:
    """Run one epoch of training or evaluation (vangan.py:510-550).

    ncritic bookkeeping parity: the generator-update flag is raised every
    ncritic-th step and lowered after each step (vangan.py:535-544); it only
    has an effect on the Wasserstein path.
    """
    from tqdm import tqdm

    results: Dict[str, list] = {}
    pending: list = []  # device-side loss dicts awaiting a chunked fetch
    fetch_every = 32

    def drain() -> None:
        # ONE host<->device round-trip per chunk (the reference - and round 1 -
        # fetched 10 scalars synchronously EVERY step, serialising host and
        # device; invisible at 2.5 s/step, a ceiling at sub-100 ms steps).
        if pending:
            for got in jax.device_get(pending):
                append_dict(results, {k: float(v) for k, v in got.items()})
            pending.clear()

    cntr = 0
    iterator = iter(ds)
    pbar = tqdm(total=steps, desc=desc)
    while steps is None or cntr < steps:
        try:
            x, y = next(iterator)
        except StopIteration:
            break
        cntr += 1
        if training:
            if gan.icritic % gan.ncritic == 0:
                gan.updateGen = True
                gan.icritic = 1
            else:
                gan.icritic += 1
            update_gen = gan.updateGen if gan.wasserstein else True
            result = gan.distributed_train_step(x, y, noise_std, update_gen)
        else:
            result = gan.distributed_test_step(x, y)
        pending.append(result)
        if len(pending) >= fetch_every:
            drain()
        gan.updateGen = False
        pbar.update(1)
    drain()
    pbar.close()

    for key, value in results.items():
        summary.scalar(key, float(np.mean(value)), epoch=epoch, training=training)
    return results
