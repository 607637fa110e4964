"""Optimizers and schedules (vangan.py:194-235, custom_callback.py:326-397).

Keras-parity notes:
- ``clipnorm=100`` in Keras clips each gradient *tensor* independently (not
  the global norm) — implemented as a per-leaf transformation.
- Adam epsilon follows Keras' 1e-7 default.
- The reference's LR schedule is: constant INITIAL_LR, then at epoch
  INITIATE_LR_DECAY a linear PolynomialDecay to 0 at EPOCHS
  (custom_callback.py:342-365). As a *step-indexed* optax schedule the
  resume-aware re-derivation (custom_callback.py:367-397) becomes unnecessary:
  restoring ``state.step`` restores the schedule position exactly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def clip_by_per_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras ``clipnorm`` semantics: clip each gradient leaf to L2 norm <= max_norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(cfg, steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Constant LR then linear decay to 0 from INITIATE_LR_DECAY (LSGAN path);
    constant 1e-4 for the Wasserstein path (vangan.py:197-204)."""
    if cfg.wasserstein:
        return optax.constant_schedule(1e-4)
    decay_start = cfg.decay_start_step(steps_per_epoch)
    total = cfg.total_steps(steps_per_epoch)
    return optax.join_schedules(
        [
            optax.constant_schedule(cfg.INITIAL_LR),
            optax.linear_schedule(cfg.INITIAL_LR, 0.0, max(1, total - decay_start)),
        ],
        [decay_start],
    )


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(2e-4, b1=.5, b2=.9, per-leaf clipnorm 100) for LSGAN
    (vangan.py:220-235) or Adam(1e-4, b1=0, b2=.9) for WGAN (vangan.py:197-204).

    ``cfg.flatten_opt`` (default on) runs the Adam+LR stage through
    ``optax.flatten``: per-network the moments live in ONE ravelled vector,
    so the update is a handful of large elementwise ops instead of ~6 ops x
    ~100 leaves x 4 networks (~90 ms of the measured 128^3 step was
    optimizer+schedules, docs/CEILING.md — launch-count, not bandwidth).
    Identical math (Adam is elementwise); the per-leaf clipnorm stays
    OUTSIDE the flatten because its semantics are per-tensor. Optimizer
    checkpoint STATE layout changes with this flag (params are unaffected)."""
    lr = make_lr_schedule(cfg, steps_per_epoch)
    flat = getattr(cfg, "flatten_opt", True)

    def _maybe_flatten(tx):
        return optax.flatten(tx) if flat else tx

    if cfg.wasserstein:
        return _maybe_flatten(optax.chain(
            optax.scale_by_adam(b1=0.0, b2=0.9, eps=1e-7),
            optax.scale_by_learning_rate(lr),
        ))
    return optax.chain(
        clip_by_per_leaf_norm(100.0),
        _maybe_flatten(optax.chain(
            optax.scale_by_adam(b1=0.5, b2=0.9, eps=1e-7),
            optax.scale_by_learning_rate(lr),
        )),
    )
