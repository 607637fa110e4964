"""Training state: the complete, checkpointable pytree for all four networks."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

NETWORKS = ("gen_IS", "gen_SI", "disc_I", "disc_S")


class VanGanState(struct.PyTreeNode):
    """All trainable state of the VAN-GAN system.

    The TPU-native analog of the reference's ``tf.train.Checkpoint`` over 4
    models + 4 optimizers (vangan.py:238-245): a single pytree carried through
    the jitted train step and persisted via orbax.

    - ``params``: per-network parameter trees
    - ``model_state``: per-network non-trainable collections (batch_stats for
      V-Net BN / spectral-norm power iteration); empty dicts otherwise
    - ``opt_state``: per-network optax states
    - ``step``: global optimization step (drives LR schedules, so checkpoint
      resume restores the schedule position for free — unlike the reference's
      re-derivation in custom_callback.py:367-397)
    """

    step: jnp.ndarray
    params: Dict[str, Any]
    model_state: Dict[str, Any]
    opt_state: Dict[str, Any]
