"""Reflection padding for volumetric tensors.

TPU-native replacement for the reference's ``ReflectionPadding3D/2D`` Keras
layers (building_blocks.py:15-65): a pure function lowered to a single XLA pad,
fused into the adjacent convolution by the compiler.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp


def reflect_pad(x: jnp.ndarray, padding: Union[int, Sequence[int]] = 1) -> jnp.ndarray:
    """Reflect-pad the spatial dims of a channels-last tensor.

    Works for both 5-D ``(B, X, Y, Z, C)`` volumes and 4-D ``(B, H, W, C)``
    images; the first and last axes are never padded. ``padding`` is either a
    single int applied to every spatial dim or one int per spatial dim.
    """
    n_spatial = x.ndim - 2
    if isinstance(padding, int):
        pads = (padding,) * n_spatial
    else:
        pads = tuple(padding)
        if len(pads) != n_spatial:
            raise ValueError(f"padding {pads} does not match {n_spatial} spatial dims")
    pad_width = [(0, 0)] + [(p, p) for p in pads] + [(0, 0)]
    if all(p == 0 for p in pads):
        return x
    return jnp.pad(x, pad_width, mode="reflect")
