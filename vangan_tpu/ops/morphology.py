"""Soft morphology (erode / dilate / open / skeletonise) for the clDice loss.

TPU-native re-derivation of the reference's Keras pooling pipeline
(clDice_func.py:8-80): min/max pools become ``lax.reduce_window`` with ±inf
init values ('SAME' padding therefore ignores out-of-range voxels, matching
TF pooling), and the iterative skeletonisation is a ``lax.fori_loop`` so the
compiled program stays small at any iteration count.

Layouts: 5-D ``(B, X, Y, Z, C)`` volumes or 4-D ``(B, H, W, C)`` images, same
rank-based dispatch as the reference (clDice_func.py:18-26).

An optional fused Pallas kernel for the full skeleton loop lives in
``vangan_tpu.ops.pallas.skeleton`` (the loop is bandwidth-bound: ~3*iters
passes over HBM when expressed as XLA windows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool(img: jnp.ndarray, window: tuple, reducer, init: float) -> jnp.ndarray:
    """Stride-1 'SAME' window reduction over spatial dims of a channels-last tensor.

    ``init`` must stay a Python literal: reduce_window's autodiff rule (and its
    linearization under lax.scan) requires a literal init value.
    """
    full_window = (1, *window, 1)
    return lax.reduce_window(
        img,
        init_value=init,
        computation=reducer,
        window_dimensions=full_window,
        window_strides=(1,) * img.ndim,
        padding="SAME",
    )


def soft_erode(img: jnp.ndarray) -> jnp.ndarray:
    """Soft erosion: min of directional min-pools (clDice_func.py:8-26).

    3-D: min over (3,3,1), (3,1,3), (1,3,3) windows; 2-D: (3,1), (1,3).
    """
    inf = float("inf")
    if img.ndim == 4:
        p2 = _pool(img, (3, 1), lax.min, inf)
        p3 = _pool(img, (1, 3), lax.min, inf)
        return jnp.minimum(p2, p3)
    p1 = _pool(img, (3, 3, 1), lax.min, inf)
    p2 = _pool(img, (3, 1, 3), lax.min, inf)
    p3 = _pool(img, (1, 3, 3), lax.min, inf)
    return jnp.minimum(jnp.minimum(p1, p2), p3)


def soft_dilate(img: jnp.ndarray) -> jnp.ndarray:
    """Soft dilation: full-window max-pool (clDice_func.py:29-42)."""
    window = (3, 3) if img.ndim == 4 else (3, 3, 3)
    return _pool(img, window, lax.max, -float("inf"))


def soft_open(img: jnp.ndarray) -> jnp.ndarray:
    """Erosion followed by dilation (clDice_func.py:45-57)."""
    return soft_dilate(soft_erode(img))


def soft_skel(img: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Iterative soft skeletonisation (clDice_func.py:60-80).

    ``skel`` accumulates relu(img - open(img)) residues while ``img`` is
    progressively eroded. The loop body is identical each round, so it compiles
    to a single rolled ``fori_loop`` instead of ``iters`` unrolled stages.
    """
    img1 = soft_open(img)
    skel = jax.nn.relu(img - img1)

    @jax.checkpoint  # recompute pools in backward: keeps scan residuals O(volume)
    def body(carry, _):
        img, skel = carry
        img = soft_erode(img)
        img1 = soft_open(img)
        delta = jax.nn.relu(img - img1)
        intersect = skel * delta
        skel = skel + jax.nn.relu(delta - intersect)
        return (img, skel), None

    # lax.scan (not fori_loop): the loss path differentiates through the
    # skeleton (vangan.py:304), and scan supports reverse-mode.
    (_, skel), _ = lax.scan(body, (img, skel), None, length=iters)
    return skel
