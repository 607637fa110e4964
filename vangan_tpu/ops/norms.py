"""Normalisation primitives (jnp + numpy), mirroring the reference's utils.py.

All jnp functions are pure, jit-safe, and shape-polymorphic; numpy variants are
for the host-side preprocessing path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def min_max_norm_np(data: np.ndarray) -> np.ndarray:
    """Min-max normalise a numpy array to [0, 1] (utils.py:10-24)."""
    dmin = np.min(data)
    dmax = np.max(data)
    if (dmax - dmin) == 0:
        raise ValueError("Cannot perform min-max normalization when max and min are equal.")
    return (data - dmin) / (dmax - dmin)


def min_max_norm(arr: jnp.ndarray, axis: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Min-max normalise to [0, 1], optionally per-axis (utils.py:27-48).

    Like the reference, produces NaN/Inf if the slice is constant — callers in
    the loss path guarantee non-constant inputs (tanh outputs + real data).
    """
    if axis is None:
        min_val = jnp.min(arr)
        max_val = jnp.max(arr)
    else:
        min_val = jnp.min(arr, axis=tuple(axis), keepdims=True)
        max_val = jnp.max(arr, axis=tuple(axis), keepdims=True)
    return (arr - min_val) / (max_val - min_val)


def rescale_arr(arr: jnp.ndarray, alpha: float = -0.5, beta: float = 0.5) -> jnp.ndarray:
    """Affine rescale: (arr + alpha) / beta, 0 where beta == 0 (utils.py:51-65).

    alpha=-0.5, beta=0.5 maps [0,1] -> [-1,1]; alpha=1.0, beta=2.0 maps [-1,1] -> [0,1].
    """
    if beta == 0:
        return jnp.zeros_like(arr)
    return (arr + alpha) / beta


def z_score_norm(data: np.ndarray) -> np.ndarray:
    """Z-score normalise a numpy array; mean-centre only if std == 0 (utils.py:68-83)."""
    dstd = np.std(data)
    if dstd > 0.0:
        return (data - np.mean(data)) / dstd
    return data - np.mean(data)


def z_score_norm_batch(data: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Per-sample z-score over all non-batch dims (utils.py:89-105)."""
    axes = tuple(range(1, data.ndim))
    mean = jnp.mean(data, axis=axes, keepdims=True)
    std = jnp.std(data, axis=axes, keepdims=True)
    return (data - mean) / jnp.where(std > epsilon, std, epsilon)


def threshold_outliers(image_volume: np.ndarray, threshold: float = 6) -> np.ndarray:
    """Clip voxels beyond a z-score threshold to the extreme inlier values (utils.py:108-133)."""
    mean_intensity = np.mean(image_volume)
    std_intensity = np.std(image_volume)
    z_scores = np.abs((image_volume - mean_intensity) / std_intensity)
    upper_limit = np.max(image_volume[z_scores <= threshold])
    lower_limit = np.min(image_volume[z_scores <= threshold])
    return np.clip(image_volume, a_min=lower_limit, a_max=upper_limit)


def binarise(arr: jnp.ndarray) -> jnp.ndarray:
    """Map >= 0 to +1 and < 0 to -1 (utils.py:162-174)."""
    return jnp.where(arr >= 0, jnp.ones_like(arr), -jnp.ones_like(arr))


def clip_images(images: jnp.ndarray) -> jnp.ndarray:
    """Clip to [-1, 1] (utils.py:191-201)."""
    return jnp.clip(images, -1.0, 1.0)


def minmax_to_pm1(tensor: jnp.ndarray, axis=(1, 2, 3, 4), keepdims: bool = True) -> jnp.ndarray:
    """On-the-fly per-sample min-max normalisation to [-1, 1] (main.py:169-177).

    This is the default ``otf_imaging`` transform applied to imaging batches.
    """
    max_vals = jnp.max(tensor, axis=axis, keepdims=keepdims)
    min_vals = jnp.min(tensor, axis=axis, keepdims=keepdims)
    return 2.0 * (tensor - min_vals) / (max_vals - min_vals) - 1.0
