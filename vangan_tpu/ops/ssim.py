"""3-D SSIM loss map.

Re-derivation of the reference's hand-rolled 3-D SSIM (loss_functions.py:87-117)
for TPU: the reference materialises a dense ``k^3`` Gaussian kernel and runs a
single 3-D convolution per moment; since the kernel is an outer product of 1-D
Gaussians, we run three 1-D convolutions instead (identical math, ``3k`` vs
``k^3`` MACs/voxel — bandwidth-bound and XLA-fusable on TPU).

Semantics preserved exactly: zero 'SAME' padding, filter_size=3, sigma=1.5,
k1=0.01, k2=0.03, returns the per-voxel ``1 - SSIM`` map.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    """1-D Gaussian taps, normalised to sum 1 (loss_functions.py:89-92).

    Uses the reference's grid ``range(-size // 2 + 1, size // 2 + 1)`` — note
    the floor division of the *negated* size ((-3)//2 = -2), giving [-1, 0, 1]
    for size=3.
    """
    grid = np.arange((-size) // 2 + 1, size // 2 + 1, dtype=np.float32)
    g = np.exp(-0.5 * (grid / sigma) ** 2) / (sigma * np.sqrt(2.0 * np.pi))
    return (g / g.sum()).astype(np.float32)


def _blur3d(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable 3-D blur of a (B, X, Y, Z, C) tensor with zero 'SAME' padding.

    Channels are treated independently (the reference's C=1 conv3d generalised
    depthwise via feature_group_count).
    """
    k = taps.shape[0]
    c = x.shape[-1]
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, k, k, k), ("NXYZC", "OIXYZ", "NXYZC"))
    for axis in range(3):
        shape = [1, 1, 1, 1, 1]
        shape[2 + axis] = k
        kern = jnp.asarray(taps, x.dtype).reshape(shape)
        kern = jnp.tile(kern, (c, 1, 1, 1, 1))  # (C, 1, kx, ky, kz) depthwise
        x = lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1, 1),
            padding="SAME",
            dimension_numbers=dn,
            feature_group_count=c,
        )
    return x


def ssim3d_loss_map(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 3,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-voxel ``1 - SSIM`` between two (B, X, Y, Z, C) tensors (loss_functions.py:87-117)."""
    taps = _gaussian_kernel(filter_size, filter_sigma)
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)

    mu_true = _blur3d(y_true, taps)
    mu_pred = _blur3d(y_pred, taps)
    mu_true_sq = mu_true**2
    mu_pred_sq = mu_pred**2
    mu_true_pred = mu_true * mu_pred

    sigma_true_sq = _blur3d(y_true**2, taps) - mu_true_sq
    sigma_pred_sq = _blur3d(y_pred**2, taps) - mu_pred_sq
    sigma_true_pred = _blur3d(y_true * y_pred, taps) - mu_true_pred

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    ssim_map = (2 * mu_true_pred + c1) * (2 * sigma_true_pred + c2) / (
        (mu_true_sq + mu_pred_sq + c1) * (sigma_true_sq + sigma_pred_sq + c2)
    )
    return 1.0 - ssim_map
