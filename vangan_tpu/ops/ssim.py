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


def _shift_blur_axis(x: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D 'SAME' zero-padded FIR along ``axis`` via shifted adds.

    Pure VPU elementwise work — avoids conv3d calls on C=1 tensors, which on
    TPU relayout with the singleton channel in lanes (127/128 idle)."""
    k = taps.shape[0]
    r = k // 2
    n = x.shape[axis]
    acc = None
    for t in range(k):
        off = t - r  # contribution of x[i+off] with weight taps[t]
        lo, hi = max(0, off), min(n, n + off)
        sl = lax.slice_in_dim(x, lo, hi, axis=axis)
        pad_lo = max(0, -off)
        pad_hi = n - (hi - lo) - pad_lo
        cfg = [(0, 0, 0)] * x.ndim
        cfg[axis] = (pad_lo, pad_hi, 0)
        term = lax.pad(sl, jnp.asarray(0.0, x.dtype), cfg) * float(taps[t])
        acc = term if acc is None else acc + term
    return acc


def _blur3d(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable N-D blur of a channels-last tensor with zero 'SAME' padding.

    Implemented as shifted adds per axis (identical math to the reference's
    dense conv3d, loss_functions.py:100-108): 3 taps x N axes of elementwise
    work; trailing C=1 is squeezed so the minor dim stays lane-sized. Handles
    5-D (B, X, Y, Z, C) volumes and 4-D (B, H, W, C) images (DIMENSIONS=2 —
    the reference's 2-D mode would crash here, its SSIM is conv3d-only)."""
    squeeze = x.shape[-1] == 1
    v = x[..., 0] if squeeze else x
    n_spatial = x.ndim - 2
    for axis in range(1, 1 + n_spatial):
        v = _shift_blur_axis(v, taps, axis)
    return v[..., None] if squeeze else v


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
