"""Segmentation evaluation metrics: Dice and clDice.

The reference repo ships no quantitative evaluation (SURVEY.md §4); its paper
reports Dice/clDice on the paired synthetic dataset. These are the standard
binary definitions used for that comparison, plus a volume-level evaluation
helper for stitched predictions.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vangan_tpu.ops.morphology import soft_skel


def dice_coefficient(y_true: np.ndarray, y_pred: np.ndarray, smooth: float = 1.0) -> float:
    """Binary Dice coefficient (higher is better)."""
    t = np.asarray(y_true, dtype=np.float64).ravel()
    p = np.asarray(y_pred, dtype=np.float64).ravel()
    inter = float((t * p).sum())
    return (2.0 * inter + smooth) / (t.sum() + p.sum() + smooth)


def _skeletonize(binary: np.ndarray, iters: int = 15) -> np.ndarray:
    """Morphological skeleton via the (jitted) soft-skeleton on binary input.

    Accepts bare 3-D volumes or 2-D images (wrapped to the batched
    channels-last rank the morphology ops dispatch on) as well as
    already-batched rank-4/5 tensors."""
    wrap = binary.ndim in (2, 3)
    v = jnp.asarray(binary, jnp.float32)
    if wrap:
        v = v[None, ..., None]
    out = np.asarray(jax.jit(lambda a: soft_skel(a, iters))(v))
    return out[0, ..., 0] if wrap else out


def cldice_metric(
    y_true: np.ndarray, y_pred: np.ndarray, iters: int = 15, smooth: float = 1.0
) -> float:
    """Centre-line Dice score (Shit et al.): harmonic mean of topology
    precision (skeleton of prediction inside truth) and sensitivity
    (skeleton of truth inside prediction). Higher is better."""
    t = np.asarray(y_true, dtype=np.float32)
    p = np.asarray(y_pred, dtype=np.float32)
    skel_p = _skeletonize(p, iters)
    skel_t = _skeletonize(t, iters)
    tprec = (float((skel_p * t).sum()) + smooth) / (float(skel_p.sum()) + smooth)
    tsens = (float((skel_t * p).sum()) + smooth) / (float(skel_t.sum()) + smooth)
    return 2.0 * tprec * tsens / (tprec + tsens)


def binarise_prediction(pred: np.ndarray, threshold: Optional[float] = None) -> np.ndarray:
    """Binarise a stitched uint8/float prediction volume. Default threshold:
    midpoint of the value range (tanh output stitched to 0..255 -> 127.5)."""
    pred = np.asarray(pred, dtype=np.float32)
    if threshold is None:
        threshold = 0.5 * (float(pred.max()) + float(pred.min()))
    return (pred >= threshold).astype(np.float32)


def evaluate_segmentation(
    pred: np.ndarray, truth: np.ndarray, threshold: Optional[float] = None, iters: int = 15
) -> Dict[str, float]:
    """Dice + clDice of a (stitched) prediction against a ground-truth volume.

    ``truth`` may be in {-1, 1} (the preprocessed segmentation domain) or
    {0, 1}; it is mapped to {0, 1}.
    """
    t = np.asarray(truth, dtype=np.float32)
    t = (t > 0.5 * (t.max() + t.min())).astype(np.float32)
    p = binarise_prediction(pred, threshold)
    if p.shape != t.shape:
        raise ValueError(f"shape mismatch: pred {p.shape} vs truth {t.shape}")
    return {
        "dice": dice_coefficient(t, p),
        "cldice": cldice_metric(t, p, iters=iters),
    }
