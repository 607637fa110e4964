"""Sliding-window full-volume inference with overlap averaging.

Re-derivation of the reference's ``GanMonitor.stitch_subvolumes``
(custom_callback.py:47-223) with a TPU-shaped execution model: instead of one
device call per patch (custom_callback.py:174), all patch origins are
enumerated up front and the generator runs over fixed-size *batches* of
patches in a single jitted function (one compile, MXU-efficient batch dim);
accumulation into the output and coverage buffers happens host-side in
float32.

Grid parity: origins reproduce the reference's clamped walk exactly —
``dim_out+1`` steps per axis with starts clamped to ``L-k``
(custom_callback.py:127-190), *including* the duplicate final origins the
clamping produces (they bias the overlap average exactly as the reference
does). Symmetric padding (padFactor), 10% border trim, and the min-max x255
output scaling are preserved.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from vangan_tpu.ops.norms import min_max_norm_np


def _axis_origins(length: int, k: int, stride: int) -> List[int]:
    """The reference's clamped origin walk for one axis (custom_callback.py:127-190).

    dim_out = floor((L-k)/s) + 1; the loop runs dim_out+1 times with the start
    clamped to L-k, so the final origin may repeat.
    """
    dim_out = int(np.floor((length - k) / stride + 1))
    origins = []
    start = 0
    for _ in range(dim_out + 1):
        if start > length - k:
            start = length - k
        origins.append(start)
        start += stride
    return origins


def stitch_origins(shape: Sequence[int], subvol: Sequence[int], stride: Sequence[int]):
    """All (x, y, z) patch origins in reference walk order."""
    ox = _axis_origins(shape[0], subvol[0], stride[0])
    oy = _axis_origins(shape[1], subvol[1], stride[1])
    oz = _axis_origins(shape[2], subvol[2], stride[2])
    return [(i, j, k) for i in ox for j in oy for k in oz]


def _gaussian_window(shape: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian patch weighting for overlap blending.

    Down-weights patch borders smoothly (sigma = sigma_scale * dim), removing
    stitching seams without the reference's hard 10% border cut. Weights are
    floored at 1e-3 so coverage never vanishes.
    """
    ws = []
    for n in shape:
        x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
        w = np.exp(-0.5 * (x / (sigma_scale * n)) ** 2)
        ws.append(w)
    w3 = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    return np.maximum(w3, 1e-3).astype(np.float32)[..., None]


def _minmax_patch(arr: np.ndarray) -> np.ndarray:
    """Per-patch min-max to [-1, 1] (the reference's process_imaging_domain call
    with axis=None, custom_callback.py:171-172 -> main.py:169-177)."""
    mn, mx = float(arr.min()), float(arr.max())
    if mx - mn == 0:
        return np.zeros_like(arr)
    return 2.0 * (arr - mn) / (mx - mn) - 1.0


def stitch_subvolumes(
    gen: Callable[[np.ndarray], np.ndarray],
    img: np.ndarray,
    subvol_size: Sequence[int],
    epoch: int = -1,
    stride: Tuple[int, int, int] = (25, 25, 128),
    name: Optional[str] = None,
    output_path: Optional[str] = None,
    complete: bool = False,
    padFactor: float = 0.25,
    border_removal: bool = True,
    process_img: bool = False,
    model_path: str = ".",
    batch_size: int = 8,
    save: bool = True,
    blend: str = "uniform",  # 'uniform' (reference parity) | 'gaussian'
) -> np.ndarray:
    """Predict a full volume by strided sliding-window stitching.

    ``gen`` maps a float32 batch ``(B, kx, ky, kz, C)`` to predictions of the
    same spatial shape (jit once outside). ``subvol_size`` follows the
    reference convention ``(GB, kx, ky, kz, C)`` (INPUT_IMG_SIZE,
    custom_callback.py:110). Returns the stitched volume; optionally writes the
    reference-layout TIFF.

    ``blend='gaussian'`` replaces the uniform overlap average with smooth
    Gaussian patch weighting (no hard border cut) — an extension beyond the
    reference for seam-free stitching.
    """
    img = np.asarray(img, dtype=np.float32)
    if img.ndim != 4:
        raise ValueError(f"expected (X, Y, Z, C) volume, got shape {img.shape}")

    oimgshape = img.shape
    xspacing = yspacing = zspacing = 0
    if complete:
        xspacing = int(padFactor * img.shape[0])
        yspacing = int(padFactor * img.shape[1])
        if stride[2] == 1:
            img = np.pad(img, ((xspacing, xspacing), (yspacing, yspacing), (0, 0), (0, 0)),
                         "symmetric")
        else:
            zspacing = int(padFactor * img.shape[2])
            img = np.pad(
                img,
                ((xspacing, xspacing), (yspacing, yspacing), (zspacing, zspacing), (0, 0)),
                "symmetric",
            )

    H, W, D, C = img.shape
    kH, kW, kD = subvol_size[1], subvol_size[2], subvol_size[3]

    if not complete or not border_removal or blend == "gaussian":
        pH = pW = pD = 0
    else:
        pH, pW, pD = int(0.1 * kH), int(0.1 * kW), int(0.1 * kD)
        if kD == D:
            pD = 0
    weight = _gaussian_window((kH, kW, kD)) if blend == "gaussian" else None

    pix_tracker = np.zeros([H, W, D, C], dtype="float32")
    pred = np.zeros(img.shape, dtype="float32")

    origins = stitch_origins((H, W, D), (kH, kW, kD), stride)
    if complete:
        print(f"\tImage size (X,Y,Z,C): {oimgshape}")
        print(f"\tImage size w/ padding (X,Y,Z,C): {(H, W, D, C)}")
        print(f"\tSampling patch size (X,Y,Z,C): {(kH, kW, kD, 1)}")
        print(f"\tBorder artefact removal pixel width (X,Y,Z): ({pH}, {pW}, {pD})")
        print(f"\tStride pixel length (X,Y,Z): {tuple(stride)}")
        print(f"\tNo. of patches: {len(origins)}")

    # batched evaluation: pad the final group to batch_size so the jitted
    # generator sees ONE shape (single compile)
    for g0 in range(0, len(origins), batch_size):
        group = origins[g0 : g0 + batch_size]
        patches = np.stack(
            [img[i : i + kH, j : j + kW, k : k + kD] for (i, j, k) in group]
        )
        if process_img:
            patches = np.stack([_minmax_patch(p) for p in patches])
        n_valid = patches.shape[0]
        if n_valid < batch_size:
            pad = np.repeat(patches[-1:], batch_size - n_valid, axis=0)
            patches = np.concatenate([patches, pad], axis=0)
        out = np.asarray(gen(patches), dtype=np.float32)[:n_valid]
        for (i, j, k), arr in zip(group, out):
            if weight is not None:
                pred[i : i + kH, j : j + kW, k : k + kD] += arr * weight
                pix_tracker[i : i + kH, j : j + kW, k : k + kD] += weight
            else:
                arr = arr[pH : kH - pH, pW : kW - pW, pD : kD - pD]
                pred[i + pH : i + kH - pH, j + pW : j + kW - pW, k + pD : k + kD - pD] += arr
                pix_tracker[i + pH : i + kH - pH, j + pW : j + kW - pW, k + pD : k + kD - pD] += 1.0

    # 0/0 -> NaN in never-covered voxels (only inside the symmetric padding
    # margin, cropped away below) — same semantics as the reference
    # (custom_callback.py:192); silence the expected warning.
    with np.errstate(invalid="ignore", divide="ignore"):
        pred = np.true_divide(pred, pix_tracker)

    if complete:
        if stride[2] == 1:
            pred = pred[xspacing : oimgshape[0] + xspacing, yspacing : oimgshape[1] + yspacing]
        else:
            pred = pred[
                xspacing : oimgshape[0] + xspacing,
                yspacing : oimgshape[1] + yspacing,
                zspacing : oimgshape[2] + zspacing,
            ]

    pred = 255 * min_max_norm_np(pred)
    if not complete:
        pred = pred.astype("uint8")

    if save:
        from vangan_tpu.data.preprocess import write_tiff

        if not complete:
            out_file = os.path.join(model_path, f"e{epoch + 1}_{name}.tiff")
        else:
            out_file = os.path.join(output_path or ".", f"{name}.tiff")
        # TIFF layout (z, x, y, c) like the reference (custom_callback.py:213-223)
        write_tiff(out_file, np.transpose(pred, (2, 0, 1, 3)))
    return pred
