"""Fused Pallas TPU kernels for the clDice soft skeleton (forward AND backward).

Motivation (measured on v5e, batch-3 128^3, 15 iterations):
- XLA ``reduce_window`` formulation: ~1.27 s forward — pathological, because
  the channels-last C=1 tensor puts a singleton in the lane dimension (127/128
  lanes idle), and the pool gradients lower to select_and_scatter (seconds).
- These kernels: ~10 ms forward (bit-exact vs XLA), same-order backward. The
  (X, Y, Z) layout puts Z=128 in lanes and Y in sublanes.

Formulation — the reference loop (clDice_func.py:60-80) re-indexed as
``iters+1`` *uniform rounds* (t = 0..iters, ``img_0`` = input, ``skel_-1`` = 0):

    delta_t    = relu(img_t - open(img_t))        open = dilate(erode(.))
    skel_t     = skel_{t-1} + relu(delta_t - skel_{t-1} * delta_t)
    img_{t+1}  = erode(img_t)

One fused kernel evaluates a whole round on an X-slab held in VMEM:
erode/dilate become shifted min/max chains (VPU ops), so a round is 2 HBM
reads + 2 writes per voxel instead of ~14 pool passes.

Halo arithmetic: ``open`` chains two radius-1 windows, so the forward needs an
X-halo of 2 (the ``img`` input is DMA'd manually with halo; ``skel`` is
elementwise and uses ordinary blocking). The backward computes each slab's
complete input-cotangents directly: outputs within ±2 rows of the interior
contribute, so it loads ``img`` with halo 4 and the output cotangents with
halo 2 (zero-padded) and runs ``jax.vjp`` of the slab-local round — no
cross-slab scatter needed.

Boundary semantics: out-of-volume rows hold ``+BIG`` so they never win a min;
before the dilation the eroded field is masked to ``-BIG`` outside the volume
so the max ignores it — exactly TF 'SAME' pooling ignore-semantics
(big finite values instead of inf keep the backward free of inf-inf NaNs).

Gradient notes: min/max tie-breaking follows JAX's elementwise convention
(ties split evenly), vs XLA reduce_window / TF pooling which route to the
first extremum. Both are valid subgradients of the same loss; values are
identical, gradients differ only on exactly-tied voxels.

Residuals: the backward replays each round from stored per-round
(img_t, skel_{t-1}) stacks — 2*(iters+1) volumes of HBM; fine at training
sizes (~1 GB at batch-3 128^3 f32, 16 GB HBM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # Pallas lowering requires a TPU backend; import guarded for CPU envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from vangan_tpu.ops.morphology import soft_skel

_BIG = 1e30  # out-of-volume sentinel: never wins a min, masked before the max
_HF = 2      # forward img halo: open() chains two radius-1 windows
_HB = 4      # backward img halo: extended outputs (+-2) need img +-4


def _shift_min(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """3-window min along ``axis``; out-of-range ignored (+BIG edge)."""
    edge = jnp.full_like(lax.slice_in_dim(a, 0, 1, axis=axis), _BIG)
    lo = jnp.concatenate([edge, lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), edge], axis=axis)
    return jnp.minimum(a, jnp.minimum(lo, hi))


def _shift_max(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    edge = jnp.full_like(lax.slice_in_dim(a, 0, 1, axis=axis), -_BIG)
    lo = jnp.concatenate([edge, lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), edge], axis=axis)
    return jnp.maximum(a, jnp.maximum(lo, hi))


def _erode_local(v: jnp.ndarray) -> jnp.ndarray:
    """soft_erode: min of directional pools (3,3,1), (3,1,3), (1,3,3) over
    (X, Y, Z) (clDice_func.py:23-26)."""
    p1 = _shift_min(_shift_min(v, 0), 1)
    p2 = _shift_min(_shift_min(v, 0), 2)
    p3 = _shift_min(_shift_min(v, 1), 2)
    return jnp.minimum(p1, jnp.minimum(p2, p3))


def _dilate_local(v: jnp.ndarray) -> jnp.ndarray:
    """3^3 max-pool (clDice_func.py:42)."""
    return _shift_max(_shift_max(_shift_max(v, 0), 1), 2)


def _local_round(img: jnp.ndarray, skel: jnp.ndarray, in_volume: jnp.ndarray):
    """One uniform skeleton round on a slab. ``in_volume`` masks the eroded
    field to -BIG outside the volume so the dilation ignores it."""
    e = _erode_local(img)
    opened = _dilate_local(jnp.where(in_volume, e, -_BIG))  # open(img) = dilate(erode(img))
    delta = jnp.maximum(img - opened, 0.0)
    new_skel = skel + jnp.maximum(delta - skel * delta, 0.0)
    return e, new_skel


# --- forward kernel ---


def _fwd_kernel(img_hbm, skel_ref, img_out_ref, skel_out_ref, img_vmem, sem,
                *, xb: int, x_total: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(img_hbm.at[b, pl.ds(i * xb, xb + 2 * _HF)], img_vmem, sem)
    copy.start()
    copy.wait()

    img = img_vmem[:]  # (xb + 2*_HF, Y, Z); stored array is +BIG-padded by _HF
    row_g = i * xb - _HF + lax.broadcasted_iota(jnp.int32, img.shape, 0)
    in_volume = (row_g >= 0) & (row_g < x_total)

    # skel slab: elementwise — only the interior matters; pad to slab rows
    zrows = jnp.zeros((_HF,) + img.shape[1:], img.dtype)
    skel = jnp.concatenate([zrows, skel_ref[0], zrows], axis=0)

    e, new_skel = _local_round(img, skel, in_volume)
    interior = slice(_HF, _HF + xb)
    img_out_ref[0] = e[interior]
    skel_out_ref[0] = new_skel[interior]


def _round_fwd(imgp: jnp.ndarray, skel: jnp.ndarray, xb: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused round: (B, X+2*_HF, Y, Z) padded img + (B, X, Y, Z) skel ->
    (next padded img, next skel)."""
    b, xp, y, z = imgp.shape
    x = xp - 2 * _HF
    kernel = functools.partial(_fwd_kernel, xb=xb, x_total=x)
    img_o, skel_o = pl.pallas_call(
        kernel,
        grid=(b, x // xb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, xb, y, z), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xb, y, z), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xb, y, z), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, x, y, z), imgp.dtype),
            jax.ShapeDtypeStruct((b, x, y, z), skel.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((xb + 2 * _HF, y, z), imgp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(imgp, skel)
    return _pad_big(img_o, _HF), skel_o


# --- backward kernel ---


def _bwd_kernel(img_hbm, skel_hbm, dimg_hbm, dskel_hbm, dimg_out_ref, dskel_out_ref,
                img_vmem, skel_vmem, g_img_vmem, g_skel_vmem, sems,
                *, xb: int, yb: int, x_total: int, y_total: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    xs = xb + 2 * _HB
    ys = yb + 2 * _HB

    copies = [
        pltpu.make_async_copy(img_hbm.at[b, pl.ds(i * xb, xs), pl.ds(j * yb, ys)],
                              img_vmem, sems.at[0]),
        pltpu.make_async_copy(skel_hbm.at[b, pl.ds(i * xb, xs), pl.ds(j * yb, ys)],
                              skel_vmem, sems.at[1]),
        pltpu.make_async_copy(dimg_hbm.at[b, pl.ds(i * xb, xs), pl.ds(j * yb, ys)],
                              g_img_vmem, sems.at[2]),
        pltpu.make_async_copy(dskel_hbm.at[b, pl.ds(i * xb, xs), pl.ds(j * yb, ys)],
                              g_skel_vmem, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    img = img_vmem[:]
    skel = skel_vmem[:]
    row_g = i * xb - _HB + lax.broadcasted_iota(jnp.int32, img.shape, 0)
    col_g = j * yb - _HB + lax.broadcasted_iota(jnp.int32, img.shape, 1)
    in_volume = (row_g >= 0) & (row_g < x_total) & (col_g >= 0) & (col_g < y_total)
    # cotangents are valid (and were zero-padded) on the +-_HF extended rows;
    # zero anything beyond so invalid extended outputs cannot contribute
    g_valid = (
        (row_g >= i * xb - _HF) & (row_g < i * xb + xb + _HF)
        & (col_g >= j * yb - _HF) & (col_g < j * yb + yb + _HF)
        & in_volume
    )
    g_img = jnp.where(g_valid, g_img_vmem[:], 0.0)
    g_skel = jnp.where(g_valid, g_skel_vmem[:], 0.0)

    _, vjp_fn = jax.vjp(lambda a, s: _local_round(a, s, in_volume), img, skel)
    d_img, d_skel = vjp_fn((g_img, g_skel))
    inx = slice(_HB, _HB + xb)
    iny = slice(_HB, _HB + yb)
    dimg_out_ref[0] = d_img[inx, iny]
    dskel_out_ref[0] = d_skel[inx, iny]


def _round_bwd(img_p4: jnp.ndarray, skel_p4: jnp.ndarray, dimg_p4: jnp.ndarray,
               dskel_p4: jnp.ndarray, xb: int, yb: int, x: int, y: int):
    """Backward of one round. All inputs padded by _HB along X and Y
    (img: +BIG, skel/cotangents: zeros). Returns interior (B, X, Y, Z) grads."""
    b, _, _, z = img_p4.shape
    kernel = functools.partial(_bwd_kernel, xb=xb, yb=yb, x_total=x, y_total=y)
    slab = (xb + 2 * _HB, yb + 2 * _HB, z)
    d_img, d_skel = pl.pallas_call(
        kernel,
        grid=(b, x // xb, y // yb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, xb, yb, z), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xb, yb, z), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, x, y, z), img_p4.dtype),
            jax.ShapeDtypeStruct((b, x, y, z), img_p4.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(slab, img_p4.dtype),
            pltpu.VMEM(slab, img_p4.dtype),
            pltpu.VMEM(slab, img_p4.dtype),
            pltpu.VMEM(slab, img_p4.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(img_p4, skel_p4, dimg_p4, dskel_p4)
    return d_img, d_skel


# --- padding helpers ---


def _pad_big(a: jnp.ndarray, h: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (h, h), (0, 0), (0, 0)), constant_values=_BIG)


def _pad_zero(a: jnp.ndarray, h: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (h, h), (0, 0), (0, 0)))


def _pad_big_xy(a: jnp.ndarray, h: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (h, h), (h, h), (0, 0)), constant_values=_BIG)


def _pad_zero_xy(a: jnp.ndarray, h: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (h, h), (h, h), (0, 0)))


# --- public op ---


_YB = 16  # backward Y block


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _supported(img: jnp.ndarray, xb: int) -> bool:
    if not _HAS_PALLAS or not _on_tpu() or img.ndim != 5 or img.shape[-1] != 1:
        return False
    _, x, y, z, _ = img.shape
    return x % xb == 0 and z % 128 == 0 and y % _YB == 0


def _forward_scan(img: jnp.ndarray, iters: int, xb: int, collect: bool = True):
    """Run iters+1 uniform rounds; with ``collect`` returns per-round residual
    stacks (img_t interior, skel_{t-1} interior) for the backward."""
    v = img[..., 0]
    b, x, y, z = v.shape

    def body(carry, _):
        imgp, skel = carry
        res = (imgp[:, _HF : _HF + x], skel) if collect else None
        new = _round_fwd(imgp, skel, xb)
        return new, res

    (_, skel_f), stacks = lax.scan(
        body, (_pad_big(v, _HF), jnp.zeros_like(v)), None, length=iters + 1
    )
    return skel_f, stacks


def _soft_skel_fwd_value(img: jnp.ndarray, iters: int, xb: int) -> jnp.ndarray:
    skel_f, _ = _forward_scan(img, iters, xb, collect=False)
    return skel_f[..., None]


def soft_skel_pallas_nograd(img: jnp.ndarray, iters: int, xb: int = 8) -> jnp.ndarray:
    """Forward-only fused skeleton: no residual stacks are ever materialised.

    For skeletons of *data* tensors (the ground-truth side of clDice), whose
    gradient is never requested — saves 2*(iters+1) volume stacks of HBM.
    """
    if not _supported(img, xb):
        return soft_skel(lax.stop_gradient(img), iters)
    return _soft_skel_fwd_value(lax.stop_gradient(img), iters, xb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def soft_skel_pallas(img: jnp.ndarray, iters: int, xb: int = 8) -> jnp.ndarray:
    """soft_skel (clDice_func.py:60-80) with fused Pallas forward + backward.

    Value-identical to ops.morphology.soft_skel; falls back to the XLA path
    off-TPU or for unsupported shapes (needs C=1, X % xb == 0, Z % 128 == 0,
    Y % 8 == 0).
    """
    if not _supported(img, xb):
        return soft_skel(img, iters)
    return _soft_skel_fwd_value(img, iters, xb)


def _vjp_fwd(img, iters, xb):
    if not _supported(img, xb):
        out, pullback = jax.vjp(lambda a: soft_skel(a, iters), img)
        return out, (None, pullback)
    skel_f, stacks = _forward_scan(img, iters, xb)
    return skel_f[..., None], (stacks, None)


def _vjp_bwd(iters, xb, residuals, g):
    stacks, pullback = residuals
    if stacks is None:
        return pullback(g)
    img_stack, skel_stack = stacks  # (T, B, X, Y, Z) round inputs
    t_total, b, x, y, z = img_stack.shape
    g_skel0 = g[..., 0]

    def body(carry, res):
        d_img_next, d_skel_next = carry
        img_t, skel_t = res
        d_img, d_skel = _round_bwd(
            _pad_big_xy(img_t, _HB),
            _pad_zero_xy(skel_t, _HB),
            _pad_zero_xy(d_img_next, _HB),
            _pad_zero_xy(d_skel_next, _HB),
            min(4, xb),
            _YB,
            x,
            y,
        )
        return (d_img, d_skel), None

    init = (jnp.zeros((b, x, y, z), g_skel0.dtype), g_skel0)
    (d_img0, _), _ = lax.scan(body, init, (img_stack, skel_stack), reverse=True)
    return (d_img0[..., None],)


soft_skel_pallas.defvjp(_vjp_fwd, _vjp_bwd)
