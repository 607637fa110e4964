"""EXPERIMENTAL: CXYZ-layout Pallas 3-D convolution (round-2 layout engine).

Motivation (docs/PERF.md): channels-last 3-D convs at C=16 run at ~1.4% MXU on
TPU because XLA pads the 16-channel minor dim to 128 lanes in every
materialised tensor. This kernel operates on the **(B, X, C, Y, Z)** layout —
sublanes=Y, lanes=Z, channels as an outer dim — where tensors tile with zero
padding for ANY channel count.

Formulation: out[z] = sum_k w_k * x[z+k-1] splits into three z-groups. Per
(x, y-block) ONE (Co x 9Ci) @ (9Ci x yb*Z) MXU matmul per group (the 9 (dx,dy)
taps are direct slices of the VMEM slab — no transposes, no lane shifts), and
the k=0/2 group results are z-shifted by multiplying with a constant 128x128
shift matrix (also MXU work — Mosaic's lane rotate/offset-concat paths are
broken on this toolchain, see the git history of this file).

Status: forward-only prototype, NOT wired into the models (that requires the
full layout engine: all ops in CXYZ + dgrad/wgrad kernels — docs/ROADMAP.md).
Math verified in interpret mode; see tests/test_pallas_tpu.py::TestConvCXYZ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _shift_matrix(z: int, s: int, dtype) -> jnp.ndarray:
    """S with S[i, j] = 1 iff i == j + s, so (R @ S)[., j] = R[., j + s]."""
    rows = lax.broadcasted_iota(jnp.int32, (z, z), 0)
    cols = lax.broadcasted_iota(jnp.int32, (z, z), 1)
    return (rows == cols + s).astype(dtype)


def _conv_kernel(x_hbm, w_ref, out_ref, x_vmem, sem, *, xb: int, yb: int, ci: int, co: int):
    """One grid step: (xb output rows) x (yb y-columns) of the output.

    x_hbm: (B, X+2, Ci, Y+2, Z) — X and Y pre-padded with zeros by 1.
    w_ref: (3, Co, 9*Ci) in VMEM — one (Co, 9Ci) block per z-tap k.
    out:   blocked (1, xb, Co, yb, Z).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # per-x-row DMAs: a single copy with a strided slice *between* full dims
    # (at[b, ds, :, ds]) faults the TPU worker on this toolchain. The y slice
    # must be sublane-aligned: start j*yb (yb % 8 == 0) and size rounded up to
    # a multiple of 8 (the input is y-overpadded so the read stays in bounds).
    ys = ((yb + 2 + 7) // 8) * 8
    copies = [
        pltpu.make_async_copy(
            x_hbm.at[b, i * xb + r, slice(None), pl.ds(j * yb, ys)],
            x_vmem.at[r],
            sem,
        )
        for r in range(xb + 2)
    ]
    for c in copies:
        c.start()
        c.wait()
    slab = x_vmem[:]  # (xb+2, Ci, yb+2, Z)
    z = slab.shape[-1]
    w = w_ref[:]  # (3, Co, 9*Ci)

    s_minus = _shift_matrix(z, -1, jnp.float32)
    s_plus = _shift_matrix(z, 1, jnp.float32)

    for xo in range(xb):
        taps = []
        for dx in range(3):
            row = slab[xo + dx]  # (Ci, yb+2, Z)
            for dy in range(3):
                taps.append(row[:, dy : dy + yb])  # (Ci, yb, Z)
        p9 = jnp.stack(taps, axis=0).reshape(9 * ci, yb * z)  # (9Ci, yb*Z)

        # out[z] = R0[z-1] + R1[z] + R2[z+1]   (Rk = W_k @ P9)
        r0 = jnp.dot(w[0], p9, preferred_element_type=jnp.float32).reshape(co * yb, z)
        r1 = jnp.dot(w[1], p9, preferred_element_type=jnp.float32).reshape(co * yb, z)
        r2 = jnp.dot(w[2], p9, preferred_element_type=jnp.float32).reshape(co * yb, z)
        o = (
            jnp.dot(r0, s_minus, preferred_element_type=jnp.float32)
            + r1
            + jnp.dot(r2, s_plus, preferred_element_type=jnp.float32)
        )
        out_ref[0, xo] = o.reshape(co, yb, z).astype(out_ref.dtype)


def conv3d_cxyz(x: jnp.ndarray, w: jnp.ndarray, xb: int = 8, yb: int = 8) -> jnp.ndarray:
    """3^3 stride-1 SAME conv in the (B, X, C, Y, Z) layout.

    x: (B, X, Ci, Y, Z); w: (3, 3, 3, Ci, Co). Returns (B, X, Co, Y, Z).
    Requires Z % 128 == 0, X % xb == 0, Y % yb == 0.
    """
    b, xdim, ci, ydim, z = x.shape
    co = w.shape[-1]
    if not _HAS_PALLAS:
        raise RuntimeError("Pallas unavailable")
    # y over-padded so the sublane-aligned (rounded-up) slab reads stay in
    # bounds for the last y-block
    ys = ((yb + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, ys - 1), (0, 0)))
    # w (dx, dy, dz, ci, co) -> (dz, co, (dx*3+dy)*ci) to match the kernel's P9
    w3 = jnp.transpose(w, (2, 4, 0, 1, 3)).reshape(3, co, 9 * ci).astype(x.dtype)

    kernel = functools.partial(_conv_kernel, xb=xb, yb=yb, ci=ci, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, xdim // xb, ydim // yb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, xb, co, yb, z), lambda bi, i, j: (bi, i, 0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, xdim, co, ydim, z), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((xb + 2, ci, ((yb + 2 + 7) // 8) * 8, z), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w3)


def conv3d_cxyz_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA reference for parity: same CXYZ in/out, conv via NXYZC transpose."""
    xl = jnp.transpose(x, (0, 1, 3, 4, 2))  # -> (B, X, Y, Z, Ci)
    dn = lax.conv_dimension_numbers(xl.shape, w.shape, ("NXYZC", "XYZIO", "NXYZC"))
    y = lax.conv_general_dilated(xl, w.astype(xl.dtype), (1, 1, 1), "SAME",
                                 dimension_numbers=dn)
    return jnp.transpose(y, (0, 1, 4, 2, 3))
