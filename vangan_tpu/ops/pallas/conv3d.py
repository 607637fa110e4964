"""CXYZ-layout Pallas 3-D convolution family (forward, dgrad, wgrad).

Motivation (docs/PERF.md): channels-last 3-D convs at C in {1,16,32} run at
~1.4% MXU on TPU because XLA pads the small channel minor dim to 128 lanes in
every materialised tensor. These kernels operate on the **(B, X, C, Y, Z)**
layout — sublanes=Y, lanes=Z, channels as an outer dim — where tensors tile
with zero padding for ANY channel count. This is the round-2 layout engine
(VERDICT.md item 1) that the reference never needed: its TF/CUDA backend is
channels-last-native (resunet_model.py / discriminator.py simply call Conv3D).

Formulation
-----------
For output x-row ``xo`` and an (x, y) output block, the kx*ky (dx, dy) taps are
direct (optionally strided — for stride-2) slices of a VMEM slab, stacked into
a patch matrix ``P`` of shape (kx*ky*Ci, yb*Z). Each z-tap is ONE MXU matmul
``R_dz = W_dz @ P``; z padding *and* z stride are folded into constant 0/1
select matrices ``S_dz`` with ``S_dz[i, j] = 1  iff  i == map(sz*j + dz - lo)``
(``map`` = identity for zero padding, index reflection for reflect padding;
out-of-range rows are simply absent). ``out = sum_dz R_dz @ S_dz`` — applied
as one stacked matmul, with the identity tap (stride 1, dz == lo) added
directly. Lane rotates / offset-slice concats do not lower on this toolchain
(see round-1 git history), which is why shifts are matmuls.

Gradients (custom_vjp on the core; x/y padding stays OUTSIDE the core so
``jnp.pad``'s own vjp handles zero/reflect fold-back):

- dgrad: parity decomposition of the transposed conv. For stride s, output
  parity p uses taps ``d = s*e + p`` — a *stride-1* conv of the cotangent with
  the flipped parity sub-kernel (ci/co swapped), z handled by the TRANSPOSED
  select stack (the vjp of a constant linear map). Sub-results interleave on
  the host. Stride 1 is the trivial single-parity case of the same code path.
- wgrad: per slab, ``dW_dz += (G @ S_dz^T)  x-contract  P`` via an A@B^T
  ``dot_general`` (MXU-native), accumulated across the sequential TPU grid in
  a constant-index f32 output block.

Supported: any kernel size, strides 1/2 per axis, zero/reflect padding, any
channel counts, any Z (lanes pad internally below 128). Output x/y dims are
computed over-sized to a block multiple and trimmed on the host.

Reference behaviours covered (capability, not translation): reflect-pad+VALID
convs (building_blocks.py:15-39 + every model conv), SAME convs, stride-2
encoders (resunet_model.py:103-143), 4^3 PatchGAN convs (discriminator.py:
46-121), 1^3 shortcuts/heads, 7^3 ResNet-generator stem (generator.py:34-40).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # Pallas lowering needs a TPU backend; import guarded for CPU envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Pad3 = Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]

_INTERPRET = False  # set True (or use force_interpret()) to run kernels interpreted


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return _INTERPRET or not _on_tpu()


def pallas_active() -> bool:
    """True when the Pallas conv kernels can execute: on TPU, or when tests
    force interpreter mode."""
    return _HAS_PALLAS and (_INTERPRET or _on_tpu())


class force_interpret:
    """Context manager: run the conv kernels in interpreter mode (tests)."""

    def __enter__(self):
        global _INTERPRET
        self._old = _INTERPRET
        _INTERPRET = True

    def __exit__(self, *a):
        global _INTERPRET
        _INTERPRET = self._old


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _norm_stride(stride, n_spatial: int = 3) -> Tuple[int, ...]:
    if isinstance(stride, int):
        return (stride,) * n_spatial
    return tuple(stride)


def _norm_padding(padding, k, stride, dims=None) -> Pad3:
    """'same' (TF SAME) / 'valid' / explicit ((lo,hi),)*3.

    With ``dims`` (the spatial input sizes) SAME pads are size-aware and exact
    for every dim/stride combination (TF semantics:
    total = (ceil(n/s)-1)*s + k - n). Without dims, the size-free formula
    max(k-s, 0) is only correct when each dim divides its stride — asserted,
    so an odd-dim strided 'same' conv fails loudly instead of silently
    diverging from the reference (ADVICE r2 #1).
    """
    if isinstance(padding, str):
        p = padding.lower()
        if p == "valid":
            return ((0, 0),) * len(k)
        if p == "same":
            pads = []
            for ax, (kk, ss) in enumerate(zip(k, stride)):
                if dims is not None:
                    n = dims[ax]
                    total = max((-(-n // ss) - 1) * ss + kk - n, 0)
                else:
                    assert ss == 1, (
                        "'same' with stride > 1 needs the input size to be "
                        "exact; pass explicit pads or call via ConvND"
                    )
                    total = max(kk - ss, 0)
                pads.append((total // 2, total - total // 2))
            return tuple(pads)
        raise ValueError(f"padding {padding!r}")
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _out_dim(n: int, k: int, s: int, lo: int, hi: int) -> int:
    return (n + lo + hi - k) // s + 1


# ---------------------------------------------------------------------------
# z select matrices
# ---------------------------------------------------------------------------


def _z_selects(kz: int, zin: int, zo: int, sz: int, lo: int, mode: str):
    """Per-z-tap select matrices: list of kz (zin, zo) 0/1 arrays with
    S_dz[i, j] = 1 iff i == map(sz*j + dz - lo)."""
    mats = []
    for dz in range(kz):
        s = np.zeros((zin, zo), np.float32)
        idx = sz * np.arange(zo) + dz - lo
        if mode == "reflect":
            idx = np.abs(idx)
            idx = np.where(idx >= zin, 2 * zin - 2 - idx, idx)
            if np.any((idx < 0) | (idx >= zin)):
                raise ValueError("reflect z padding wider than input")
            valid = np.ones(zo, bool)
        else:
            valid = (idx >= 0) & (idx < zin)
        s[idx[valid], np.arange(zo)[valid]] = 1.0
        mats.append(s)
    return mats


def _pad_selects(mats, zp: int):
    """Row-pad each (zin, zo) select to (zp, zo) (garbage lanes select zero)
    and split out the identity tap.

    In-kernel reshapes that cross the sublane/lane boundary only lower when
    the lane dim is 128-aligned (measured, this toolchain), so inputs are
    lane-padded to ``zp`` and the selects grow matching zero rows. Returns
    (identity_tap, rest, s_cat) with s_cat the (len(rest)*zp, zo) stack.
    """
    zin, zo = mats[0].shape
    padded = [np.pad(m, ((0, zp - zin), (0, 0))) for m in mats]
    identity_tap = None
    if zo == zp:
        for dz, s in enumerate(padded):
            if np.array_equal(s, np.eye(zp, dtype=np.float32)):
                identity_tap = dz
                break
    rest = [dz for dz in range(len(mats)) if dz != identity_tap]
    s_cat = np.concatenate([padded[dz] for dz in rest], axis=0) if rest else None
    return identity_tap, rest, s_cat


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _pack_w(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(kx,ky,kz,Ci,Co) -> (kz, Co, kx*ky*Ci), tap order (dx, dy) major, ci minor."""
    kx, ky, kz, ci, co = w.shape
    return jnp.transpose(w, (2, 4, 0, 1, 3)).reshape(kz, co, kx * ky * ci).astype(dtype)


def _pack_w_b(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(kx,ky,kz,Ci,Co) -> (kx, ky*kz*Co, Ci) for the B formulation."""
    kx, ky, kz, ci, co = w.shape
    return jnp.transpose(w, (0, 1, 2, 4, 3)).reshape(kx, ky * kz * co, ci).astype(dtype)


def _dot_precision(orig_dtype) -> lax.Precision:
    """Pin every kernel dot's precision so an ambient
    ``jax.default_matmul_precision`` context cannot change Mosaic lowering:
    HIGHEST on a bf16 dot fails to lower ('Could not open any log file'
    compile-helper abort, measured 2026-08-18), while DEFAULT on a true-f32
    dot silently runs bf16 passes (~1e-1 relative drift on
    cancellation-heavy gradients vs f32 passes). bf16-ORIGIN data gets
    DEFAULT — bf16 x bf16 -> f32 accumulation is exact single-pass, so
    DEFAULT == HIGHEST semantically there — and f32-origin data gets HIGHEST
    so f32 parity tests measure lowering fidelity, not dot rounding.
    ``orig_dtype`` is the dtype BEFORE any degenerate-K f32 workaround cast
    (cast-from-bf16 operands carry only bf16 information)."""
    return (lax.Precision.HIGHEST if orig_dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _safe_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU dot with f32 accumulation; degenerate bf16 dots (any of M/N/K < 8)
    hit a Mosaic mixed-precision lowering bug ('vector.broadcast' dtype
    mismatch in the vector-like path) — compute those in f32 (ADVICE r2 #2:
    this guard existed in form_b/wgrad but not the tap-form forward)."""
    m, k = a.shape
    n = b.shape[-1]
    prec = _dot_precision(a.dtype)
    if min(m, n, k) < 8 and a.dtype != jnp.float32:
        a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _db_enabled() -> bool:
    """Slab double-buffering kill-switch (on by default, round 3)."""
    return os.environ.get("VANGAN_CONV_DB", "1") != "0"


def _linear_step():
    """(t, total, next b/i/j) for the sequential 3-D grid — the manual
    double-buffer pipeline needs the lexicographic successor's indices."""
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb, nx, ny = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    t = (b * nx + i) * ny + j
    nxt = t + 1
    b2 = nxt // (nx * ny)
    r2 = lax.rem(nxt, nx * ny)
    i2 = r2 // ny
    j2 = lax.rem(r2, ny)
    return t, nb * nx * ny, b2, i2, j2


def _slab_pipeline(x_vmem, sem, make_copies, db: bool):
    """Issue/wait the per-step slab DMA with (optionally) one-step prefetch.

    ``make_copies(slot, bi, ii, jj)`` builds the step's copy descriptors.
    Grid dims are all "arbitrary" (sequential), so step t+1's slab can stream
    into the other buffer during step t's compute — the measured dominant gap
    to the kernels' MXU ceiling was per-block DMA latency (ROADMAP P0.2).
    Returns the slot index holding the current slab.
    """
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if not db:
        for c in make_copies(0, b, i, j):
            c.start()
        for c in make_copies(0, b, i, j):
            c.wait()
        return 0
    t, total, b2, i2, j2 = _linear_step()
    slot = lax.rem(t, 2)

    @pl.when(t == 0)
    def _warm():
        for c in make_copies(0, b, i, j):
            c.start()

    @pl.when(t + 1 < total)
    def _prefetch():
        for c in make_copies(1 - slot, b2, i2, j2):
            c.start()

    for c in make_copies(slot, b, i, j):
        c.wait()
    return slot


def _tap_matrix(x_vmem, slot, xo, *, xb, yb, k, stride, ci, zin):
    """Stack the kx*ky (dx, dy) tap slices for output row ``xo`` into the
    (kx*ky*Ci, yb*Zp) patch matrix ('tap' formulation; the xo loop is
    unrolled with the block size planned against the VMEM stack, _plan_xb).

    y-stride-2 taps parity-split the sublane dim via reshape (direct strided
    loads only lower for 32-bit data on this toolchain; reshape+index works
    for bf16 too).
    """
    kx, ky, _ = k
    sx, sy, _ = stride
    taps = []
    for dx in range(kx):
        row = x_vmem[slot, sx * xo + dx]  # (Ci, ys, Zp)
        if sy == 1:
            for dy in range(ky):
                taps.append(row[:, dy : dy + yb])
        elif sy == 2:
            rp = row.reshape(ci, row.shape[1] // 2, 2, zin)
            for dy in range(ky):
                taps.append(rp[:, dy // 2 : dy // 2 + yb, dy % 2])
        else:  # pragma: no cover
            raise NotImplementedError(f"y stride {sy}")
    return jnp.stack(taps, axis=0).reshape(kx * ky * ci, yb * zin)


def _fwd_kernel_b(
    *refs,
    xb: int,
    yb: int,
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    ci: int,
    co: int,
    zin: int,
    zo: int,
    id_tap: Optional[int],
    rest: Sequence[int],
    has_bias: bool,
    ys: int,
    db: bool,
):
    """Tap-stack-free forward ("B formulation", stride-y == 1 only).

    The slab is carried with y and z lanes MERGED — (Ci, ys*Zp) — so the
    per-row weight product ``B = W2 @ row`` (W2: (ky*kz*Co, Ci)) is a single
    clean MXU matmul with NO relayout; B lands in an explicit VMEM scratch
    (SSA temporaries would be stacked across the unrolled xo loop). Each
    (dy, dz) tap of the conv is then a 128-aligned sublane/lane WINDOW of B,
    summed on the VPU; only the final kz (Co, yb*Zp) -> (Co*yb, Zp) reshapes
    cross the sublane/lane boundary (7x less relayout volume than stacking a
    (kx*ky*Ci, yb*Zp) patch matrix per output row — the measured bottleneck).
    """
    it = iter(refs)
    x_hbm, w_ref = next(it), next(it)
    s_ref = next(it) if rest else None
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    x_vmem, bmat, sem = next(it), next(it), next(it)
    kx, ky, kz = k
    sx, _, _ = stride

    xb_in = sx * (xb - 1) + kx
    span = ys * zin

    def mk(slot, bi, ii, jj):
        return [
            pltpu.make_async_copy(
                x_hbm.at[bi, ii * sx * xb + r, slice(None), pl.ds(jj * yb * zin, span)],
                x_vmem.at[slot, r],
                sem.at[slot],
            )
            for r in range(xb_in)
        ]

    slot = _slab_pipeline(x_vmem, sem, mk, db)

    kzco = kz * co
    for xo in range(xb):
        acc = None
        for dx in range(kx):
            row2 = x_vmem[slot, sx * xo + dx]  # (Ci, ys*Zp)
            wdx = w_ref[dx]
            prec = _dot_precision(row2.dtype)
            if ci < 8 and row2.dtype != jnp.float32:
                # degenerate-K dots take Mosaic's vector-like path, which has
                # a bf16 mixed-precision lowering bug (see wgrad note)
                row2, wdx = row2.astype(jnp.float32), wdx.astype(jnp.float32)
            bmat[:] = jnp.dot(wdx, row2, preferred_element_type=jnp.float32,
                              precision=prec)
            for dy in range(ky):
                win = bmat[dy * kzco : (dy + 1) * kzco, dy * zin : (dy + yb) * zin]
                acc = win if acc is None else acc + win

        out = None
        parts = []
        for dz in range(kz):
            part = acc[dz * co : (dz + 1) * co].reshape(co * yb, zin)
            if dz == id_tap:
                out = part
            else:
                parts.append(part.astype(x_vmem.dtype))
        if rest:
            r_cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            shifted = jnp.dot(r_cat, s_ref[:], preferred_element_type=jnp.float32,
                              precision=_dot_precision(r_cat.dtype))
            out = shifted if out is None else out + shifted
        o3 = out.reshape(co, yb, zo)
        if has_bias:
            o3 = o3 + b_ref[:].reshape(co, 1, 1)
        out_ref[0, xo] = o3.astype(out_ref.dtype)


def _fwd_kernel(
    *refs,
    xb: int,
    yb: int,
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    ci: int,
    co: int,
    zin: int,
    zo: int,
    id_tap: Optional[int],
    rest: Sequence[int],
    has_bias: bool,
    unroll: bool,
    db: bool,
):
    it = iter(refs)
    x_hbm, w_ref = next(it), next(it)
    s_ref = next(it) if rest else None
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    x_vmem, sem = next(it), next(it)
    kx, ky, kz = k
    sx, sy, sz = stride

    xb_in = sx * (xb - 1) + kx
    ys = x_vmem.shape[3]

    # Per-x-row DMAs (a single strided copy between full dims faults the TPU
    # worker on this toolchain); start all, then wait all, to overlap.
    def mk(slot, bi, ii, jj):
        return [
            pltpu.make_async_copy(
                x_hbm.at[bi, ii * sx * xb + r, slice(None), pl.ds(jj * sy * yb, ys)],
                x_vmem.at[slot, r],
                sem.at[slot],
            )
            for r in range(xb_in)
        ]

    slot = _slab_pipeline(x_vmem, sem, mk, db)
    w = w_ref[:]  # (kz, Co, kx*ky*Ci)
    kz_ = k[2]
    # Stacked-taps dot (round 3): one (kz*Co, K) @ (K, yb*Zp) matmul instead
    # of kz separate (Co, K) dots — the MXU M axis fills kz x better (Co=16
    # 3^3 convs: M 16 -> 48; the M under-fill is the measured ceiling,
    # ROADMAP P0.5). Row-sliced per dz afterwards (sublane-aligned for
    # co % 8 == 0; smaller co keeps the per-dz path). VANGAN_CONV_STACK=0
    # disables it for A/B bisection (the enc1 stride-2 bwd regressed 12.1 ->
    # 16.7 ms when stacking + double-buffering landed together, PERF.md).
    stacked = (co % 8 == 0 and kz_ > 1
               and os.environ.get("VANGAN_CONV_STACK", "1") != "0")

    def body(xo, _):
        p = _tap_matrix(x_vmem, slot, xo, xb=xb, yb=yb, k=k, stride=stride,
                        ci=ci, zin=zin)

        out = None
        if stacked:
            r_all = _safe_dot(w.reshape(kz_ * co, -1), p)  # (kz*Co, yb*Zp)
            parts = {
                dz: r_all[dz * co : (dz + 1) * co].reshape(co * yb, zin)
                for dz in range(kz_)
            }
            if id_tap is not None:
                out = parts[id_tap]
            if rest:
                rs = [parts[dz].astype(p.dtype) for dz in rest]
                r_cat = rs[0] if len(rs) == 1 else jnp.concatenate(rs, axis=-1)
                shifted = _safe_dot(r_cat, s_ref[:])
                out = shifted if out is None else out + shifted
        else:
            if id_tap is not None:
                out = _safe_dot(w[id_tap], p).reshape(co * yb, zin)
            if rest:
                rs = [
                    _safe_dot(w[dz], p).reshape(co * yb, zin).astype(p.dtype)
                    for dz in rest
                ]
                r_cat = rs[0] if len(rs) == 1 else jnp.concatenate(rs, axis=-1)
                shifted = _safe_dot(r_cat, s_ref[:])
                out = shifted if out is None else out + shifted
        o3 = out.reshape(co, yb, zo)
        if has_bias:
            o3 = o3 + b_ref[:].reshape(co, 1, 1)
        out_ref[0, pl.ds(xo, 1)] = o3.astype(out_ref.dtype)[None]
        return 0

    if unroll:  # fastest; the fori_loop variant reuses VMEM stack instead
        for xo in range(xb):
            body(xo, 0)
    else:
        lax.fori_loop(0, xb, body, 0)


# Stack + slab + weights budget against the TPU's *scoped* vmem limit
# (default 16 MB; see docs/PERF.md "scoped-vmem is module-shared"). Tunable
# for A/B with a raised --xla_tpu_scoped_vmem_limit_kib: the budget must stay
# ~2/3 of the XLA limit to leave room for XLA's own S(1) promotions.
_VMEM_BUDGET = int(os.environ.get("VANGAN_CONV_VMEM_KIB", str(11 * 1024))) * 1024


def _per_xo_bytes(yb, k, ci, co, zp, itemsize) -> int:
    """VMEM-stack estimate for one xo iteration's temporaries (P matrix, tap
    dot results, select products). Mosaic stacks EVERY unrolled iteration's
    temporaries (it also unrolls small static fori_loops), so the x block size
    must be planned against this."""
    kx, ky, kz = k
    return yb * zp * (kx * ky * ci * itemsize + kz * co * 8) + yb * zp * 4 * co


def _stack_bytes(xb, yb, k, stride, ci, co, zp, itemsize, form_b=False) -> int:
    kx, ky, kz = k
    ys = _round_up(stride[1] * (yb - 1) + ky, 8)
    nslots = 2 if _db_enabled() else 1  # double-buffered slab (round 3)
    slab = nslots * (stride[0] * (xb - 1) + kx) * ci * ys * zp * itemsize
    w_bytes = kz * co * kx * ky * ci * itemsize
    if form_b:
        # explicit B scratch + small per-xo accumulate/select temporaries
        fixed = ky * kz * co * ys * zp * 4
        per_xo = yb * zp * co * (kz * 6 + 4)
        return xb * per_xo + fixed + slab + 2 * w_bytes
    return xb * _per_xo_bytes(yb, k, ci, co, zp, itemsize) + slab + 2 * w_bytes


def _plan_xb(xo_dim, yb, k, stride, ci, co, zp, itemsize, form_b=False) -> int:
    """Largest x block whose unrolled VMEM stack fits (1 as the floor)."""
    for xb in (8, 4, 2):
        if xo_dim % xb == 0 and _stack_bytes(
            xb, yb, k, stride, ci, co, zp, itemsize, form_b,
        ) <= _VMEM_BUDGET:
            return xb
    return 1


def _plan_blocks(xo_dim, yo_dim, k, stride, ci, co, zp, itemsize, form_b=False):
    """(xb, yb): bigger y blocks amortise per-block DMA latency (measured 21%
    at yb=16 on the 16ch 128^3 conv; no further gain at 32) unless they starve
    the x block below 4."""
    # default 16 (round 5): yb=16 kernels are ~20% faster standalone and the
    # step-level A/B measured +3.3% at batch 1 (1.607 -> 1.660 patches/s,
    # two_phase remat-off) and +3.1% at batch 3 (1.586 -> 1.635, microbatch)
    # with clean compiles — the round-2 compile-helper OOM that forced yb=8
    # no longer reproduces on the round-4/5 kernel bodies (the chain-fusion
    # removal and split/microbatch modules shrank the per-process footprint).
    # VANGAN_CONV_YB_MAX=8 restores the old plan for A/B; on-chip value
    # parity between the two is gated in tests/test_pallas_tpu.py.
    yb_max = int(os.environ.get("VANGAN_CONV_YB_MAX", "16"))
    sy = stride[1]
    for yb in (16, 8):
        if yb > yb_max:
            continue
        if (sy * yb) % 8 or yo_dim % yb:
            continue
        xb = _plan_xb(xo_dim, yb, k, stride, ci, co, zp, itemsize, form_b)
        if yb == 8 or xb >= 4:
            return xb, yb
    return _plan_xb(xo_dim, 8, k, stride, ci, co, zp, itemsize, form_b), 8


def conv3d_cxyz_fits(x_shape, k, stride, itemsize=2, co=None) -> bool:
    """Whether the Pallas kernels (fwd AND its dgrad/wgrad) fit VMEM at xb=1.
    The dispatch layer (models.layers.ConvND) falls back to XLA otherwise."""
    _, xdim, ci, _, zin = x_shape
    co = co or ci
    zp = max(128, _round_up(zin, 128))
    return (
        _stack_bytes(1, 8, k, stride, ci, co, zp, itemsize) <= _VMEM_BUDGET
        and _stack_bytes(1, 8, k, (1, 1, 1), co, ci, zp, itemsize) <= _VMEM_BUDGET
    )


def _conv_fwd(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: Tuple[int, int, int],
    z_pad: Tuple[int, int],
    z_mode: str,
    selects=None,
    out_dims: Optional[Tuple[int, int]] = None,
):
    """Core conv on an x/y-prepadded input.

    xp: (B, Xp, Ci, Yp, Zin); w: (kx,ky,kz,Ci,Co). z padding is implicit in the
    select matrices (built from ``z_pad``/``z_mode`` unless ``selects`` is
    given — dgrad passes transposed stacks). Output x/y dims are the exact
    VALID sizes (or ``out_dims`` when the caller wants over-computed rows
    trimmed later).
    """
    b, xdim, ci, ydim, zin = xp.shape
    kx, ky, kz, wci, co = w.shape
    assert wci == ci, (wci, ci)
    sx, sy, sz = stride

    if selects is None:
        zo = _out_dim(zin, kz, sz, *z_pad)
        mats = _z_selects(kz, zin, zo, sz, z_pad[0], z_mode)
    else:
        mats = selects
        zo = mats[0].shape[1]
    # lane-pad z to >=128 (in-kernel lane-crossing reshapes need 128-aligned
    # lanes); the padded select rows are zero, killing the garbage lanes
    zp = max(128, _round_up(zin, 128))
    id_tap, rest, s_cat = _pad_selects(mats, zp)

    xo_exact = _out_dim(xdim, kx, sx, 0, 0)
    yo_exact = _out_dim(ydim, ky, sy, 0, 0)
    xo_dim, yo_dim = out_dims if out_dims is not None else (xo_exact, yo_exact)
    assert xo_dim <= xo_exact and yo_dim <= yo_exact

    # Formulation: 'b' (tap-stack-free, see _fwd_kernel_b) where it measures
    # faster — wide-input convs (the patch-matrix stack scales with Ci) with
    # narrow outputs (B rows scale with Co); 'tap' otherwise. Measured: dec0
    # 48->16 @128^3 fwd 11.6 -> 8.8 ms with 'b'; 16->16 parity; Co=48 dgrad
    # regresses with 'b'.
    # (ci/co >= 2: singleton sublane dims break Mosaic's bf16 2-sublane
    # tiling in the merged-lane DMA/slices)
    import os as _os

    form_b = (
        sy == 1 and ci >= 2 and co >= 2
        and ((ci >= 32 and co <= 32) or (kx == ky == kz == 1))
        and not _os.environ.get("VANGAN_CONV_NO_FORM_B")
    )

    # Blocks: computed output is rounded up to a block multiple and trimmed.
    xb, yb = _plan_blocks(xo_dim, yo_dim, (kx, ky, kz), stride, ci, co, zp,
                          xp.dtype.itemsize, form_b=form_b)
    xo_c = _round_up(xo_dim, xb)
    yo_c = _round_up(yo_dim, yb)
    # Over-pad x/y (zeros) so over-computed rows' DMA reads stay in bounds.
    ys = _round_up(sy * (yb - 1) + ky, 8)
    need_x = sx * (xo_c - xb) + sx * (xb - 1) + kx
    need_y = sy * (yo_c - yb) + ys
    extra = (max(0, need_x - xdim), max(0, need_y - ydim), zp - zin)
    if extra != (0, 0, 0):
        xp = jnp.pad(
            xp, ((0, 0), (0, extra[0]), (0, 0), (0, extra[1]), (0, extra[2]))
        )

    dtype = xp.dtype
    has_bias = bias is not None
    xb_in = sx * (xb - 1) + kx
    db = _db_enabled()
    nslots = 2 if db else 1
    if form_b:
        # y and z carried as MERGED lanes: a free host reshape makes every
        # in-kernel weight product relayout-free
        xp4 = xp.reshape(*xp.shape[:3], xp.shape[3] * xp.shape[4])
        inputs = [xp4, _pack_w_b(w, dtype)]
        scratch = [
            pltpu.VMEM((nslots, xb_in, ci, ys * zp), dtype),
            pltpu.VMEM((ky * kz * co, ys * zp), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ]
        kernel = functools.partial(
            _fwd_kernel_b,
            xb=xb, yb=yb, k=(kx, ky, kz), stride=stride, ci=ci, co=co,
            zin=zp, zo=zo, id_tap=id_tap, rest=tuple(rest), has_bias=has_bias,
            ys=ys, db=db,
        )
    else:
        inputs = [xp, _pack_w(w, dtype)]
        scratch = [
            pltpu.VMEM((nslots, xb_in, ci, ys, zp), dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ]
        kernel = functools.partial(
            _fwd_kernel,
            xb=xb, yb=yb, k=(kx, ky, kz), stride=stride, ci=ci, co=co,
            zin=zp, zo=zo, id_tap=id_tap, rest=tuple(rest), has_bias=has_bias,
            unroll=True, db=db,
        )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if rest:
        inputs.append(jnp.asarray(s_cat, dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_bias:
        inputs.append(bias.reshape(co, 1).astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_blk = pl.BlockSpec(
        (1, xb, co, yb, zo), lambda bi, i, j: (bi, i, 0, j, 0),
        memory_space=pltpu.VMEM,
    )

    y = pl.pallas_call(
        kernel,
        grid=(b, xo_c // xb, yo_c // yb),
        in_specs=in_specs,
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((b, xo_c, co, yo_c, zo), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
        ),
        interpret=_interpret(),
    )(*inputs)

    if (xo_c, yo_c) != (xo_dim, yo_dim):
        y = y[:, :xo_dim, :, :yo_dim]
    return y


# ---------------------------------------------------------------------------
# wgrad kernel
# ---------------------------------------------------------------------------


def _wgrad_kernel(
    *refs,
    xb: int,
    yb: int,
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    ci: int,
    co: int,
    zin: int,
    zo: int,
    id_tap: Optional[int],
    rest: Sequence[int],
    unroll: bool,
    db: bool,
):
    it = iter(refs)
    x_hbm, g_ref = next(it), next(it)
    st_ref = next(it) if rest else None
    dw_ref, x_vmem, sem = next(it), next(it), next(it)
    kx, ky, kz = k
    sx, sy, sz = stride
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((b == 0) & (i == 0) & (j == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xb_in = sx * (xb - 1) + kx
    ys = x_vmem.shape[3]

    def mk(slot, bi, ii, jj):
        return [
            pltpu.make_async_copy(
                x_hbm.at[bi, ii * sx * xb + r, slice(None), pl.ds(jj * sy * yb, ys)],
                x_vmem.at[slot, r],
                sem.at[slot],
            )
            for r in range(xb_in)
        ]

    slot = _slab_pipeline(x_vmem, sem, mk, db)

    kz_ = k[2]
    # see _fwd_kernel: one (kz*Co)-row A@B^T instead of kz (Co)-row dots;
    # honours the same VANGAN_CONV_STACK=0 A/B switch (the round-3 enc1
    # stride-2 bwd regression lives in wgrad/dgrad; the round-4 bisect
    # measured the default stack+db config BEST — 16.20 ms vs 16.56 (stack
    # off) / 18.01 (db off) / 18.15 (both off) — so the switch stays A/B-only)
    stacked = (co % 8 == 0 and kz_ > 1
               and os.environ.get("VANGAN_CONV_STACK", "1") != "0")

    def _contract(gd, pp):
        # (M, yb*Zin) x (kx*ky*Ci, yb*Zin)^T -> (M, kx*ky*Ci). Degenerate
        # dots (any dim < 8) hit a Mosaic bf16 mixed-precision lowering bug
        # ('vector.broadcast' dtype mismatch) — compute those in f32.
        prec = _dot_precision(pp.dtype)
        if min(gd.shape[0], pp.shape[0], pp.shape[1]) < 8 and pp.dtype != jnp.float32:
            gd, pp = gd.astype(jnp.float32), pp.astype(jnp.float32)
        return lax.dot_general(
            gd, pp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def body(xo, _):
        p = _tap_matrix(x_vmem, slot, xo, xb=xb, yb=yb, k=k, stride=stride,
                        ci=ci, zin=zin)

        g2 = g_ref[0, pl.ds(xo, 1)][0].reshape(co * yb, zo)  # (Co*yb, Zo)
        # Gd_dz = G @ S_dz^T, stacked: (Co*yb, len(rest)*Zp) in one matmul
        gd_cat = None
        if rest:
            gd_cat = _safe_dot(g2.astype(p.dtype), st_ref[:])
        gds = {}
        for n, dz in enumerate(
            ([id_tap] if id_tap is not None else []) + list(rest)
        ):
            if id_tap is not None and n == 0:
                gd = g2
            else:
                r = n - (1 if id_tap is not None else 0)
                gd = gd_cat[:, r * zin : (r + 1) * zin]
            gds[dz] = gd.reshape(co, yb * zin).astype(p.dtype)
        if stacked:
            gd_all = jnp.concatenate([gds[dz] for dz in range(kz_)], axis=0)
            contrib = _contract(gd_all, p)  # (kz*Co, kx*ky*Ci)
            dw_ref[...] += contrib.reshape(kz_, co, p.shape[0])
        else:
            for dz, gd in gds.items():
                dw_ref[dz] += _contract(gd, p)
        return 0

    if unroll:
        for xo in range(xb):
            body(xo, 0)
    else:
        lax.fori_loop(0, xb, body, 0)


def _conv_wgrad(
    xp: jnp.ndarray,
    g: jnp.ndarray,
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    z_pad: Tuple[int, int],
    z_mode: str,
) -> jnp.ndarray:
    """dL/dw for the core conv. xp: (B,Xp,Ci,Yp,Zin); g: (B,Xo,Co,Yo,Zo)."""
    b, xdim, ci, ydim, zin = xp.shape
    _, xo_dim, co, yo_dim, zo = g.shape
    kx, ky, kz = k
    sx, sy, sz = stride
    mats = _z_selects(kz, zin, zo, sz, z_pad[0], z_mode)
    zp = max(128, _round_up(zin, 128))
    id_tap, rest, _ = _pad_selects(mats, zp)
    st_cat = (
        np.concatenate([np.pad(mats[dz], ((0, zp - zin), (0, 0))).T for dz in rest], axis=1)
        if rest
        else None
    )  # (Zo, len(rest)*Zp)

    xb, yb = _plan_blocks(xo_dim, yo_dim, k, stride, ci, co, zp, xp.dtype.itemsize)
    xo_c = _round_up(xo_dim, xb)
    yo_c = _round_up(yo_dim, yb)
    # over-computed rows must contribute ZERO to dw: pad g with zeros and pad
    # xp so reads are in bounds (values x 0 = 0).
    if (xo_c, yo_c) != (xo_dim, yo_dim):
        g = jnp.pad(g, ((0, 0), (0, xo_c - xo_dim), (0, 0), (0, yo_c - yo_dim), (0, 0)))
    ys = _round_up(sy * (yb - 1) + ky, 8)
    need_x = sx * (xo_c - xb) + sx * (xb - 1) + kx
    need_y = sy * (yo_c - yb) + ys
    extra = (max(0, need_x - xdim), max(0, need_y - ydim), zp - zin)
    if extra != (0, 0, 0):
        xp = jnp.pad(
            xp, ((0, 0), (0, extra[0]), (0, 0), (0, extra[1]), (0, extra[2]))
        )

    dtype = xp.dtype
    inputs = [xp, g.astype(dtype)]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, xb, co, yb, zo), lambda bi, i, j: (bi, i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if rest:
        inputs.append(jnp.asarray(st_cat, dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    db = _db_enabled()
    nslots = 2 if db else 1
    kernel = functools.partial(
        _wgrad_kernel,
        xb=xb, yb=yb, k=k, stride=stride, ci=ci, co=co, zin=zp, zo=zo,
        id_tap=id_tap, rest=tuple(rest),
        unroll=True, db=db,
    )
    xb_in = sx * (xb - 1) + kx
    dw3 = pl.pallas_call(
        kernel,
        grid=(b, xo_c // xb, yo_c // yb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (kz, co, kx * ky * ci), lambda bi, i, j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kz, co, kx * ky * ci), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, xb_in, ci, ys, zp), dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
        ),
        interpret=_interpret(),
    )(*inputs)
    # (kz, Co, kx*ky*Ci) -> (kx, ky, kz, Ci, Co)
    return jnp.transpose(dw3.reshape(kz, co, kx, ky, ci), (2, 3, 0, 4, 1))


# ---------------------------------------------------------------------------
# dgrad (parity-decomposed transposed conv)
# ---------------------------------------------------------------------------


def _conv_dgrad(
    g: jnp.ndarray,
    w: jnp.ndarray,
    xp_shape: Tuple[int, ...],
    stride: Tuple[int, int, int],
    z_pad: Tuple[int, int],
    z_mode: str,
) -> jnp.ndarray:
    """dL/d(xp) — gradient w.r.t. the x/y-prepadded input."""
    kx, ky, kz, ci, co = w.shape
    sx, sy, sz = stride
    b, xp_dim, _, yp_dim, zin = xp_shape
    _, xo_dim, _, yo_dim, zo = g.shape

    # transposed z selects (vjp of the constant select matmul); _conv_fwd
    # lane-pads their rows alongside the cotangent input
    mats_t = [m.T for m in _z_selects(kz, zin, zo, sz, z_pad[0], z_mode)]  # (Zo, Zin)

    pieces_x = []
    for px in range(sx):
        kpx = len(range(px, kx, sx))
        npx = -(-(xp_dim - px) // sx)  # #{n < xp_dim : n % sx == px}
        pieces_y = []
        for py in range(sy):
            kpy = len(range(py, ky, sy))
            npy = -(-(yp_dim - py) // sy)
            if kpx == 0 or kpy == 0:
                pieces_y.append(jnp.zeros((b, npx, ci, npy, zin), g.dtype))
                continue
            # flipped parity sub-kernel, ci/co swapped; z taps stay in order
            wsub = w[px::sx, py::sy][::-1, ::-1]  # (kpx, kpy, kz, Ci, Co)
            wsub = jnp.transpose(wsub, (0, 1, 2, 4, 3))  # swap ci/co
            # pad g so a VALID stride-1 conv emits exactly (npx, npy) rows
            gx_lo, gx_hi = kpx - 1, npx - xo_dim
            gy_lo, gy_hi = kpy - 1, npy - yo_dim
            gp = jnp.pad(
                g, ((0, 0), (gx_lo, max(gx_hi, 0)), (0, 0), (gy_lo, max(gy_hi, 0)), (0, 0))
            )
            if gx_hi < 0 or gy_hi < 0:  # pragma: no cover - sizes guarantee >= 0
                raise AssertionError("negative dgrad pad")
            piece = _conv_fwd(
                gp, wsub, None, (1, 1, 1), z_pad, z_mode,
                selects=mats_t, out_dims=(npx, npy),
            )
            pieces_y.append(piece)
        if sy == 1:
            pieces_x.append(pieces_y[0])
        else:
            ny = max(p.shape[3] for p in pieces_y)
            pieces_y = [
                jnp.pad(p, ((0, 0),) * 3 + ((0, ny - p.shape[3]), (0, 0)))
                for p in pieces_y
            ]
            inter = jnp.stack(pieces_y, axis=4)  # (B, npx, Ci, ny, sy, Zin)
            inter = inter.reshape(b, pieces_y[0].shape[1], ci, ny * sy, zin)
            pieces_x.append(inter[:, :, :, :yp_dim])
    if sx == 1:
        dxp = pieces_x[0]
    else:
        nx = max(p.shape[1] for p in pieces_x)
        pieces_x = [
            jnp.pad(p, ((0, 0), (0, nx - p.shape[1])) + ((0, 0),) * 3) for p in pieces_x
        ]
        inter = jnp.stack(pieces_x, axis=2)  # (B, nx, sx, Ci, Yp, Zin)
        dxp = inter.reshape(b, nx * sx, ci, yp_dim, zin)[:, :xp_dim]
    return dxp


# ---------------------------------------------------------------------------
# custom_vjp core + public API
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_core(stride: Tuple[int, int, int], z_pad: Tuple[int, int], z_mode: str):
    @jax.custom_vjp
    def core(xp, w, bias):
        return _conv_fwd(xp, w, bias, stride, z_pad, z_mode)

    def fwd(xp, w, bias):
        return core(xp, w, bias), (xp, w, bias is not None)

    def bwd(res, g):
        xp, w, has_bias = res
        dxp = _conv_dgrad(g, w, xp.shape, stride, z_pad, z_mode).astype(xp.dtype)
        dw = _conv_wgrad(xp, g, w.shape[:3], stride, z_pad, z_mode).astype(w.dtype)
        db = jnp.sum(g, axis=(0, 1, 3, 4), dtype=jnp.float32) if has_bias else None
        return dxp, dw, db

    core.defvjp(fwd, bwd)
    return core


def conv3d_cxyz(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: Union[int, Tuple[int, int, int]] = 1,
    padding: Union[str, Pad3] = "same",
    pad_mode: str = "zeros",
) -> jnp.ndarray:
    """3-D conv in the (B, X, Ci, Y, Z) layout -> (B, Xo, Co, Yo, Zo).

    w: (kx, ky, kz, Ci, Co) (flax nn.Conv layout); ``pad_mode`` 'zeros' or
    'reflect' (reference reflect-pad+VALID folds into pad_mode='reflect' with
    the same pad widths). Differentiable via custom_vjp Pallas kernels.
    """
    k = tuple(w.shape[:3])
    stride = _norm_stride(stride)
    pads = _norm_padding(padding, k, stride, (x.shape[1], x.shape[3], x.shape[4]))
    (lox, hix), (loy, hiy), z_pad = pads
    if lox or hix or loy or hiy:
        if pad_mode == "reflect":
            xp = jnp.pad(
                x, ((0, 0), (lox, hix), (0, 0), (loy, hiy), (0, 0)), mode="reflect"
            )
        else:
            xp = jnp.pad(x, ((0, 0), (lox, hix), (0, 0), (loy, hiy), (0, 0)))
    else:
        xp = x
    z_mode = pad_mode if pad_mode == "reflect" else "zeros"
    if bias is None:
        return _make_core_nobias(stride, z_pad, z_mode)(xp, w)
    return _make_core(stride, z_pad, z_mode)(xp, w, bias)


@functools.lru_cache(maxsize=None)
def _make_core_nobias(stride: Tuple[int, int, int], z_pad: Tuple[int, int], z_mode: str):
    @jax.custom_vjp
    def core(xp, w):
        return _conv_fwd(xp, w, None, stride, z_pad, z_mode)

    def fwd(xp, w):
        return core(xp, w), (xp, w)

    def bwd(res, g):
        xp, w = res
        dxp = _conv_dgrad(g, w, xp.shape, stride, z_pad, z_mode).astype(xp.dtype)
        dw = _conv_wgrad(xp, g, w.shape[:3], stride, z_pad, z_mode).astype(w.dtype)
        return dxp, dw

    core.defvjp(fwd, bwd)
    return core


def conv3d_cxyz_reference(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: Union[int, Tuple[int, int, int]] = 1,
    padding: Union[str, Pad3] = "same",
    pad_mode: str = "zeros",
) -> jnp.ndarray:
    """XLA reference with identical semantics: CXYZ in/out via NXYZC transpose."""
    k = tuple(w.shape[:3])
    stride = _norm_stride(stride)
    pads = _norm_padding(padding, k, stride, (x.shape[1], x.shape[3], x.shape[4]))
    xl = jnp.transpose(x, (0, 1, 3, 4, 2))  # -> (B, X, Y, Z, Ci)
    if pad_mode == "reflect":
        xl = jnp.pad(xl, ((0, 0), *[(lo, hi) for lo, hi in pads], (0, 0)), mode="reflect")
        pads = ((0, 0),) * 3
    dn = lax.conv_dimension_numbers(xl.shape, w.shape, ("NXYZC", "XYZIO", "NXYZC"))
    y = lax.conv_general_dilated(
        xl, w.astype(xl.dtype), stride, list(pads), dimension_numbers=dn
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return jnp.transpose(y, (0, 1, 4, 2, 3))
