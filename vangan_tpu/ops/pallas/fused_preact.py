"""Fused pre-activation convolution: InstanceNorm + activation + conv3d in
two Pallas launches instead of four.

Motivation (docs/PERF.md round 3): with per-op Pallas launches the measured
per-grid-step fixed overheads dominate — the IN+act pair costs ~3.7 ms at
128^3 x 16ch (23x its bandwidth floor) and every one of the 19
PreActConvBlocks in the flagship ResU-Net (resunet_model.py:42-66,103-143,
236-243 — norm -> act -> reflect-pad conv) pays it. This module folds the
IN *apply* (affine + activation) into the consumer conv's slab prologue:

    unfused:  stats(x) -> apply(x) -> [t in HBM] -> conv(t)     4 launches,
              t written + read (2 extra HBM passes of the full tensor)
    fused :   stats(x) -> conv_pro(x; a, b)                     2 launches,
              t never materialises

The conv kernels read every slab row as ``act(x*a + b)`` (conv3d.py
``pro=`` arm) with a = gamma*rsqrt(var+eps), b = beta - mean*a computed on
(B, C) scalars between the launches. Beyond the forward win, the residual
set shrinks from {x, t} to {x} per block — halving the pre-act spine's
activation memory (what forces remat at batch >= 2, docs/PERF.md).

Backward reuses the proven kernels wholesale — no new backward kernels:

    dt   = conv dgrad(g, w)                 (conv3d._conv_dgrad, unchanged)
    dx, dgamma, dbeta = instnorm._vjp_bwd(..., dt)   (the monolithic IN+act
           backward: reduce + dx kernels, stats chain included)
    dw   = conv wgrad(xp, g, pro)           (patch matrix = act(xp*a+b),
           recomputed in the slab prologue — t is never stored)

Correctness constraint: x/y host padding must be REFLECT (or absent), since
pad-then-transform == transform-then-pad only for reflection; zero x/y pads
would turn pad zeros into act(b). Virtual z zero-padding stays exact: the
select matrices zero out-of-range taps, i.e. zero-pad the TRANSFORMED
tensor (see _conv_fwd docstring). Every PreActConvBlock is reflect-padded.

Reference behaviours covered: resunet_model.py:23-66 (norm_act = IN+ReLU
then reflect-pad conv), building_blocks.py:68-123 (post-act residual block's
IN -> relu -> conv chain). The reference has no analog of this fusion — its
TF runtime fuses nothing across Conv3D boundaries.

Default OFF (``VANGAN_FUSE_PREACT``): semantics are interpret-mode verified
(tests/test_fused_preact.py) but kernels must be chip-validated before the
flag flips — a Mosaic lowering failure only shows on hardware
(tpu-toolchain-constraints).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from vangan_tpu.ops.pallas import conv3d as C
from vangan_tpu.ops.pallas import instnorm as IN

Pad3 = Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]

_ACTS = ("none", "relu", "leaky_relu")


def preact_conv_supported(
    x_shape: Tuple[int, ...],
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    pads: Pad3,
    pad_mode: str,
    act: str,
    itemsize: int = 2,
    co: Optional[int] = None,
) -> bool:
    """Whether the fused path can run this config on the NXCYZ layout:
    the instnorm stats/backward kernels must tile x, the prologue'd conv
    fwd + wgrad (and the plain dgrad) must fit VMEM, and the x/y padding
    must commute with the prologue (reflect or absent)."""
    if not (C.pallas_active() and len(x_shape) == 5 and act in _ACTS):
        return False
    b, xdim, ci, ydim, zin = x_shape
    co = co or ci
    if not (2 <= ci < 128 and 2 <= co < 128):
        return False
    (lox, hix), (loy, hiy), _ = pads
    if (lox or hix or loy or hiy) and pad_mode != "reflect":
        return False
    if not IN.instance_norm_act_supported(x_shape, "NXCYZ"):
        return False
    zp = max(128, C._round_up(zin, 128))
    return (
        C._stack_bytes(1, 8, k, stride, ci, co, zp, itemsize, pro=True)
        <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, stride, ci, co, zp, itemsize,
                           form_b=True, pro=True) <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, (1, 1, 1), co, ci, zp, itemsize)
        <= C._VMEM_BUDGET
    )


@functools.lru_cache(maxsize=None)
def _make_fused(
    stride: Tuple[int, int, int],
    pads: Pad3,
    pad_mode: str,
    act: str,
    alpha: float,
    eps: float,
    has_bias: bool,
):
    """custom_vjp closure for one static (stride, pads, mode, act) config."""
    (lox, hix), (loy, hiy), z_pad = pads
    z_mode = "reflect" if pad_mode == "reflect" else "zeros"
    has_xy_pad = bool(lox or hix or loy or hiy)
    if has_xy_pad and pad_mode != "reflect":
        # hard error (not assert — must survive python -O): zero x/y pads do
        # not commute with the prologue (pad voxels would become act(b))
        raise ValueError(
            "preact_conv requires reflect (or absent) x/y padding; zero pads "
            "do not commute with the fused InstanceNorm prologue"
        )

    def _pad(x):
        if not has_xy_pad:
            return x
        return jnp.pad(
            x, ((0, 0), (lox, hix), (0, 0), (loy, hiy), (0, 0)), mode="reflect"
        )

    def _fwd_impl(x, gamma, beta, w, bias):
        mean, var = IN._stats(x)  # (B, C) f32 — 1 launch, 1 HBM read
        inv = lax.rsqrt(var + eps)
        a = inv * gamma[None, :]
        b = beta[None, :] - mean * a
        y = C._conv_fwd(
            _pad(x), w, bias, stride, z_pad, z_mode, pro=(a, b, act, alpha)
        )
        return y, (mean, inv, a, b)

    def _bwd_impl(res, g):
        x, gamma, w, (mean, inv, a, b) = res
        xp = _pad(x)
        # cotangent of the transformed tensor t, w.r.t. the padded domain
        dtp = C._conv_dgrad(g, w, xp.shape, stride, z_pad, z_mode).astype(x.dtype)
        if has_xy_pad:
            _, pvjp = jax.vjp(_pad, x)
            (dt,) = pvjp(dtp)
        else:
            dt = dtp
        # the monolithic IN+act backward (reduce + dx kernels, stats chain
        # included) — dt is exactly the cotangent it expects
        dx, dgamma, dbeta = IN._vjp_bwd(
            eps, act, alpha, (x, gamma, (mean, inv, a, b)), dt
        )
        dw = C._conv_wgrad(
            xp, g, w.shape[:3], stride, z_pad, z_mode, pro=(a, b, act, alpha)
        ).astype(w.dtype)
        dbias = (
            jnp.sum(g, axis=(0, 1, 3, 4), dtype=jnp.float32) if has_bias else None
        )
        return dx, dgamma, dbeta, dw, dbias

    if has_bias:

        @jax.custom_vjp
        def fused(x, gamma, beta, w, bias):
            return _fwd_impl(x, gamma, beta, w, bias)[0]

        def fwd(x, gamma, beta, w, bias):
            y, scal = _fwd_impl(x, gamma, beta, w, bias)
            return y, (x, gamma, w, scal)

        def bwd(res, g):
            return _bwd_impl(res, g)

        fused.defvjp(fwd, bwd)
        return fused

    @jax.custom_vjp
    def fused_nb(x, gamma, beta, w):
        return _fwd_impl(x, gamma, beta, w, None)[0]

    def fwd_nb(x, gamma, beta, w):
        y, scal = _fwd_impl(x, gamma, beta, w, None)
        return y, (x, gamma, w, scal)

    def bwd_nb(res, g):
        return _bwd_impl(res, g)[:4]

    fused_nb.defvjp(fwd_nb, bwd_nb)
    return fused_nb


def chain_conv_supported(
    x_shape: Tuple[int, ...],
    k: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    pads: Pad3,
    pad_mode: str,
    act: str,
    itemsize: int = 2,
    co: Optional[int] = None,
    pro: bool = True,
    emit: bool = False,
    epi: bool = False,
) -> bool:
    """Gate for the stats-chaining ops (conv_stats / preact_conv_ext): every
    kernel variant the op's fwd+bwd will launch must fit the VMEM budget and
    the instnorm backward kernels must tile the shape. Mirrors
    preact_conv_supported with the emit/epi _stack_bytes arms included."""
    if not (C.pallas_active() and len(x_shape) == 5):
        return False
    if pro and act not in _ACTS:
        return False
    b, xdim, ci, ydim, zin = x_shape
    co = co or ci
    if not (ci < 128 and co < 128):
        return False
    if not C.conv3d_cxyz_fits(x_shape, k, stride, itemsize, co=co):
        return False
    if pro and not (2 <= ci and 2 <= co):
        return False
    if (emit or epi) and not 2 <= co:
        return False
    (lox, hix), (loy, hiy), _ = pads
    if pro and (lox or hix or loy or hiy) and pad_mode != "reflect":
        return False
    if pro and not IN.instance_norm_act_supported(x_shape, "NXCYZ"):
        return False
    zp = max(128, C._round_up(zin, 128))
    kw = dict(pro=pro, stats=emit, epi=epi)
    return (
        C._stack_bytes(1, 8, k, stride, ci, co, zp, itemsize, **kw)
        <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, stride, ci, co, zp, itemsize,
                           form_b=True, **kw) <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, (1, 1, 1), co, ci, zp, itemsize)
        <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, stride, ci, co, zp, itemsize, pro=pro)
        <= C._VMEM_BUDGET
    )


# ---------------------------------------------------------------------------
# Stats-chaining ops (round 3, phase 2): the conv that PRODUCES a pre-act
# block's input also emits the InstanceNorm statistics its consumer needs
# (conv3d.py ``emit_stats`` epilogue), so the standalone stats launch — one
# full HBM read of the tensor plus its per-launch fixed cost — disappears
# from every block interior. A residual block's projected-shortcut norm +
# add folds into the consumer conv's ``epi`` epilogue the same way. Each op
# carries its OWN custom_vjp with exact cotangents for its stats inputs and
# outputs; JAX composes them across the chain, so there is no hand-written
# whole-block backward:
#
#   d(mean_in)  = -a * sum(g')            d(var_in) = -(a*inv/2) * sum(xhat g')
#   d(y | emitted stats) = gy + gmean/n + gvar * 2(y - mean_y)/n
#
# (g' = dt * act'(x*a+b); both sums come from instnorm.bwd_reduce_sums, the
# same kernels the internal-stats backward uses with c1 = c2 = 0 — the
# composition is algebraically identical to the monolithic _vjp_bwd.)
# ---------------------------------------------------------------------------


def _bc(v: jnp.ndarray) -> jnp.ndarray:
    """(B, C) -> (B, 1, C, 1, 1) broadcast view for the NXCYZ layout."""
    return v[:, None, :, None, None]


@jax.custom_vjp
def stats_op(x: jnp.ndarray):
    """Differentiable per-(B, C) f32 (mean, var) on NXCYZ — instnorm._stats
    with the analytic vjp (dmean, dvar) -> dx = dmean/n + dvar*2(x-mean)/n.
    Chain entry point when the producer could not emit stats."""
    return IN._stats(x)


def _stats_op_fwd(x):
    mean, var = IN._stats(x)
    return (mean, var), (x, mean)


def _stats_op_bwd(res, g):
    x, mean = res
    gm, gv = g
    n = x.shape[1] * x.shape[3] * x.shape[4]
    dx = _bc(gm) / n + _bc(gv) * (2.0 / n) * (x.astype(jnp.float32) - _bc(mean))
    return (dx.astype(x.dtype),)


stats_op.defvjp(_stats_op_fwd, _stats_op_bwd)


@functools.lru_cache(maxsize=None)
def _make_conv_op(
    stride: Tuple[int, int, int],
    pads: Pad3,
    pad_mode: str,
    act: str,
    alpha: float,
    eps: float,
    has_bias: bool,
    has_pro: bool,
    emit: bool,
    has_epi: bool,
):
    """One dict-operand custom_vjp per static config.

    Operand keys by flags: always ``x``/``w``; ``bias``; pro adds
    ``mean``/``var``/``gamma``/``beta`` (stats-EXTERNAL InstanceNorm + act
    prologue); epi adds ``short``/``mean_s``/``var_s``/``gamma_s``/``beta_s``
    (shortcut norm-apply + residual add in the epilogue). ``emit`` returns
    (y, mean_y, var_y) instead of y."""
    (lox, hix), (loy, hiy), z_pad = pads
    z_mode = "reflect" if pad_mode == "reflect" else "zeros"
    has_xy_pad = bool(lox or hix or loy or hiy)
    if has_pro and has_xy_pad and pad_mode != "reflect":
        # hard error (not assert — must survive python -O): see module doc
        raise ValueError(
            "stats-external pre-act conv requires reflect (or absent) x/y "
            "padding; zero pads do not commute with the prologue"
        )

    def _pad(x):
        if not has_xy_pad:
            return x
        mode = "reflect" if pad_mode == "reflect" else "constant"
        return jnp.pad(
            x, ((0, 0), (lox, hix), (0, 0), (loy, hiy), (0, 0)), mode=mode
        )

    def _scals(ops):
        pro_k = scal = epi_k = epis = None
        if has_pro:
            inv = lax.rsqrt(ops["var"] + eps)
            a = inv * ops["gamma"][None, :]
            b = ops["beta"][None, :] - ops["mean"] * a
            pro_k, scal = (a, b, act, alpha), (inv, a, b)
        if has_epi:
            inv_s = lax.rsqrt(ops["var_s"] + eps)
            a_s = inv_s * ops["gamma_s"][None, :]
            b_s = ops["beta_s"][None, :] - ops["mean_s"] * a_s
            epi_k, epis = (ops["short"], a_s, b_s), (inv_s, a_s)
        return pro_k, scal, epi_k, epis

    @jax.custom_vjp
    def op(ops):
        pro_k, _, epi_k, _ = _scals(ops)
        return C._conv_fwd(
            _pad(ops["x"]), ops["w"], ops.get("bias"), stride, z_pad, z_mode,
            pro=pro_k, epi=epi_k, emit_stats=emit,
        )

    def fwd(ops):
        pro_k, scal, epi_k, epis = _scals(ops)
        r = C._conv_fwd(
            _pad(ops["x"]), ops["w"], ops.get("bias"), stride, z_pad, z_mode,
            pro=pro_k, epi=epi_k, emit_stats=emit,
        )
        # emitted-stats residual (y, mean_y) is NOT extra activation memory in
        # a chain: y IS the consumer op's ``x`` residual (same array, deduped)
        return r, (ops, scal, epis, (r[0], r[1]) if emit else None)

    def bwd(res, g):
        ops, scal, epis, ystats = res
        if emit:
            gy, gm, gv = g
            y, mean_y = ystats
            n_out = y.shape[1] * y.shape[3] * y.shape[4]
            # cotangent of the emitted (mean, var): fold into gy in f32 —
            # the terms are O(E[g']), not small; one XLA-fused elementwise
            gy = (
                gy.astype(jnp.float32)
                + _bc(gm) / n_out
                + _bc(gv) * (2.0 / n_out) * (y.astype(jnp.float32) - _bc(mean_y))
            ).astype(gy.dtype)
        else:
            gy = g
        x, w = ops["x"], ops["w"]
        xp = _pad(x)
        dtp = C._conv_dgrad(gy, w, xp.shape, stride, z_pad, z_mode).astype(x.dtype)
        if has_xy_pad:
            _, pvjp = jax.vjp(_pad, x)
            (dt,) = pvjp(dtp)
        else:
            dt = dtp
        grads = {}
        pro_k = None
        if has_pro:
            inv, a, b = scal
            mean = ops["mean"]
            # one-launch external backward: dx = a*g' plus the two sums
            # (centering routes to dmean/dvar) — see instnorm.bwd_ext_fused
            grads["x"], sum_gp, sum_xg = IN.bwd_ext_fused(
                x, dt, a, b, mean, inv, act, alpha
            )
            grads["gamma"] = jnp.sum(sum_xg, axis=0)
            grads["beta"] = jnp.sum(sum_gp, axis=0)
            grads["mean"] = -a * sum_gp
            grads["var"] = -(a * inv * 0.5) * sum_xg
            pro_k = (a, b, act, alpha)
        else:
            grads["x"] = dt
        grads["w"] = C._conv_wgrad(
            xp, gy, w.shape[:3], stride, z_pad, z_mode, pro=pro_k
        ).astype(w.dtype)
        if has_bias:
            grads["bias"] = jnp.sum(gy, axis=(0, 1, 3, 4), dtype=jnp.float32)
        if has_epi:
            inv_s, a_s = epis
            short = ops["short"]
            b_s = ops["beta_s"][None, :] - ops["mean_s"] * a_s
            if IN.instance_norm_act_supported(short.shape, "NXCYZ"):
                # one fused Pallas pass for dshort + both sums (the jnp
                # axes-(1,3,4) reduction pattern measured ~10x over the
                # bandwidth floor on this layout, instnorm.py)
                grads["short"], sgp, sxg = IN.bwd_ext_fused(
                    short, gy.astype(short.dtype), a_s, b_s,
                    ops["mean_s"], inv_s, "none", 0.0,
                )
            else:
                gyf = gy.astype(jnp.float32)
                grads["short"] = (gyf * _bc(a_s)).astype(short.dtype)
                schat = (short.astype(jnp.float32) - _bc(ops["mean_s"])) * _bc(inv_s)
                sgp = jnp.sum(gyf, axis=(1, 3, 4))           # (B, C)
                sxg = jnp.sum(gyf * schat, axis=(1, 3, 4))   # (B, C)
            grads["gamma_s"] = jnp.sum(sxg, axis=0)
            grads["beta_s"] = jnp.sum(sgp, axis=0)
            grads["mean_s"] = -a_s * sgp
            grads["var_s"] = -(a_s * inv_s * 0.5) * sxg
        return (grads,)

    op.defvjp(fwd, bwd)
    return op


def _conv_op_call(
    x, w, bias, stride, padding, pad_mode, act, alpha, eps,
    mean=None, var=None, gamma=None, beta=None, emit_stats=False, epi=None,
):
    k = tuple(w.shape[:3])
    stride = C._norm_stride(stride)
    pads = C._norm_padding(padding, k, stride, (x.shape[1], x.shape[3], x.shape[4]))
    has_pro = mean is not None
    fn = _make_conv_op(
        stride, pads, pad_mode, act, float(alpha), float(eps),
        bias is not None, has_pro, emit_stats, epi is not None,
    )
    ops = {"x": x, "w": w}
    if bias is not None:
        ops["bias"] = bias
    if has_pro:
        ops.update(mean=mean, var=var, gamma=gamma, beta=beta)
    if epi is not None:
        short, mean_s, var_s, gamma_s, beta_s = epi
        ops.update(short=short, mean_s=mean_s, var_s=var_s,
                   gamma_s=gamma_s, beta_s=beta_s)
    return fn(ops)


def conv_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding="same",
    pad_mode: str = "zeros",
):
    """conv3d_cxyz that ALSO returns its output's per-(B, C) f32 InstanceNorm
    (mean, var) from the kernel epilogue — for feeding a chained pre-act
    consumer. Returns (y, mean, var)."""
    return _conv_op_call(x, w, bias, stride, padding, pad_mode,
                         "none", 0.0, 0.0, emit_stats=True)


def preact_conv_ext(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding="same",
    pad_mode: str = "reflect",
    act: str = "relu",
    alpha: float = 0.2,
    eps: float = 1e-3,
    emit_stats: bool = False,
    epi=None,
):
    """Stats-EXTERNAL fused pre-act conv: conv(act(IN(x; mean, var, gamma,
    beta)); w, bias) where (mean, var) came from the producing conv's
    ``emit_stats`` epilogue (or ``stats_op``). Optional:

    - ``emit_stats``: also return this output's (mean, var) for the next
      consumer — returns (y, mean_y, var_y);
    - ``epi`` = (short, mean_s, var_s, gamma_s, beta_s): fold the projected
      shortcut's InstanceNorm apply + residual add into the store epilogue
      (ResUNetResidualBlock/Stem pattern) — y += short_hat."""
    return _conv_op_call(
        x, w, bias, stride, padding, pad_mode, act, alpha, eps,
        mean=mean, var=var, gamma=gamma, beta=beta,
        emit_stats=emit_stats, epi=epi,
    )


def preact_conv(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding="same",
    pad_mode: str = "reflect",
    act: str = "relu",
    alpha: float = 0.2,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """conv3d(act(instance_norm(x; gamma, beta)); w, bias) on (B, X, C, Y, Z).

    Numerically matches models.layers.InstanceNorm(act=...) followed by
    ConvND on the NXCYZ layout (same f32 statistics, same compute-dtype
    elementwise arithmetic, same conv kernels). gamma/beta: (C,) f32."""
    k = tuple(w.shape[:3])
    stride = C._norm_stride(stride)
    pads = C._norm_padding(padding, k, stride, (x.shape[1], x.shape[3], x.shape[4]))
    fn = _make_fused(
        stride, pads, pad_mode, act, float(alpha), float(eps), bias is not None
    )
    if bias is not None:
        return fn(x, gamma, beta, w, bias)
    return fn(x, gamma, beta, w)


# ---------------------------------------------------------------------------
# Output-activation conv (VNet family, vnet_model.py:119-130): the reference
# applies the conv ACTIVATION BEFORE the norm (Keras Conv3D(activation=...)
# then IN), so the chainable unit is ``act(conv(x))`` with the activation in
# the store epilogue — the emitted stats then describe the activated tensor,
# which is exactly what the following InstanceNorm consumes
# (instnorm.apply_with_stats with act='none'). Backward recovers act' from
# the STORED output (relu: y > 0 <=> pre > 0; leaky: sign preserved for
# alpha > 0), so no pre-activation tensor is ever materialised.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_act_conv(
    stride: Tuple[int, int, int],
    pads: Pad3,
    pad_mode: str,
    act: str,
    alpha: float,
    has_bias: bool,
    emit: bool,
):
    (lox, hix), (loy, hiy), z_pad = pads
    z_mode = "reflect" if pad_mode == "reflect" else "zeros"
    has_xy_pad = bool(lox or hix or loy or hiy)

    def _pad(x):
        if not has_xy_pad:
            return x
        mode = "reflect" if pad_mode == "reflect" else "constant"
        return jnp.pad(
            x, ((0, 0), (lox, hix), (0, 0), (loy, hiy), (0, 0)), mode=mode
        )

    @jax.custom_vjp
    def op(ops):
        return C._conv_fwd(
            _pad(ops["x"]), ops["w"], ops.get("bias"), stride, z_pad, z_mode,
            oact=(act, alpha), emit_stats=emit,
        )

    def fwd(ops):
        r = C._conv_fwd(
            _pad(ops["x"]), ops["w"], ops.get("bias"), stride, z_pad, z_mode,
            oact=(act, alpha), emit_stats=emit,
        )
        y = r[0] if emit else r
        mean_y = r[1] if emit else None
        return r, (ops, y, mean_y)

    def bwd(res, g):
        ops, y, mean_y = res
        if emit:
            gy, gm, gv = g
            n_out = y.shape[1] * y.shape[3] * y.shape[4]
            gy = (
                gy.astype(jnp.float32)
                + _bc(gm) / n_out
                + _bc(gv) * (2.0 / n_out) * (y.astype(jnp.float32) - _bc(mean_y))
            )
        else:
            gy = g.astype(jnp.float32)
        # act' from the stored (activated) output — exact for relu (y > 0
        # <=> pre > 0; both give 0 gradient at the tie) and for leaky_relu
        # with alpha > 0 (sign-preserving; the pre == 0 tie is measure-zero)
        yf = y.astype(jnp.float32)
        if act == "relu":
            gy = gy * (yf > 0).astype(jnp.float32)
        elif act == "leaky_relu":
            gy = gy * jnp.where(yf > 0, 1.0, alpha)
        g_pre = gy.astype(y.dtype)
        x, w = ops["x"], ops["w"]
        xp = _pad(x)
        dtp = C._conv_dgrad(g_pre, w, xp.shape, stride, z_pad, z_mode).astype(x.dtype)
        if has_xy_pad:
            _, pvjp = jax.vjp(_pad, x)
            (dt,) = pvjp(dtp)
        else:
            dt = dtp
        grads = {"x": dt, "w": C._conv_wgrad(
            xp, g_pre, w.shape[:3], stride, z_pad, z_mode).astype(w.dtype)}
        if has_bias:
            grads["bias"] = jnp.sum(gy, axis=(0, 1, 3, 4), dtype=jnp.float32)
        return (grads,)

    op.defvjp(fwd, bwd)
    return op


def conv_act_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding="same",
    pad_mode: str = "reflect",
    act: str = "relu",
    alpha: float = 0.2,
    emit_stats: bool = True,
):
    """act(conv3d_cxyz(x; w, bias)) with the activation in the store epilogue;
    with ``emit_stats`` also returns the activated output's per-(B, C) f32
    InstanceNorm (mean, var) — returns (y, mean, var)."""
    k = tuple(w.shape[:3])
    stride = C._norm_stride(stride)
    pads = C._norm_padding(padding, k, stride, (x.shape[1], x.shape[3], x.shape[4]))
    fn = _make_act_conv(stride, pads, pad_mode, act, float(alpha),
                        bias is not None, emit_stats)
    ops = {"x": x, "w": w}
    if bias is not None:
        ops["bias"] = bias
    return fn(ops)


# ---------------------------------------------------------------------------
# Dual block-entry (round 3b): a residual block has TWO readers of its input
# x — block1's (optionally prologue'd) 3^3 conv and the projected 1^3
# shortcut conv (resunet_model.py:103-143 / :185-210). dual_entry computes
# both in ONE Pallas launch from ONE slab DMA (conv3d.py ``dual`` arm), with
# both outputs' InstanceNorm stats emitted — the block entry drops from 2
# launches + 2 full HBM reads of x to 1 + 1. The backward composes the
# existing dgrad/wgrad/bwd_ext_fused ops (no new backward kernels).
# ---------------------------------------------------------------------------


def dual_entry_supported(
    x_shape: Tuple[int, ...],
    stride: Tuple[int, int, int],
    co1: int,
    cos: int,
    itemsize: int = 2,
    pro: bool = True,
) -> bool:
    """Gate for dual_entry: tap-form 3^3 reflect-pad-1 main conv + 1^3
    zero-pad shortcut, same iso stride; every fwd/bwd kernel must fit and
    (under pro) the instnorm kernels must tile x. Shapes that would prefer
    the B formulation (ci >= 32, co <= 32) fall back to two separate ops —
    the dual arm is tap-form only."""
    if not (C.pallas_active() and len(x_shape) == 5):
        return False
    b, xdim, ci, ydim, zin = x_shape
    if stride[0] != stride[1] or stride[1] != stride[2] or stride[0] not in (1, 2):
        return False
    if not (2 <= ci < 128 and 2 <= co1 < 128 and 2 <= cos < 128):
        return False
    if ci >= 32 and co1 <= 32:  # form_b shape class
        return False
    if pro and not IN.instance_norm_act_supported(x_shape, "NXCYZ"):
        return False
    k = (3, 3, 3)
    zp = max(128, C._round_up(zin, 128))
    return (
        C._stack_bytes(1, 8, k, stride, ci, co1, zp, itemsize, pro=pro,
                       stats=True, dual_cos=cos) <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, k, (1, 1, 1), co1, ci, zp, itemsize)
        <= C._VMEM_BUDGET
        and C._stack_bytes(1, 8, (1, 1, 1), (1, 1, 1), cos, ci, zp, itemsize)
        <= C._VMEM_BUDGET
    )


@functools.lru_cache(maxsize=None)
def _make_dual_entry(stride: Tuple[int, int, int], act: str, alpha: float,
                     eps: float, has_pro: bool):
    """custom_vjp for one static dual-entry config (3^3 reflect-pad-1 main
    conv [optionally IN+act prologue'd] + 1^3 zero-pad shortcut, iso
    stride)."""
    z_pad = (1, 1)

    def _pad(x):
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)),
                       mode="reflect")

    def _scals(ops):
        if not has_pro:
            return None, None
        inv = lax.rsqrt(ops["var"] + eps)
        a = inv * ops["gamma"][None, :]
        b = ops["beta"][None, :] - ops["mean"] * a
        return (a, b, act, alpha), (inv, a, b)

    @jax.custom_vjp
    def op(ops):
        pro_k, _ = _scals(ops)
        return C._conv_fwd(
            _pad(ops["x"]), ops["w1"], None, stride, z_pad, "reflect",
            pro=pro_k, emit_stats=True, dual=(ops["ws"], 1, 1),
        )

    def fwd(ops):
        pro_k, scal = _scals(ops)
        r = C._conv_fwd(
            _pad(ops["x"]), ops["w1"], None, stride, z_pad, "reflect",
            pro=pro_k, emit_stats=True, dual=(ops["ws"], 1, 1),
        )
        # residuals: both outputs + their means feed the emit folds
        return r, (ops, scal, (r[0], r[1]), (r[3], r[4]))

    def bwd(res, g):
        ops, scal, (y1, m1), (ys_, ms) = res
        gy1, gm1, gv1, gys, gms, gvs = g
        n = y1.shape[1] * y1.shape[3] * y1.shape[4]

        def _fold(gy, gm, gv, y, mean):
            return (
                gy.astype(jnp.float32)
                + _bc(gm) / n
                + _bc(gv) * (2.0 / n) * (y.astype(jnp.float32) - _bc(mean))
            ).astype(gy.dtype)

        gy1 = _fold(gy1, gm1, gv1, y1, m1)
        gys = _fold(gys, gms, gvs, ys_, ms)
        x, w1, ws = ops["x"], ops["w1"], ops["ws"]
        xp = _pad(x)
        grads = {}
        dtp = C._conv_dgrad(gy1, w1, xp.shape, stride, z_pad, "reflect").astype(x.dtype)
        _, pvjp = jax.vjp(_pad, x)
        (dt1,) = pvjp(dtp)
        pro_k = None
        if has_pro:
            inv, a, b = scal
            dx1, sum_gp, sum_xg = IN.bwd_ext_fused(
                x, dt1, a, b, ops["mean"], inv, act, alpha
            )
            grads["gamma"] = jnp.sum(sum_xg, axis=0)
            grads["beta"] = jnp.sum(sum_gp, axis=0)
            grads["mean"] = -a * sum_gp
            grads["var"] = -(a * inv * 0.5) * sum_xg
            pro_k = (a, b, act, alpha)
        else:
            dx1 = dt1
        grads["w1"] = C._conv_wgrad(
            xp, gy1, (3, 3, 3), stride, z_pad, "reflect", pro=pro_k
        ).astype(w1.dtype)
        # shortcut: plain 1^3 zero-pad conv backward on the UNPADDED x
        dxs = C._conv_dgrad(gys, ws, x.shape, stride, (0, 0), "zeros").astype(x.dtype)
        grads["ws"] = C._conv_wgrad(
            x, gys, (1, 1, 1), stride, (0, 0), "zeros"
        ).astype(ws.dtype)
        grads["x"] = dx1 + dxs
        return (grads,)

    op.defvjp(fwd, bwd)
    return op


def dual_entry(
    x: jnp.ndarray,
    stats,
    gamma,
    beta,
    w1: jnp.ndarray,
    ws: jnp.ndarray,
    stride=1,
    act: str = "relu",
    alpha: float = 0.2,
    eps: float = 1e-3,
):
    """The residual-block entry in one launch: ``r1 = conv3x3(act(IN(x)))``
    (or a raw conv when gamma is None — the Stem's conv1 has no preceding
    norm) AND ``sc = conv1x1(x)``, both with emitted stats. ``stats`` =
    (mean, var) of x from the producer (or None -> stats_op). Returns
    (r1, m1, v1, sc, m_s, v_s). Gate with dual_entry_supported."""
    stride = C._norm_stride(stride)
    has_pro = gamma is not None
    fn = _make_dual_entry(stride, act, float(alpha), float(eps), has_pro)
    ops = {"x": x, "w1": w1, "ws": ws}
    if has_pro:
        if stats is None:
            stats = stats_op(x)
        ops.update(mean=stats[0], var=stats[1], gamma=gamma, beta=beta)
    return fn(ops)
