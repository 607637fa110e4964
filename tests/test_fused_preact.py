"""Interpret-mode parity for the fused pre-activation conv
(ops/pallas/fused_preact.py): InstanceNorm + act folded into the consumer
conv's slab prologue.

Three oracles:
  1. the unfused Pallas composition (instnorm.instance_norm_act ->
     conv3d_cxyz) — the fused op must match it essentially bit-for-bit
     (identical per-element arithmetic, values AND all five gradients);
  2. a pure-jnp f32 reference (catches bugs shared by both kernel paths);
  3. the flax module graph: PreActConvBlock with VANGAN_FUSE_PREACT on/off
     must produce identical param trees, outputs, and gradients.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.ops.pallas import conv3d as C
from vangan_tpu.ops.pallas import instnorm as IN
from vangan_tpu.ops.pallas import fused_preact as FP


def _interp():
    class _Both:
        def __enter__(self):
            self._a = C.force_interpret()
            self._b = IN.force_interpret()
            self._a.__enter__()
            self._b.__enter__()

        def __exit__(self, *exc):
            self._b.__exit__(*exc)
            self._a.__exit__(*exc)

    return _Both()


def _jnp_ref(x, gamma, beta, w, bias, stride, pads, pad_mode, act, alpha, eps):
    mean = jnp.mean(x, axis=(1, 3, 4), keepdims=True, dtype=jnp.float32)
    xc = x.astype(jnp.float32) - mean
    var = jnp.mean(jax.lax.square(xc), axis=(1, 3, 4), keepdims=True,
                   dtype=jnp.float32)
    t = xc * jax.lax.rsqrt(var + eps)
    t = t * gamma.reshape(1, 1, -1, 1, 1) + beta.reshape(1, 1, -1, 1, 1)
    if act == "relu":
        t = jnp.maximum(t, 0.0)
    elif act == "leaky_relu":
        t = jnp.where(t >= 0, t, alpha * t)
    t = t.astype(x.dtype)
    return C.conv3d_cxyz_reference(t, w, bias, stride, pads, pad_mode)


def _unfused_pallas(x, gamma, beta, w, bias, stride, pads, pad_mode, act, alpha, eps):
    t = IN.instance_norm_act(x, gamma, beta, eps, act, alpha)
    return C.conv3d_cxyz(t, w, bias, stride, pads, pad_mode)


def _check(rng, k, stride, pads, pad_mode, act, ci, co, shape=(2, 8, 10, 9),
           bias_on=True, alpha=0.2, eps=1e-3):
    b_dim, X, Y, Z = shape
    x = jnp.asarray(rng.normal(size=(b_dim, X, ci, Y, Z)) * 2 + 0.5, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(ci,)) * 0.5 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(ci,)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(co,)), jnp.float32) if bias_on else None

    args = (x, gamma, beta, w) + ((bias,) if bias_on else ())
    argnums = tuple(range(len(args)))

    with _interp():
        y = FP.preact_conv(x, gamma, beta, w, bias, stride, pads, pad_mode,
                           act, alpha, eps)
        y_u = _unfused_pallas(x, gamma, beta, w, bias, stride, pads, pad_mode,
                              act, alpha, eps)
        y_r = _jnp_ref(x, gamma, beta, w, bias, stride, pads, pad_mode,
                       act, alpha, eps)
        assert y.shape == y_u.shape == y_r.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_u),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                                   atol=2e-3, rtol=2e-3)

        ct = jnp.asarray(rng.normal(size=y.shape), jnp.float32)

        def loss_f(*a):
            bb = a[4] if bias_on else None
            return jnp.sum(FP.preact_conv(a[0], a[1], a[2], a[3], bb, stride,
                                          pads, pad_mode, act, alpha, eps) * ct)

        def loss_u(*a):
            bb = a[4] if bias_on else None
            return jnp.sum(_unfused_pallas(a[0], a[1], a[2], a[3], bb, stride,
                                           pads, pad_mode, act, alpha, eps) * ct)

        gf = jax.grad(loss_f, argnums=argnums)(*args)
        gu = jax.grad(loss_u, argnums=argnums)(*args)
    names = ("dx", "dgamma", "dbeta", "dw", "dbias")
    for name, a_, b_ in zip(names, gf, gu):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a_) / scale, np.asarray(b_) / scale, atol=2e-4,
            err_msg=f"{name} mismatch k={k} s={stride} act={act} ci={ci} co={co}",
        )


@pytest.mark.quick
def test_preact_conv3x3_relu(rng):
    """The PreActConvBlock workhorse: IN+ReLU -> reflect-pad 3^3 conv
    (resunet_model.py:42-66)."""
    _check(rng, (3, 3, 3), (1, 1, 1), ((1, 1),) * 3, "reflect", "relu", ci=6, co=4)


@pytest.mark.quick
def test_preact_conv3x3_stride2(rng):
    """Stride-2 encoder pre-act conv (resunet_model.py:103-143)."""
    _check(rng, (3, 3, 3), (2, 2, 2), ((1, 1),) * 3, "reflect", "relu", ci=4, co=6)


def test_preact_conv1x1_form_b(rng):
    """1^3 kernel triggers the B formulation — prologue on merged y/z lanes."""
    _check(rng, (1, 1, 1), (1, 1, 1), ((0, 0),) * 3, "zeros", "relu", ci=4, co=4)


def test_preact_leaky_and_none(rng):
    _check(rng, (3, 3, 3), (1, 1, 1), ((1, 1),) * 3, "reflect", "leaky_relu",
           ci=3, co=2)
    _check(rng, (3, 3, 3), (1, 1, 1), ((1, 1),) * 3, "reflect", "none",
           ci=3, co=2, bias_on=False)


@pytest.mark.slow
def test_preact_wide_input_form_b(rng):
    """ci >= 32, co <= 32: the dec-block shape class that selects form_b."""
    _check(rng, (3, 3, 3), (1, 1, 1), ((1, 1),) * 3, "reflect", "relu",
           ci=32, co=4, shape=(1, 6, 8, 9))


def test_preact_bf16_close(rng):
    """bf16 fused matches the bf16 unfused Pallas composition tightly (same
    per-element arithmetic) and the f32 jnp reference loosely."""
    x = jnp.asarray(rng.normal(size=(1, 8, 4, 8, 9)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(size=(4,)) * 0.5 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(4,)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)) * 0.3, jnp.bfloat16)
    with _interp():
        y = FP.preact_conv(x, gamma, beta, w, None, (1, 1, 1), ((1, 1),) * 3,
                           "reflect", "relu")
        y_u = _unfused_pallas(x, gamma, beta, w, None, (1, 1, 1), ((1, 1),) * 3,
                              "reflect", "relu", 0.2, 1e-3)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_u, np.float32), atol=0.08, rtol=0.05)


@pytest.mark.quick
def test_supported_gate():
    with _interp():
        ok = FP.preact_conv_supported(
            (1, 128, 16, 128, 128), (3, 3, 3), (1, 1, 1), ((1, 1),) * 3,
            "reflect", "relu", co=16)
        assert ok
        # zero x/y pads do not commute with the prologue
        assert not FP.preact_conv_supported(
            (1, 128, 16, 128, 128), (3, 3, 3), (1, 1, 1), ((1, 1),) * 3,
            "zeros", "relu", co=16)
        # pad-free zero-mode is fine (virtual z pad is exact under pro)
        assert FP.preact_conv_supported(
            (1, 128, 16, 128, 128), (1, 1, 1), (1, 1, 1), ((0, 0),) * 3,
            "zeros", "relu", co=16)
        # C = 1 has no instnorm kernel support
        assert not FP.preact_conv_supported(
            (1, 128, 1, 128, 128), (3, 3, 3), (1, 1, 1), ((1, 1),) * 3,
            "reflect", "relu", co=16)


def _block_outputs(monkeypatch, x, fuse: bool, strides: int = 1):
    from vangan_tpu.models.layers import PreActConvBlock

    monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
    blk = PreActConvBlock(4, strides=strides, layout="NXCYZ")
    with _interp():
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)

        def loss(p):
            return jnp.sum(blk.apply(p, x) ** 2)

        grads = jax.grad(loss)(params)
    return params, y, grads


@pytest.mark.parametrize("strides", [1, 2])
def test_preact_block_fused_equals_unfused(monkeypatch, rng, strides):
    """PreActConvBlock: env on/off gives the same param tree, output, grads
    (checkpoint portability across the flag)."""
    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8, 33)), jnp.float32)
    p0, y0, g0 = _block_outputs(monkeypatch, x, fuse=False, strides=strides)
    p1, y1, g1 = _block_outputs(monkeypatch, x, fuse=True, strides=strides)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4, rtol=1e-4)
    # identical tree structure (asserted above) => leaves zip in order
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = float(jnp.max(jnp.abs(a_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=2e-4, err_msg=jax.tree_util.keystr(k0))


def test_preact_block_fallback_off_tpu(monkeypatch, rng):
    """env on, but no TPU and no interpret: ConvND's unfused fallback must be
    function-identical to the env-off module graph (same jnp path)."""
    from vangan_tpu.models.layers import PreActConvBlock

    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8, 9)), jnp.float32)
    blk = PreActConvBlock(4, layout="NXCYZ")
    monkeypatch.setenv("VANGAN_FUSE_PREACT", "0")
    p0 = blk.init(jax.random.PRNGKey(0), x)
    y0 = blk.apply(p0, x)
    monkeypatch.setenv("VANGAN_FUSE_PREACT", "1")
    p1 = blk.init(jax.random.PRNGKey(0), x)
    y1 = blk.apply(p1, x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


# ---------------------------------------------------------------------------
# emit_stats / epi arms of conv3d._conv_fwd — the chain-fusion building
# blocks (a producing conv emits its consumer's InstanceNorm statistics; a
# residual block's projected-shortcut norm+add folds into the epilogue).
# ---------------------------------------------------------------------------


def _stats_ref(y):
    mean = jnp.mean(y, axis=(1, 3, 4), dtype=jnp.float32)
    yc = y.astype(jnp.float32) - mean[:, None, :, None, None]
    var = jnp.mean(jax.lax.square(yc), axis=(1, 3, 4), dtype=jnp.float32)
    return mean, var


def _mk_conv(rng, b, X, ci, Y, Z, k, co, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(b, X, ci, Y, Z)), dtype)
    w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.3, dtype)
    xp = (
        jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)), mode="reflect")
        if k[0] == 3
        else x
    )
    return xp, w


@pytest.mark.quick
def test_conv_emit_stats_in_kernel(rng):
    """Block-exact shape: the Welford row merge runs in the kernel epilogue;
    emitted stats equal jnp stats of the returned output, and the output is
    bit-identical to the stats-free call."""
    xp, w = _mk_conv(rng, 2, 8, 4, 8, 9, (3, 3, 3), 4)
    with _interp():
        y0 = C._conv_fwd(xp, w, None, (1, 1, 1), (1, 1), "reflect")
        y, mean, var = C._conv_fwd(
            xp, w, None, (1, 1, 1), (1, 1), "reflect", emit_stats=True
        )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y0))
    m_r, v_r = _stats_ref(y0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_r), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_r), atol=1e-5, rtol=1e-4)


@pytest.mark.quick
def test_conv_emit_stats_form_b(rng):
    """1^3 kernel selects the B formulation — its stats epilogue path."""
    xp, w = _mk_conv(rng, 1, 8, 4, 8, 9, (1, 1, 1), 4)
    with _interp():
        y, mean, var = C._conv_fwd(
            xp, w, None, (1, 1, 1), (0, 0), "zeros", emit_stats=True
        )
    m_r, v_r = _stats_ref(y)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_r), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_r), atol=1e-5, rtol=1e-4)


def test_conv_emit_stats_overcompute_fallback(rng):
    """yo=10 forces block over-compute (yo_c=16 > 10): stats must come from
    the jnp fallback pass over REAL voxels only, never the padded rows."""
    xp, w = _mk_conv(rng, 1, 8, 4, 10, 9, (3, 3, 3), 4)
    with _interp():
        y, mean, var = C._conv_fwd(
            xp, w, None, (1, 1, 1), (1, 1), "reflect", emit_stats=True
        )
    assert y.shape[3] == 10
    m_r, v_r = _stats_ref(y)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_r), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_r), atol=1e-5, rtol=1e-4)


def _epi_ref(y0, short, ea, eb):
    return (
        y0.astype(jnp.float32)
        + short.astype(jnp.float32) * ea[:, None, :, None, None]
        + eb[:, None, :, None, None]
    ).astype(y0.dtype)


@pytest.mark.quick
def test_conv_epilogue_shortcut_add(rng):
    """epi=(short, a_s, b_s): output == conv + short*a_s + b_s (the
    projected-shortcut InstanceNorm apply + residual add), tap formulation."""
    xp, w = _mk_conv(rng, 2, 8, 4, 8, 9, (3, 3, 3), 4)
    with _interp():
        y0 = C._conv_fwd(xp, w, None, (1, 1, 1), (1, 1), "reflect")
        short = jnp.asarray(rng.normal(size=y0.shape), y0.dtype)
        ea = jnp.asarray(rng.normal(size=(2, 4)) * 0.5 + 1, jnp.float32)
        eb = jnp.asarray(rng.normal(size=(2, 4)) * 0.3, jnp.float32)
        y = C._conv_fwd(
            xp, w, None, (1, 1, 1), (1, 1), "reflect", epi=(short, ea, eb)
        )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_epi_ref(y0, short, ea, eb)), atol=1e-5, rtol=1e-5
    )


@pytest.mark.quick
def test_conv_epilogue_form_b_and_stats(rng):
    """B formulation epi + emitted stats together: stats describe the
    epilogue-COMPLETE output (what the consumer's InstanceNorm sees)."""
    xp, w = _mk_conv(rng, 1, 8, 4, 8, 9, (1, 1, 1), 4)
    with _interp():
        y0 = C._conv_fwd(xp, w, None, (1, 1, 1), (0, 0), "zeros")
        short = jnp.asarray(rng.normal(size=y0.shape), y0.dtype)
        ea = jnp.asarray(rng.normal(size=(1, 4)) * 0.5 + 1, jnp.float32)
        eb = jnp.asarray(rng.normal(size=(1, 4)) * 0.3, jnp.float32)
        y, mean, var = C._conv_fwd(
            xp, w, None, (1, 1, 1), (0, 0), "zeros",
            epi=(short, ea, eb), emit_stats=True,
        )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_epi_ref(y0, short, ea, eb)), atol=1e-5, rtol=1e-5
    )
    m_r, v_r = _stats_ref(y)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_r), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_r), atol=1e-5, rtol=1e-4)


def test_conv_epi_overcompute_short_pad(rng):
    """Over-computed rows (yo=10 -> yo_c=16): the shortcut is zero-padded to
    the block grid and the padded rows are trimmed — real rows exact."""
    xp, w = _mk_conv(rng, 1, 8, 4, 10, 9, (3, 3, 3), 4)
    with _interp():
        y0 = C._conv_fwd(xp, w, None, (1, 1, 1), (1, 1), "reflect")
        short = jnp.asarray(rng.normal(size=y0.shape), y0.dtype)
        ea = jnp.asarray(rng.normal(size=(1, 4)) * 0.5 + 1, jnp.float32)
        eb = jnp.asarray(rng.normal(size=(1, 4)) * 0.3, jnp.float32)
        y = C._conv_fwd(
            xp, w, None, (1, 1, 1), (1, 1), "reflect", epi=(short, ea, eb)
        )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_epi_ref(y0, short, ea, eb)), atol=1e-5, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# Stats-chaining ops: conv_stats -> preact_conv_ext (+epi) composition.
# Oracle: the unfused Pallas/jnp composition; the per-op custom_vjps must
# compose to the same gradients through a full residual-block-shaped chain.
# ---------------------------------------------------------------------------


def test_stats_op_grads(rng):
    """stats_op == instnorm stats; its vjp == jax.grad of the jnp stats."""
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 8, 9)) * 2 + 1, jnp.float32)
    gm = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    gv = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)

    def jnp_loss(x_):
        m = jnp.mean(x_, axis=(1, 3, 4), dtype=jnp.float32)
        v = jnp.mean(
            jax.lax.square(x_.astype(jnp.float32) - m[:, None, :, None, None]),
            axis=(1, 3, 4))
        return jnp.sum(m * gm) + jnp.sum(v * gv)

    def op_loss(x_):
        m, v = FP.stats_op(x_)
        return jnp.sum(m * gm) + jnp.sum(v * gv)

    with _interp():
        m, v = FP.stats_op(x)
        m_r = jnp.mean(x, axis=(1, 3, 4), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_r), atol=1e-5)
        g_op = jax.grad(op_loss)(x)
        g_ref = jax.grad(jnp_loss)(x)
    np.testing.assert_allclose(np.asarray(g_op), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.quick
def test_chained_preact_matches_unchained(rng):
    """conv_stats -> preact_conv_ext == conv -> IN+act -> conv (values and
    d/d{x, w1, w2, gamma, beta}): the emitted-stats vjp fold is exercised."""
    ci, cm, co = 3, 4, 4
    x = jnp.asarray(rng.normal(size=(2, 8, ci, 8, 9)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, cm)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, cm, co)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(cm,)) * 0.5 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(cm,)) * 0.3, jnp.float32)
    pads = ((1, 1),) * 3

    def chained(x, w1, w2, gamma, beta):
        t, m, v = FP.conv_stats(x, w1, None, (1, 1, 1), pads, "reflect")
        return FP.preact_conv_ext(t, m, v, gamma, beta, w2, None, (1, 1, 1),
                                  pads, "reflect", "relu")

    def unchained(x, w1, w2, gamma, beta):
        t = C.conv3d_cxyz(x, w1, None, (1, 1, 1), pads, "reflect")
        u = IN.instance_norm_act(t, gamma, beta, 1e-3, "relu", 0.2)
        return C.conv3d_cxyz(u, w2, None, (1, 1, 1), pads, "reflect")

    args = (x, w1, w2, gamma, beta)
    with _interp():
        y_c = chained(*args)
        y_u = unchained(*args)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                                   atol=1e-4, rtol=1e-4)
        ct = jnp.asarray(rng.normal(size=y_c.shape), jnp.float32)
        g_c = jax.grad(lambda *a: jnp.sum(chained(*a) * ct), argnums=(0, 1, 2, 3, 4))(*args)
        g_u = jax.grad(lambda *a: jnp.sum(unchained(*a) * ct), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a_, b_ in zip(("dx", "dw1", "dw2", "dgamma", "dbeta"), g_c, g_u):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=3e-4, err_msg=name)


@pytest.mark.quick
def test_fused_resblock_shape_matches_unfused(rng):
    """Full ResUNetResidualBlock wiring as raw ops: shortcut conv_stats +
    block1 (pro, emit) + block2 (pro, epi, emit) == the unfused composition,
    values AND grads for every param, INCLUDING the emitted out-stats path
    (a consumer loss on mean_out/var_out)."""
    ci, f = 3, 4
    s = (2, 2, 2)
    x = jnp.asarray(rng.normal(size=(1, 8, ci, 8, 17)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, f)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, f, f)) * 0.3, jnp.float32)
    ws = jnp.asarray(rng.normal(size=(1, 1, 1, ci, f)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    g1 = jnp.asarray(rng.normal(size=(ci,)) * 0.3 + 1, jnp.float32)
    be1 = jnp.asarray(rng.normal(size=(ci,)) * 0.3, jnp.float32)
    g2 = jnp.asarray(rng.normal(size=(f,)) * 0.3 + 1, jnp.float32)
    be2 = jnp.asarray(rng.normal(size=(f,)) * 0.3, jnp.float32)
    gs = jnp.asarray(rng.normal(size=(f,)) * 0.3 + 1, jnp.float32)
    bes = jnp.asarray(rng.normal(size=(f,)) * 0.3, jnp.float32)
    pads = ((1, 1),) * 3

    def fused(x, w1, w2, ws, b2, g1, be1, g2, be2, gs, bes):
        m_x, v_x = FP.stats_op(x)  # block entry (producer not in scope)
        sc, m_s, v_s = FP.conv_stats(x, ws, None, s, ((0, 0),) * 3, "zeros")
        r1, m1, v1 = FP.preact_conv_ext(x, m_x, v_x, g1, be1, w1, None, s,
                                        pads, "reflect", "relu",
                                        emit_stats=True)
        out, m_o, v_o = FP.preact_conv_ext(
            r1, m1, v1, g2, be2, w2, b2, (1, 1, 1), pads, "reflect", "relu",
            emit_stats=True, epi=(sc, m_s, v_s, gs, bes))
        return out, m_o, v_o

    def unfused(x, w1, w2, ws, b2, g1, be1, g2, be2, gs, bes):
        t1 = IN.instance_norm_act(x, g1, be1, 1e-3, "relu", 0.2)
        r1 = C.conv3d_cxyz(t1, w1, None, s, pads, "reflect")
        t2 = IN.instance_norm_act(r1, g2, be2, 1e-3, "relu", 0.2)
        r2 = C.conv3d_cxyz(t2, w2, b2, (1, 1, 1), pads, "reflect")
        sc = C.conv3d_cxyz(x, ws, None, s, ((0, 0),) * 3, "zeros")
        scn = IN.instance_norm_act(sc, gs, bes, 1e-3, "none", 0.2)
        out = r2 + scn
        m = jnp.mean(out, axis=(1, 3, 4), dtype=jnp.float32)
        v = jnp.mean(jax.lax.square(out.astype(jnp.float32)
                                    - m[:, None, :, None, None]), axis=(1, 3, 4))
        return out, m, v

    args = (x, w1, w2, ws, b2, g1, be1, g2, be2, gs, bes)
    argnums = tuple(range(len(args)))
    with _interp():
        o_f, m_f, v_f = fused(*args)
        o_u, m_u, v_u = unfused(*args)
        np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_u),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_u), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_u),
                                   atol=1e-5, rtol=1e-4)
        ct = jnp.asarray(rng.normal(size=o_f.shape), jnp.float32)
        cm = jnp.asarray(rng.normal(size=m_f.shape), jnp.float32)

        def loss(fn):
            def go(*a):
                o, m, v = fn(*a)
                # out cotangent + stats cotangents (the chained-consumer case)
                return jnp.sum(o * ct) + jnp.sum(m * cm) + jnp.sum(v * cm)
            return go

        g_f = jax.grad(loss(fused), argnums=argnums)(*args)
        g_u = jax.grad(loss(unfused), argnums=argnums)(*args)
    names = ("dx", "dw1", "dw2", "dws", "db2", "dg1", "dbe1", "dg2", "dbe2",
             "dgs", "dbes")
    for name, a_, b_ in zip(names, g_f, g_u):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=3e-4, err_msg=name)


@pytest.mark.slow
def test_resunet_chain_fused_equals_unfused(monkeypatch, rng):
    """Whole-model chain: ResUNet3D with VANGAN_FUSE_PREACT on/off gives the
    same param tree, output, and gradients — the stem->encoder->bridge->
    decoder stats threading (incl. concat'd skip stats and upsample
    preservation) against the unfused module graph."""
    from vangan_tpu.models.resunet import ResUNet3D

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)), jnp.float32)

    def run(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        m = ResUNet3D(filters=4, num_layers=2, upsample_mode="simple",
                      layout="NXCYZ", dropout_type="none")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run(False)
    p1, y1, g1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)
    # Per-leaf scale is floored by a fraction of the global gradient scale:
    # interior conv/IN biases are TRUE-ZERO gradients here (a per-channel
    # constant shift of any interior tensor is annihilated by the next
    # InstanceNorm on every downstream path — only dec0.block2/head biases
    # have an IN-free path out), so both graphs compute ~1e-5 f32 noise for
    # them and a bare per-leaf relative comparison amplifies that noise into
    # spurious O(1) "mismatches".
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


# ---------------------------------------------------------------------------
# Stats-external InstanceNorm apply (instnorm.apply_with_stats) — the
# discriminator chain: conv emits stats -> the norm consumes them (no
# standalone stats launch). Oracles as above: the internal-stats Pallas op
# and the module graph with the flag off.
# ---------------------------------------------------------------------------


@pytest.mark.quick
@pytest.mark.parametrize("act", ["leaky_relu", "none"])
def test_apply_with_stats_matches_internal(rng, act):
    """stats_op -> apply_with_stats == instance_norm_act (values and
    d/d{x, gamma, beta}): the external-stats backward composed with the
    stats vjp must reproduce the monolithic internal-stats backward."""
    c = 5
    x = jnp.asarray(rng.normal(size=(2, 8, c, 8, 17)) * 2 + 0.3, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.4 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.3, jnp.float32)

    def ext(x, gamma, beta):
        m, v = FP.stats_op(x)
        return IN.apply_with_stats(x, m, v, gamma, beta, 1e-3, act, 0.2)

    def internal(x, gamma, beta):
        return IN.instance_norm_act(x, gamma, beta, 1e-3, act, 0.2)

    with _interp():
        y_e = ext(x, gamma, beta)
        y_i = internal(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_i),
                                   atol=1e-5, rtol=1e-5)
        ct = jnp.asarray(rng.normal(size=y_e.shape), jnp.float32)
        g_e = jax.grad(lambda *a: jnp.sum(ext(*a) * ct), argnums=(0, 1, 2))(
            x, gamma, beta)
        g_i = jax.grad(lambda *a: jnp.sum(internal(*a) * ct), argnums=(0, 1, 2))(
            x, gamma, beta)
    for name, a_, b_ in zip(("dx", "dgamma", "dbeta"), g_e, g_i):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=3e-5, err_msg=name)


@pytest.mark.quick
def test_conv_emit_to_apply_matches_unchained(rng):
    """conv_stats -> apply_with_stats == conv -> instance_norm_act, values
    and d/d{x, w, b, gamma, beta} — the full discriminator-block link."""
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, 8, ci, 8, 17)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 4, 4, ci, co)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(co,)) * 0.4 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(co,)) * 0.3, jnp.float32)
    pads = ((1, 1),) * 3

    def chained(x, w, gamma, beta):
        y, m, v = FP.conv_stats(x, w, None, (2, 2, 2), pads, "reflect")
        return IN.apply_with_stats(y, m, v, gamma, beta, 1e-3, "leaky_relu", 0.2)

    def unchained(x, w, gamma, beta):
        y = C.conv3d_cxyz(x, w, None, (2, 2, 2), pads, "reflect")
        return IN.instance_norm_act(y, gamma, beta, 1e-3, "leaky_relu", 0.2)

    with _interp():
        y_c = chained(x, w, gamma, beta)
        y_u = unchained(x, w, gamma, beta)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                                   atol=1e-4, rtol=1e-4)
        ct = jnp.asarray(rng.normal(size=y_c.shape), jnp.float32)
        g_c = jax.grad(lambda *a: jnp.sum(chained(*a) * ct), argnums=(0, 1, 2, 3))(
            x, w, gamma, beta)
        g_u = jax.grad(lambda *a: jnp.sum(unchained(*a) * ct), argnums=(0, 1, 2, 3))(
            x, w, gamma, beta)
    for name, a_, b_ in zip(("dx", "dw", "dgamma", "dbeta"), g_c, g_u):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=3e-4, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("train", [False, True])
def test_discriminator_chain_fused_equals_unfused(monkeypatch, rng, train):
    """PatchGANDiscriminator3D with VANGAN_FUSE_PREACT on/off: identical
    param trees, outputs, and gradients (same rng streams both ways — noise
    and dropout draws are param-tree-keyed, so train=True is exact too)."""
    from vangan_tpu.models.discriminator import PatchGANDiscriminator3D

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32, 1)), jnp.float32)

    def run(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        m = PatchGANDiscriminator3D(
            filters=4, num_downsampling=3, use_dropout=True,
            use_input_noise=True, use_layer_noise=True, layout="NXCYZ",
        )
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        with _interp():
            p = m.init(rngs, x, train=train,
                       noise_std=jnp.asarray(0.1, jnp.float32))

            def fwd(pp):
                return m.apply(pp, x, train=train,
                               noise_std=jnp.asarray(0.1, jnp.float32),
                               rngs={"noise": jax.random.PRNGKey(1),
                                     "dropout": jax.random.PRNGKey(2)})

            y = fwd(p)
            g = jax.grad(lambda pp: jnp.sum(fwd(pp) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run(False)
    p1, y1, g1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)
    # global-scale floor: see test_resunet_chain_fused_equals_unfused (conv
    # biases feeding an InstanceNorm are true-zero gradients)
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


# ---------------------------------------------------------------------------
# ResNet generator family chain (CycleGANResidualBlock: 6 launches -> 3;
# conv_then_inorm links in the stem/down/up stages).
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_cyclegan_block_fused_equals_unfused(monkeypatch, rng):
    """CycleGANResidualBlock with VANGAN_FUSE_PREACT on/off: identical param
    trees, outputs, and gradients (conv1-emit -> inorm1-prologue'd conv2 ->
    stats-external inorm2 -> identity add)."""
    from vangan_tpu.models.layers import CycleGANResidualBlock

    x = jnp.asarray(rng.normal(size=(1, 8, 4, 8, 17)), jnp.float32)

    def run(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        m = CycleGANResidualBlock(4, layout="NXCYZ")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run(False)
    p1, y1, g1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4, rtol=1e-4)
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


@pytest.mark.slow
def test_resnet_generator_chain_fused_equals_unfused(monkeypatch, rng):
    """Whole ResNetGenerator3D, VANGAN_FUSE_PREACT on/off (eval mode): param
    tree, output, and gradient parity through stem/down/res/up chains."""
    from vangan_tpu.models.resnet_generator import ResNetGenerator3D

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)), jnp.float32)

    def run(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        m = ResNetGenerator3D(filters=4, num_downsampling_blocks=1,
                              num_residual_blocks=2, num_upsample_blocks=1,
                              layout="NXCYZ")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run(False)
    p1, y1, g1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


@pytest.mark.slow
def test_resunet_attention_deconv_chain_breakers(monkeypatch, rng):
    """ResUNet3D configs that BREAK the stats chain mid-model (deconv
    upsampling, attention-gated skips -> stats_in=None at the decoder):
    fused == unfused values through the stats_op fallback entry points."""
    from vangan_tpu.models.resunet import ResUNet3D

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)), jnp.float32)
    for kwargs in (
        dict(upsample_mode="deconv"),
        dict(upsample_mode="simple", use_attention_gate=True),
    ):
        def run(fuse):
            monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
            m = ResUNet3D(filters=4, num_layers=2, layout="NXCYZ",
                          dropout_type="none", **kwargs)
            with _interp():
                p = m.init(jax.random.PRNGKey(0), x)
                return p, m.apply(p, x)

        p0, y0 = run(False)
        p1, y1 = run(True)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=2e-4, rtol=2e-4, err_msg=str(kwargs))


@pytest.mark.slow
def test_fused_chain_dp_sharded_step(monkeypatch):
    """One DP-sharded train step on the 8-device virtual mesh with
    VANGAN_FUSE_PREACT=1: the chain's (B, C) stats tensors must shard with
    the batch (per-sample ops — GSPMD should insert no collectives between
    the conv epilogue and its consumer) and produce finite losses equal to
    the unfused step's."""
    import numpy as np_
    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator
    from vangan_tpu.parallel import jit_train_step, make_mesh, put_batch, put_replicated
    from vangan_tpu.training.step import make_step_fns

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")

    def one_step(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        cfg = VanGanConfig(
            N_DEVICES=8, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(16, 16, 16),
            gen_filters=4, disc_filters=4, cldice_iters=2,
            output_dir="/tmp/vg_fp_dp",
        )
        models = {
            "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
            "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
            "disc_I": build_discriminator(cfg),
            "disc_S": build_discriminator(cfg),
        }
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        mesh = make_mesh(8, cfg.mesh_axis)
        state = put_replicated(fns.init(jax.random.PRNGKey(0)), mesh)
        rng_ = np_.random.default_rng(0)
        gb = cfg.GLOBAL_BATCH_SIZE
        real_I = put_batch(jnp.asarray(rng_.normal(size=(gb, 16, 16, 16, 1)), jnp.float32), mesh)
        real_S = put_batch(
            jnp.asarray((rng_.uniform(size=(gb, 16, 16, 16, 1)) > 0.8) * 2.0 - 1.0, jnp.float32),
            mesh,
        )
        step = jit_train_step(fns, mesh, donate=False, axis_name=cfg.mesh_axis)
        _, losses = step(state, real_I, real_S, jax.random.PRNGKey(1),
                         jnp.asarray(0.1, jnp.float32), jnp.asarray(True))
        return {k: float(v) for k, v in losses.items()}

    l0 = one_step(False)
    l1 = one_step(True)
    for k in l0:
        assert np.isfinite(l1[k]), k
        np.testing.assert_allclose(l1[k], l0[k], rtol=2e-3, atol=2e-3, err_msg=k)


# ---------------------------------------------------------------------------
# Output-activation conv (VNet act-then-norm chain: conv_act_stats ->
# stats-external apply).
# ---------------------------------------------------------------------------


@pytest.mark.quick
@pytest.mark.parametrize("act", ["relu", "leaky_relu"])
def test_conv_act_stats_matches_unchained(rng, act):
    """conv_act_stats -> apply_with_stats(act='none') == conv -> act ->
    instance_norm_act: values and d/d{x, w, b, gamma, beta} — the VNet block
    link, incl. the act'-from-stored-output backward."""
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, 8, ci, 8, 17)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(co,)) * 0.4 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(co,)) * 0.3, jnp.float32)
    pads = ((1, 1),) * 3

    def chained(x, w, b, gamma, beta):
        y, m, v = FP.conv_act_stats(x, w, b, (1, 1, 1), pads, "reflect", act, 0.2)
        return IN.apply_with_stats(y, m, v, gamma, beta, 1e-3, "none", 0.2)

    def unchained(x, w, b, gamma, beta):
        y = C.conv3d_cxyz(x, w, b, (1, 1, 1), pads, "reflect")
        y = jnp.maximum(y, 0) if act == "relu" else jnp.where(y >= 0, y, 0.2 * y)
        return IN.instance_norm_act(y, gamma, beta, 1e-3, "none", 0.2)

    args = (x, w, b, gamma, beta)
    with _interp():
        y_c = chained(*args)
        y_u = unchained(*args)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                                   atol=1e-4, rtol=1e-4)
        ct = jnp.asarray(rng.normal(size=y_c.shape), jnp.float32)
        g_c = jax.grad(lambda *a: jnp.sum(chained(*a) * ct),
                       argnums=tuple(range(5)))(*args)
        g_u = jax.grad(lambda *a: jnp.sum(unchained(*a) * ct),
                       argnums=tuple(range(5)))(*args)
    for name, a_, b_ in zip(("dx", "dw", "db", "dgamma", "dbeta"), g_c, g_u):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=3e-4, err_msg=name)


@pytest.mark.slow
def test_vnet_chain_fused_equals_unfused(monkeypatch, rng):
    """VNet3D (use_batch_norm=False -> the IN path) with VANGAN_FUSE_PREACT
    on/off: identical param trees, outputs, and gradients."""
    from vangan_tpu.models.vnet import VNet3D

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)), jnp.float32)

    def run(fuse):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", "1" if fuse else "0")
        m = VNet3D(filters=4, num_layers=2, use_batch_norm=False,
                   dropout=0.0, layout="NXCYZ")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run(False)
    p1, y1, g1 = run(True)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(k1)
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


@pytest.mark.slow
def test_chain_ops_random_config_fuzz():
    """Seeded fuzz over the chain-op space (conv_stats / preact_conv_ext /
    conv_act_stats, random kernels, strides, channel counts, and spatial
    dims INCLUDING non-block-multiple shapes that force the over-computed-
    rows jnp stats fallback) — value + gradient parity vs the unchained
    Pallas composition for every draw."""
    master = np.random.default_rng(20260818)
    for trial in range(10):
        r = np.random.default_rng(master.integers(1 << 31))
        kk = int(r.integers(1, 4))
        k = (kk, kk, kk)
        s = int(r.integers(1, 3))
        stride = (s, s, s)
        ci, co = int(r.integers(2, 6)), int(r.integers(2, 6))
        X = int(r.integers(max(kk, 3), 10))
        Y = int(r.integers(max(kk, 8), 14))
        Z = int(r.integers(max(kk, 9), 21))
        pads = ((kk // 2, kk // 2),) * 3
        mode = "reflect" if kk > 1 else "zeros"
        variant = int(r.integers(0, 3))
        x = jnp.asarray(r.normal(size=(1, X, ci, Y, Z)) * 1.5 + 0.2, jnp.float32)
        w = jnp.asarray(r.normal(size=(*k, ci, co)) * 0.3, jnp.float32)
        b = jnp.asarray(r.normal(size=(co,)) * 0.3, jnp.float32) if r.integers(0, 2) else None
        gamma = jnp.asarray(r.normal(size=(ci,)) * 0.4 + 1, jnp.float32)
        beta = jnp.asarray(r.normal(size=(ci,)) * 0.3, jnp.float32)
        go = jnp.asarray(r.normal(size=(co,)) * 0.4 + 1, jnp.float32)
        bo = jnp.asarray(r.normal(size=(co,)) * 0.3, jnp.float32)

        if variant == 0:
            # conv emit -> stats-external apply
            def chained(x, w, go, bo):
                y, m, v = FP.conv_stats(x, w, b, stride, pads, mode)
                return IN.apply_with_stats(y, m, v, go, bo, 1e-3, "leaky_relu", 0.2)

            def unchained(x, w, go, bo):
                y = C.conv3d_cxyz(x, w, b, stride, pads, mode)
                return IN.instance_norm_act(y, go, bo, 1e-3, "leaky_relu", 0.2)

            args = (x, w, go, bo)
        elif variant == 1:
            # stats_op -> prologue'd conv with emit
            def chained(x, w, gamma, beta):
                m, v = FP.stats_op(x)
                y, m2, v2 = FP.preact_conv_ext(
                    x, m, v, gamma, beta, w, b, stride, pads,
                    "reflect" if mode == "reflect" else "zeros",
                    "relu", emit_stats=True)
                return y * 1.0 + m2.sum() + v2.sum()

            def unchained(x, w, gamma, beta):
                t = IN.instance_norm_act(x, gamma, beta, 1e-3, "relu", 0.2)
                y = C.conv3d_cxyz(t, w, b, stride, pads, mode)
                m2 = jnp.mean(y, axis=(1, 3, 4), dtype=jnp.float32)
                v2 = jnp.mean(jax.lax.square(y.astype(jnp.float32)
                                             - m2[:, None, :, None, None]),
                              axis=(1, 3, 4))
                return y * 1.0 + m2.sum() + v2.sum()

            if mode != "reflect" and any(p != (0, 0) for p in pads):
                continue  # pro requires reflect (or pad-free) xy pads
            args = (x, w, gamma, beta)
        else:
            # output-activation conv with emit
            def chained(x, w, go, bo):
                y, m, v = FP.conv_act_stats(x, w, b, stride, pads, mode,
                                            "leaky_relu", 0.2)
                return IN.apply_with_stats(y, m, v, go, bo, 1e-3, "none", 0.2)

            def unchained(x, w, go, bo):
                y = C.conv3d_cxyz(x, w, b, stride, pads, mode)
                y = jnp.where(y > 0, y, 0.2 * y)
                return IN.instance_norm_act(y, go, bo, 1e-3, "none", 0.2)

            args = (x, w, go, bo)

        try:
            with _interp():
                y_c = chained(*args)
                y_u = unchained(*args)
                ct = jnp.asarray(r.normal(size=y_c.shape), jnp.float32)
                g_c = jax.grad(lambda *a: jnp.sum(chained(*a) * ct),
                               argnums=tuple(range(4)))(*args)
                g_u = jax.grad(lambda *a: jnp.sum(unchained(*a) * ct),
                               argnums=tuple(range(4)))(*args)
            np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                                       atol=2e-4, rtol=2e-4)
            for a_, b_ in zip(g_c, g_u):
                scale = float(jnp.max(jnp.abs(b_))) + 1e-6
                np.testing.assert_allclose(np.asarray(a_) / scale,
                                           np.asarray(b_) / scale, atol=5e-4)
        except NotImplementedError:
            continue
        except AssertionError as e:
            raise AssertionError(
                f"chain fuzz trial {trial}: variant={variant} k={k} s={stride} "
                f"ci={ci} co={co} shape={(X, Y, Z)} mode={mode} "
                f"bias={b is not None}"
            ) from e


@pytest.mark.quick
def test_pro_only_mode_block_parity(monkeypatch, rng):
    """VANGAN_FUSE_PREACT='pro' (graceful degradation: prologue folding via
    the monolithic preact_conv, NO emitted stats / epilogues): CycleGAN block
    values+grads match the flag-off graph; param tree identical."""
    from vangan_tpu.models.layers import CycleGANResidualBlock

    x = jnp.asarray(rng.normal(size=(1, 8, 4, 8, 17)), jnp.float32)

    def run(mode):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", mode)
        m = CycleGANResidualBlock(4, layout="NXCYZ")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(p, x)
            g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x) ** 2))(p)
        return p, y, g

    p0, y0, g0 = run("0")
    p1, y1, g1 = run("pro")
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4, rtol=1e-4)
    gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g0))
    for (k0, a_), (k1, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        scale = max(float(jnp.max(jnp.abs(a_))), 1e-3 * gmax) + 1e-6
        np.testing.assert_allclose(np.asarray(a_) / scale, np.asarray(b_) / scale,
                                   atol=5e-4, err_msg=jax.tree_util.keystr(k0))


@pytest.mark.slow
def test_pro_only_mode_resunet_parity(monkeypatch, rng):
    """'pro' mode through the whole ResUNet: the chain wiring must NOT
    engage (no stats threading) while every PreActConvBlock still folds its
    prologue — values match the flag-off model."""
    from vangan_tpu.models.resunet import ResUNet3D

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32, 1)), jnp.float32)

    def run(mode):
        monkeypatch.setenv("VANGAN_FUSE_PREACT", mode)
        m = ResUNet3D(filters=4, num_layers=2, upsample_mode="simple",
                      layout="NXCYZ", dropout_type="none")
        with _interp():
            p = m.init(jax.random.PRNGKey(0), x)
            return p, m.apply(p, x)

    p0, y0 = run("0")
    p1, y1 = run("pro")
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)


@pytest.mark.quick
@pytest.mark.parametrize("s,pro", [(1, True), (2, True), (1, False), (2, False)])
def test_dual_entry_matches_two_ops(rng, s, pro):
    """dual_entry (one launch, one slab read for the residual-block entry)
    == the separate preact/conv_stats composition: all six outputs and all
    grads, strides 1/2, with and without the prologue."""
    ci, co1, cos = (4, 4, 4) if pro else (4, 6, 6)
    x = jnp.asarray(rng.normal(size=(1, 8, ci, 8, 17)) * 1.5 + 0.2, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co1)) * 0.3, jnp.float32)
    ws = jnp.asarray(rng.normal(size=(1, 1, 1, ci, cos)) * 0.3, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=(ci,)) * 0.4 + 1, jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(ci,)) * 0.3, jnp.float32)
    pads = ((1, 1),) * 3
    st = (s, s, s)

    def dual(x, w1, ws, g0, b0):
        return FP.dual_entry(x, None, g0 if pro else None,
                             b0 if pro else None, w1, ws, st)

    def two(x, w1, ws, g0, b0):
        if pro:
            m, v = FP.stats_op(x)
            r1, m1, v1 = FP.preact_conv_ext(x, m, v, g0, b0, w1, None, st,
                                            pads, "reflect", "relu",
                                            emit_stats=True)
        else:
            r1, m1, v1 = FP.conv_stats(x, w1, None, st, pads, "reflect")
        sc, mS, vS = FP.conv_stats(x, ws, None, st, ((0, 0),) * 3, "zeros")
        return r1, m1, v1, sc, mS, vS

    args = (x, w1, ws, g0, b0)
    with _interp():
        rd = dual(*args)
        rt = two(*args)
        for n_, a, b in zip(("r1", "m1", "v1", "sc", "ms", "vs"), rd, rt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4, err_msg=n_)
        cts = [jnp.asarray(rng.normal(size=t.shape), jnp.float32) for t in rd]

        def loss(fn):
            def go(*a):
                return sum(jnp.sum(t * c) for t, c in zip(fn(*a), cts))
            return go

        gd = jax.grad(loss(dual), argnums=tuple(range(5)))(*args)
        gt = jax.grad(loss(two), argnums=tuple(range(5)))(*args)
    for n_, a, b in zip(("dx", "dw1", "dws", "dg", "db"), gd, gt):
        sc_ = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / sc_, np.asarray(b) / sc_,
                                   atol=5e-4, err_msg=n_)
