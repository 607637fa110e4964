"""Parity tests for the CXYZ Pallas conv family (ops/pallas/conv3d.py).

Kernels run in interpreter mode on CPU (``force_interpret``) against the XLA
transpose reference with identical semantics; value AND gradient (dx/dw/db)
parity per config. The reference idioms covered: reflect-pad+VALID convs
(/root/reference/building_blocks.py:15-39), stride-2 encoders
(resunet_model.py:103-143), 4^3 PatchGAN convs (discriminator.py:46-121),
1^3 shortcuts/heads (resunet_model.py:92-99,245).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.ops.pallas import conv3d as C


def _check(rng, k, stride, padding, pad_mode, ci=3, co=2, bias_on=True, shape=(2, 8, 10, 9)):
    b_dim, X, Y, Z = shape
    x = jnp.asarray(rng.normal(size=(b_dim, X, ci, Y, Z)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32) if bias_on else None

    with C.force_interpret():
        y = C.conv3d_cxyz(x, w, b, stride, padding, pad_mode)
        yr = C.conv3d_cxyz_reference(x, w, b, stride, padding, pad_mode)
        assert y.shape == yr.shape, (y.shape, yr.shape)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-4, rtol=1e-4)

        ct = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
        argnums = (0, 1, 2) if bias_on else (0, 1)

        def loss_p(*a):
            bb = a[2] if bias_on else None
            return jnp.sum(C.conv3d_cxyz(a[0], a[1], bb, stride, padding, pad_mode) * ct)

        def loss_r(*a):
            bb = a[2] if bias_on else None
            return jnp.sum(C.conv3d_cxyz_reference(a[0], a[1], bb, stride, padding, pad_mode) * ct)

        args = (x, w, b) if bias_on else (x, w)
        gp = jax.grad(loss_p, argnums=argnums)(*args)
        gr = jax.grad(loss_r, argnums=argnums)(*args)
    for name, a_, b_ in zip(("dx", "dw", "db"), gp, gr):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a_) / scale, np.asarray(b_) / scale, atol=2e-5,
            err_msg=f"{name} mismatch k={k} s={stride} pad={padding} mode={pad_mode}",
        )


@pytest.mark.quick
def test_conv3x3_stride1_reflect(rng):
    """The workhorse: reflect-padded 3^3 (PreActConvBlock, resunet_model.py:42-66)."""
    _check(rng, (3, 3, 3), (1, 1, 1), ((1, 1),) * 3, "reflect")


@pytest.mark.quick
def test_conv3x3_stride2_reflect(rng):
    """Stride-2 encoder conv (resunet_model.py:103-143)."""
    _check(rng, (3, 3, 3), (2, 2, 2), ((1, 1),) * 3, "reflect")


@pytest.mark.quick
def test_conv4x4_stride2_zero_nobias(rng):
    """PatchGAN 4^3 stride-2 (discriminator.py:46-121), no bias."""
    _check(rng, (4, 4, 4), (2, 2, 2), ((1, 1),) * 3, "zeros", ci=1, co=4, bias_on=False)


def test_conv1x1_stride1(rng):
    """1^3 shortcut/head conv (resunet_model.py:92-99,245)."""
    _check(rng, (1, 1, 1), (1, 1, 1), "same", "zeros", ci=4, co=2)


def test_conv1x1_stride2(rng):
    """1^3 stride-2 projected shortcut (one empty dgrad parity class)."""
    _check(rng, (1, 1, 1), (2, 2, 2), "same", "zeros")


def test_conv4x4_stride1_same(rng):
    """4^3 stride-1 SAME (asymmetric (1,2) pads; last disc block)."""
    _check(rng, (4, 4, 4), (1, 1, 1), "same", "zeros")


def test_conv3x3_valid(rng):
    _check(rng, (3, 3, 3), (1, 1, 1), "valid", "zeros")


def test_conv_mixed_stride(rng):
    """Depth-preserving stride (2,2,1) — 2-D-like downsampling."""
    _check(rng, (3, 3, 3), (2, 2, 1), ((1, 1),) * 3, "zeros")


def test_conv_anisotropic_kernel(rng):
    _check(rng, (3, 1, 3), (1, 1, 1), "same", "reflect")


@pytest.mark.slow
def test_conv7x7_resnet_stem(rng):
    """7^3 ResNet-generator stem (generator.py:34-40)."""
    _check(rng, (7, 7, 7), (1, 1, 1), ((3, 3),) * 3, "reflect", shape=(1, 8, 10, 9))


def test_conv_bf16_close(rng):
    """bf16 inputs stay within bf16 tolerance of the f32 reference."""
    x = jnp.asarray(rng.normal(size=(1, 8, 3, 10, 9)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 2)) * 0.3, jnp.float32)
    with C.force_interpret():
        y = C.conv3d_cxyz(x, w, None, (1, 1, 1), ((1, 1),) * 3, "reflect")
        yr = C.conv3d_cxyz_reference(x, w, None, (1, 1, 1), ((1, 1),) * 3, "reflect")
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=0.15, rtol=0.05
    )


@pytest.mark.quick
def test_select_matrices_reflect_fold():
    """z select matrices: reflect boundary maps out-of-range taps inward."""
    mats = C._z_selects(3, 6, 6, 1, 1, "reflect")
    # tap dz=0 reads z-1: out column 0 must read row 1 (reflected)
    assert mats[0][1, 0] == 1.0 and mats[0].sum() == 6
    # tap dz=1 is the identity
    assert np.array_equal(mats[1], np.eye(6, dtype=np.float32))
    # tap dz=2 reads z+1: out column 5 must read row 4 (reflected)
    assert mats[2][4, 5] == 1.0


@pytest.mark.quick
def test_fits_predicate():
    """VMEM planning: huge channel counts report as unfit (XLA fallback)."""
    assert C.conv3d_cxyz_fits((1, 128, 16, 128, 128), (3, 3, 3), (1, 1, 1))
    assert not C.conv3d_cxyz_fits((1, 16, 512, 16, 16), (3, 3, 3), (1, 1, 1), co=512)


@pytest.mark.quick
def test_same_padding_size_aware_odd_dims(rng):
    """TF SAME with stride 2 on odd dims: total pad = (ceil(n/s)-1)*s + k - n.

    The size-free max(k-s, 0) formula under-pads here (ADVICE r2 #1); both the
    Pallas path and the transpose reference must match XLA's native size-aware
    string-"SAME" lowering.
    """
    ci, co = 3, 2
    x = jnp.asarray(rng.normal(size=(1, 9, ci, 11, 13)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.3, jnp.float32)

    xl = jnp.transpose(x, (0, 1, 3, 4, 2))
    dn = jax.lax.conv_dimension_numbers(xl.shape, w.shape, ("NXYZC", "XYZIO", "NXYZC"))
    oracle = jnp.transpose(
        jax.lax.conv_general_dilated(xl, w, (2, 2, 2), "SAME", dimension_numbers=dn),
        (0, 1, 4, 2, 3),
    )
    yr = C.conv3d_cxyz_reference(x, w, None, (2, 2, 2), "same", "zeros")
    np.testing.assert_allclose(np.asarray(yr), np.asarray(oracle), atol=2e-4, rtol=1e-4)
    with C.force_interpret():
        y = C.conv3d_cxyz(x, w, None, (2, 2, 2), "same", "zeros")
    assert y.shape == oracle.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(oracle), atol=2e-4, rtol=1e-4)


@pytest.mark.quick
def test_same_stride2_without_dims_asserts():
    """Size-free 'same' resolution with stride > 1 must fail loudly."""
    with pytest.raises(AssertionError):
        C._norm_padding("same", (3, 3, 3), (2, 2, 2))


@pytest.mark.slow
def test_random_config_fuzz():
    """Seeded fuzz over the full supported config space (kernel sizes 1-4,
    strides 1/2 per axis, asymmetric explicit pads, zero/reflect modes,
    odd channel counts and spatial dims) — value + gradient parity vs the
    XLA reference for every draw. Broader than the fixed matrix above; a
    silent edge-case bug in tap slicing / select matrices / parity
    decomposition shows up here first."""
    master = np.random.default_rng(20260817)
    for trial in range(20):
        r = np.random.default_rng(master.integers(1 << 31))
        k = tuple(int(r.integers(1, 5)) for _ in range(3))
        stride = tuple(int(r.integers(1, 3)) for _ in range(3))
        pad_mode = ["zeros", "reflect"][int(r.integers(0, 2))]
        # reflect pads must stay inside the input; keep pads < min spatial dim
        pads = tuple(
            (int(r.integers(0, min(kk, 3))), int(r.integers(0, min(kk, 3))))
            for kk in k
        )
        ci, co = int(r.integers(1, 6)), int(r.integers(1, 6))
        X = int(r.integers(max(k[0], 4), 9))
        Y = int(r.integers(max(k[1], 4), 11))
        Z = int(r.integers(max(k[2], 5), 13))
        # output dims must be >= 1
        if any((d + lo + hi - kk) < 0 for d, (lo, hi), kk in zip((X, Y, Z), pads, k)):
            continue
        if pad_mode == "reflect" and any(
            max(lo, hi) >= d for d, (lo, hi) in zip((X, Y, Z), pads)
        ):
            continue
        try:
            _check(r, k, stride, pads, pad_mode, ci=ci, co=co,
                   bias_on=bool(r.integers(0, 2)), shape=(1, X, Y, Z))
        except NotImplementedError:
            continue  # out-of-scope corner (documented XLA fallback exists)
        except AssertionError as e:
            raise AssertionError(
                f"fuzz trial {trial}: k={k} s={stride} pads={pads} "
                f"mode={pad_mode} ci={ci} co={co} shape={(X, Y, Z)}"
            ) from e
