"""Unit tests for vangan_tpu.ops against NumPy golden implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from vangan_tpu.ops import (
    binarise,
    clip_images,
    min_max_norm,
    min_max_norm_np,
    reflect_pad,
    rescale_arr,
    soft_dilate,
    soft_erode,
    soft_open,
    soft_skel,
    ssim3d_loss_map,
    threshold_outliers,
    z_score_norm,
    z_score_norm_batch,
)
from vangan_tpu.ops.norms import minmax_to_pm1


class TestNorms:
    def test_min_max_norm_np(self, rng):
        x = rng.normal(size=(4, 5, 6)).astype(np.float32)
        y = min_max_norm_np(x)
        assert y.min() == pytest.approx(0.0)
        assert y.max() == pytest.approx(1.0)

    def test_min_max_norm_np_constant_raises(self):
        with pytest.raises(ValueError):
            min_max_norm_np(np.ones((3, 3)))

    def test_min_max_norm_axis(self, rng):
        x = rng.normal(size=(2, 4, 4, 4, 1)).astype(np.float32)
        y = np.asarray(min_max_norm(jnp.asarray(x), axis=(1, 2, 3, 4)))
        for b in range(2):
            assert y[b].min() == pytest.approx(0.0, abs=1e-6)
            assert y[b].max() == pytest.approx(1.0, abs=1e-6)

    def test_rescale_roundtrip(self, rng):
        x = rng.uniform(size=(8,)).astype(np.float32)  # [0,1]
        pm1 = np.asarray(rescale_arr(jnp.asarray(x), -0.5, 0.5))
        back = np.asarray(rescale_arr(jnp.asarray(pm1), 1.0, 2.0))
        np.testing.assert_allclose(pm1, 2 * x - 1, rtol=1e-6)
        np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)

    def test_z_score(self, rng):
        x = rng.normal(loc=3.0, scale=2.0, size=(1000,)).astype(np.float32)
        y = z_score_norm(x)
        assert abs(y.mean()) < 1e-5
        assert y.std() == pytest.approx(1.0, abs=1e-5)
        # constant input: mean-centre only (utils.py:79-82)
        np.testing.assert_allclose(z_score_norm(np.full((5,), 7.0)), np.zeros(5))

    def test_z_score_batch(self, rng):
        x = rng.normal(size=(3, 4, 4, 4, 1)).astype(np.float32)
        y = np.asarray(z_score_norm_batch(jnp.asarray(x)))
        for b in range(3):
            assert abs(y[b].mean()) < 1e-5
            assert y[b].std() == pytest.approx(1.0, abs=1e-4)

    def test_threshold_outliers(self, rng):
        x = rng.normal(size=(10, 10, 10)).astype(np.float32)
        x[0, 0, 0] = 1000.0
        y = threshold_outliers(x, threshold=6)
        assert y.max() < 1000.0
        assert y.max() == pytest.approx(np.sort(x.ravel())[-2], abs=1e-5)

    def test_binarise(self):
        x = jnp.asarray([-0.5, 0.0, 0.5])
        np.testing.assert_allclose(np.asarray(binarise(x)), [-1.0, 1.0, 1.0])

    def test_clip(self):
        x = jnp.asarray([-2.0, 0.3, 5.0])
        np.testing.assert_allclose(np.asarray(clip_images(x)), [-1.0, 0.3, 1.0])

    def test_minmax_to_pm1(self, rng):
        x = rng.uniform(2, 9, size=(2, 4, 4, 4, 1)).astype(np.float32)
        y = np.asarray(minmax_to_pm1(jnp.asarray(x)))
        for b in range(2):
            assert y[b].min() == pytest.approx(-1.0, abs=1e-6)
            assert y[b].max() == pytest.approx(1.0, abs=1e-6)


class TestReflectPad:
    def test_matches_numpy(self, rng):
        x = rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32)
        got = np.asarray(reflect_pad(jnp.asarray(x), 1))
        want = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="reflect")
        np.testing.assert_array_equal(got, want)

    def test_2d(self, rng):
        x = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
        got = np.asarray(reflect_pad(jnp.asarray(x), (2, 1)))
        want = np.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)), mode="reflect")
        np.testing.assert_array_equal(got, want)

    def test_zero_pad_noop(self, rng):
        x = rng.normal(size=(1, 4, 4, 4, 1)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(reflect_pad(jnp.asarray(x), 0)), x)


def _np_minpool3(x, window):
    """Golden stride-1 SAME min-pool over spatial dims of (B, X, Y, Z, C), ignoring OOB."""
    B, X, Y, Z, C = x.shape
    wx, wy, wz = window
    out = np.full_like(x, np.inf)
    rx, ry, rz = wx // 2, wy // 2, wz // 2
    for i in range(X):
        for j in range(Y):
            for k in range(Z):
                xs = slice(max(0, i - rx), min(X, i + wx - rx))
                ys = slice(max(0, j - ry), min(Y, j + wy - ry))
                zs = slice(max(0, k - rz), min(Z, k + wz - rz))
                out[:, i, j, k, :] = x[:, xs, ys, zs, :].min(axis=(1, 2, 3))
    return out


class TestMorphology:
    def test_soft_erode_golden(self, rng):
        x = rng.uniform(size=(1, 6, 6, 6, 1)).astype(np.float32)
        want = np.minimum(
            np.minimum(_np_minpool3(x, (3, 3, 1)), _np_minpool3(x, (3, 1, 3))),
            _np_minpool3(x, (1, 3, 3)),
        )
        got = np.asarray(soft_erode(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_soft_dilate_golden(self, rng):
        x = rng.uniform(size=(1, 6, 6, 6, 1)).astype(np.float32)
        want = -_np_minpool3(-x, (3, 3, 3))
        got = np.asarray(soft_dilate(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_open_is_erode_then_dilate(self, rng):
        # NOTE: this soft opening is NOT anti-extensive (directional erosion
        # windows vs full-window dilation), matching clDice_func.py:45-57.
        x = rng.uniform(size=(1, 8, 8, 8, 1)).astype(np.float32)
        got = np.asarray(soft_open(jnp.asarray(x)))
        want = np.asarray(soft_dilate(soft_erode(jnp.asarray(x))))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_skeleton_of_thin_line_is_line(self):
        # A 1-voxel-wide line erodes to nothing in one round, so the skeleton
        # captures it exactly at iteration 0.
        x = np.zeros((1, 9, 9, 9, 1), dtype=np.float32)
        x[0, 4, 4, :, 0] = 1.0
        skel = np.asarray(soft_skel(jnp.asarray(x), iters=5))
        assert skel.max() == pytest.approx(1.0)
        np.testing.assert_allclose(skel, x, atol=1e-6)

    def test_skeleton_thick_tube_is_thin(self):
        # a 3x3 cross-section tube skeletonises to (approximately) its axis
        x = np.zeros((1, 9, 9, 9, 1), dtype=np.float32)
        x[0, 3:6, 3:6, :, 0] = 1.0
        skel = np.asarray(soft_skel(jnp.asarray(x), iters=5))
        assert skel.sum() < x.sum()
        assert skel[0, 4, 4, 4, 0] > 0.5  # axis voxel survives

    def test_skel_2d_rank4(self, rng):
        x = rng.uniform(size=(1, 8, 8, 1)).astype(np.float32)
        skel = np.asarray(soft_skel(jnp.asarray(x), iters=3))
        assert skel.shape == x.shape
        assert np.isfinite(skel).all()


def _np_ssim3d(y_true, y_pred, max_val=1.0, size=3, sigma=1.5, k1=0.01, k2=0.03):
    """Golden: direct dense-kernel implementation of loss_functions.py:87-117."""
    grid = np.arange((-size) // 2 + 1, size // 2 + 1, dtype=np.float64)
    g = np.exp(-0.5 * (grid / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
    g = g / g.sum()
    k3 = np.einsum("i,j,k->ijk", g, g, g)

    def conv(x):
        B, X, Y, Z, C = x.shape
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = np.zeros_like(x, dtype=np.float64)
        for dx in range(size):
            for dy in range(size):
                for dz in range(size):
                    out += k3[dx, dy, dz] * xp[:, dx : dx + X, dy : dy + Y, dz : dz + Z, :]
        return out

    mu_t, mu_p = conv(y_true), conv(y_pred)
    s_t = conv(y_true**2) - mu_t**2
    s_p = conv(y_pred**2) - mu_p**2
    s_tp = conv(y_true * y_pred) - mu_t * mu_p
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    ssim = (2 * mu_t * mu_p + c1) * (2 * s_tp + c2) / ((mu_t**2 + mu_p**2 + c1) * (s_t + s_p + c2))
    return 1.0 - ssim


class TestSSIM:
    def test_matches_dense_golden(self, rng):
        a = rng.uniform(size=(2, 6, 6, 6, 1)).astype(np.float32)
        b = rng.uniform(size=(2, 6, 6, 6, 1)).astype(np.float32)
        got = np.asarray(ssim3d_loss_map(jnp.asarray(a), jnp.asarray(b)))
        want = _np_ssim3d(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_identical_inputs_near_zero(self, rng):
        a = rng.uniform(size=(1, 8, 8, 8, 1)).astype(np.float32)
        got = np.asarray(ssim3d_loss_map(jnp.asarray(a), jnp.asarray(a)))
        assert np.abs(got).max() < 1e-3

    def test_anticorrelated_larger_than_identical(self, rng):
        a = rng.uniform(size=(1, 8, 8, 8, 1)).astype(np.float32)
        same = np.asarray(ssim3d_loss_map(jnp.asarray(a), jnp.asarray(a))).mean()
        diff = np.asarray(ssim3d_loss_map(jnp.asarray(a), jnp.asarray(1 - a))).mean()
        assert diff > same
