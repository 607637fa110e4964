"""CPU (interpret-mode) parity tests for the fused multi-round clDice
skeleton kernels (ops/pallas/skeleton.py, VERDICT r2 item 5).

The on-chip selftest (tests/test_pallas_tpu.py) re-runs the same parity on
real hardware; these pin the fusion/halo/residual logic on every CPU run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.ops.morphology import soft_skel
from vangan_tpu.ops.pallas import skeleton as S


def _fused(monkeypatch, n):
    monkeypatch.setenv("VANGAN_SKEL_FUSE", str(n))


@pytest.mark.quick
class TestFusedSkeletonInterpret:
    @pytest.mark.parametrize("fuse", [1, 2, 4])
    def test_forward_bitexact(self, rng, monkeypatch, fuse):
        """iters+1 = 6 rounds split as 4+2, 2+2+2, 6x1: bit-exact vs the XLA
        reduce_window reference (fuse=4 is the production default)."""
        _fused(monkeypatch, fuse)
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 128, 1)).astype(np.float32))
        ref = soft_skel(x, 5)
        with S.force_interpret():
            out = S.soft_skel_pallas(x, 5)
        assert float(jnp.abs(ref - out).max()) == 0.0, f"fuse={fuse}"

    def test_forward_large_fuse_one_ulp(self, rng, monkeypatch):
        """All 6 rounds in ONE kernel: the compiler may fma-fuse the skel
        update differently, so parity is one-ULP, not bitwise."""
        _fused(monkeypatch, 7)
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 128, 1)).astype(np.float32))
        ref = soft_skel(x, 5)
        with S.force_interpret():
            out = S.soft_skel_pallas(x, 5)
        assert float(jnp.abs(ref - out).max()) <= 1e-6

    @pytest.mark.parametrize("fuse", [1, 3, 4])
    def test_gradient_matches_xla_f32_residuals(self, rng, monkeypatch, fuse):
        """With f32 residual stacks the fused backward is numerically
        identical to the XLA path (continuous data: no pool ties)."""
        _fused(monkeypatch, fuse)
        monkeypatch.setenv("VANGAN_SKEL_RES_DTYPE", "float32")
        x = jnp.asarray(rng.uniform(size=(1, 8, 16, 128, 1)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        ga = jax.grad(lambda v: jnp.sum(soft_skel(v, 4) * w))(x)
        with S.force_interpret():
            gb = jax.grad(lambda v: jnp.sum(S.soft_skel_pallas(v, 4) * w))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4, atol=1e-5)

    def test_gradient_bf16_residuals_statistical(self, rng, monkeypatch):
        """Default bf16 residuals: the replayed min/max sees 2^-8-rounded
        inputs, so a small fraction of near-tied voxels route their
        subgradient to a different (equally valid) argmin. Assert the flip
        rate and the norm-level agreement, not elementwise equality."""
        _fused(monkeypatch, 4)
        x = jnp.asarray(rng.uniform(size=(1, 8, 16, 128, 1)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        ga = np.asarray(jax.grad(lambda v: jnp.sum(soft_skel(v, 4) * w))(x))
        with S.force_interpret():
            gb = np.asarray(jax.grad(lambda v: jnp.sum(S.soft_skel_pallas(v, 4) * w))(x))
        mismatched = np.abs(gb - ga) > 0.02 * np.abs(ga) + 5e-4
        assert mismatched.mean() < 0.02, f"flip rate {mismatched.mean():.4f}"
        rel_norm = np.linalg.norm(gb - ga) / (np.linalg.norm(ga) + 1e-9)
        assert rel_norm < 0.15, f"grad norm rel err {rel_norm:.4f}"

    def test_nograd_value(self, rng, monkeypatch):
        _fused(monkeypatch, 4)
        x = jnp.asarray(rng.uniform(size=(1, 8, 16, 128, 1)).astype(np.float32))
        ref = soft_skel(x, 6)
        with S.force_interpret():
            out = S.soft_skel_pallas_nograd(x, 6)
        assert float(jnp.abs(ref - out).max()) == 0.0

    def test_binary_volume_boundary(self, rng, monkeypatch):
        """Binary {-1,1}-style data with structures touching the volume
        boundary — exercises the +BIG masking between fused rounds."""
        _fused(monkeypatch, 4)
        v = (rng.uniform(size=(1, 16, 16, 128, 1)) > 0.7).astype(np.float32)
        v[:, 0] = 1.0  # touch the x boundary
        x = jnp.asarray(v)
        ref = soft_skel(x, 5)
        with S.force_interpret():
            out = S.soft_skel_pallas(x, 5)
        assert float(jnp.abs(ref - out).max()) == 0.0

    def test_launch_plan(self):
        assert S._launch_plan.__wrapped__ if hasattr(S._launch_plan, "__wrapped__") else True
        os.environ["VANGAN_SKEL_FUSE"] = "4"
        try:
            assert S._launch_plan(15) == (4, 4, 0)   # 16 rounds = 4x4
            assert S._launch_plan(5) == (4, 1, 2)    # 6 rounds = 4 + 2
            assert S._launch_plan(2) == (3, 1, 0)    # 3 rounds, rf clamped
        finally:
            del os.environ["VANGAN_SKEL_FUSE"]

    def test_fallback_off_tpu_without_interpret(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 8, 1)).astype(np.float32))
        out = S.soft_skel_pallas(x, 3)  # unsupported shape -> XLA fallback
        assert out.shape == x.shape
