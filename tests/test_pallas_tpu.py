"""TPU-only tests for the Pallas kernels (skipped on the CPU test platform).

Run manually on a TPU host:  JAX_PLATFORMS=axon pytest tests/test_pallas_tpu.py
(conftest forces CPU for the main suite, so these auto-skip there; the same
parity checks run on real hardware in bench/driver rounds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"), reason="needs TPU"
)


@requires_tpu
class TestPallasSkeleton:
    def test_forward_bitexact(self, rng):
        from vangan_tpu.ops.morphology import soft_skel
        from vangan_tpu.ops.pallas.skeleton import soft_skel_pallas

        x = jnp.asarray(rng.uniform(size=(2, 32, 16, 128, 1)).astype(np.float32))
        a = jax.jit(lambda v: soft_skel(v, 5))(x)
        b = jax.jit(lambda v: soft_skel_pallas(v, 5))(x)
        assert float(jnp.abs(a - b).max()) == 0.0

    def test_gradient_matches_xla(self, rng):
        from vangan_tpu.ops.morphology import soft_skel
        from vangan_tpu.ops.pallas.skeleton import soft_skel_pallas

        # continuous data: no pool ties, so the subgradient conventions agree
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 128, 1)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        ga = jax.jit(jax.grad(lambda v: jnp.sum(soft_skel(v, 4) * w)))(x)
        gb = jax.jit(jax.grad(lambda v: jnp.sum(soft_skel_pallas(v, 4) * w)))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4, atol=1e-5)

    def test_fallback_on_unsupported_shape(self, rng):
        from vangan_tpu.ops.pallas.skeleton import soft_skel_pallas

        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 8, 1)).astype(np.float32))
        out = soft_skel_pallas(x, 3)  # z=8 not lane-aligned -> XLA fallback
        assert out.shape == x.shape


@requires_tpu
class TestConvCXYZ:
    """CXYZ-layout conv family on hardware: Mosaic-lowered value + gradient
    parity vs the XLA reference at model-representative configs (the CPU
    interpret-mode parity matrix is tests/test_conv_cxyz.py)."""

    CONFIGS = [
        # (k, ci, co, stride, padding, pad_mode, shape(B,X,Ci,Y,Z))
        ((3, 3, 3), 16, 16, (1, 1, 1), ((1, 1),) * 3, "reflect", (1, 32, 16, 32, 128)),
        ((3, 3, 3), 16, 32, (2, 2, 2), ((1, 1),) * 3, "reflect", (1, 32, 16, 32, 64)),
        ((4, 4, 4), 1, 8, (2, 2, 2), ((1, 1),) * 3, "reflect", (1, 32, 1, 32, 64)),
        ((1, 1, 1), 48, 16, (1, 1, 1), "same", "zeros", (1, 16, 48, 16, 64)),
        ((4, 4, 4), 8, 8, (1, 1, 1), "same", "zeros", (1, 16, 8, 16, 32)),
    ]

    @pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
    def test_value_and_grad_parity(self, rng, cfg_i):
        from vangan_tpu.ops.pallas.conv3d import conv3d_cxyz, conv3d_cxyz_reference

        k, ci, co, stride, padding, pad_mode, shape = self.CONFIGS[cfg_i]
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)

        y = jax.jit(lambda x, w, b: conv3d_cxyz(x, w, b, stride, padding, pad_mode))(x, w, b)
        yr = jax.jit(lambda x, w, b: conv3d_cxyz_reference(x, w, b, stride, padding, pad_mode))(
            x, w, b)
        assert y.shape == yr.shape
        scale = float(jnp.max(jnp.abs(yr))) + 1e-6
        # MXU multiplies in bf16 passes: ~2^-8 relative
        assert float(jnp.max(jnp.abs(y - yr))) / scale < 6e-3

        ct = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
        gp = jax.jit(jax.grad(
            lambda x, w, b: jnp.sum(conv3d_cxyz(x, w, b, stride, padding, pad_mode) * ct),
            argnums=(0, 1, 2)))(x, w, b)
        gr = jax.jit(jax.grad(
            lambda x, w, b: jnp.sum(
                conv3d_cxyz_reference(x, w, b, stride, padding, pad_mode) * ct),
            argnums=(0, 1, 2)))(x, w, b)
        for name, a_, b_ in zip(("dx", "dw", "db"), gp, gr):
            s = float(jnp.max(jnp.abs(b_))) + 1e-6
            assert float(jnp.max(jnp.abs(a_ - b_))) / s < 6e-3, name
