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
    """Experimental CXYZ-layout conv kernel (round-2 layout engine prototype)."""

    def test_parity_vs_xla(self, rng):
        import jax.numpy as jnp

        from vangan_tpu.ops.pallas.conv3d import conv3d_cxyz, conv3d_cxyz_reference

        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 128)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 3, 16, 16)) * 0.1).astype(np.float32))
        a = jax.jit(lambda v, k: conv3d_cxyz(v, k, xb=8, yb=8))(x, w)
        b = jax.jit(conv3d_cxyz_reference)(x, w)
        rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        assert rel < 5e-3  # MXU default-precision reassociation
