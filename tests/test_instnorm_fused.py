"""Interpret-mode parity for the fused InstanceNorm+act kernels
(ops/pallas/instnorm.py) vs the XLA InstanceNorm module + activation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.ops.pallas import instnorm as IN


def _xla_ref(x, gamma, beta, eps=1e-3, act="none", alpha=0.2):
    # two-pass f32-statistics reference matching models.layers.InstanceNorm
    # (layout NXCYZ: channel axis 2, spatial axes (1, 3, 4))
    mean = jnp.mean(x, axis=(1, 3, 4), keepdims=True, dtype=jnp.float32)
    xc = x.astype(jnp.float32) - mean
    var = jnp.mean(jax.lax.square(xc), axis=(1, 3, 4), keepdims=True,
                   dtype=jnp.float32)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * gamma.reshape(1, 1, -1, 1, 1) + beta.reshape(1, 1, -1, 1, 1)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, alpha * y)
    return y.astype(x.dtype)


@pytest.mark.quick
class TestFusedInstanceNorm:
    @pytest.mark.parametrize("act", ["none", "relu", "leaky_relu"])
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_forward_parity(self, rng, act, dtype):
        dt = jnp.dtype(dtype)
        x = jnp.asarray(rng.normal(size=(2, 8, 5, 8, 16)) * 3 + 1, jnp.float32).astype(dt)
        gamma = jnp.asarray(rng.normal(size=(5,)) * 0.5 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(5,)) * 0.2, jnp.float32)
        ref = _xla_ref(x, gamma, beta, act=act)
        with IN.force_interpret():
            out = IN.instance_norm_act(x, gamma, beta, 1e-3, act, 0.2)
        tol = 1e-5 if dtype == "float32" else 3e-2
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=tol, rtol=tol)

    @pytest.mark.parametrize("act", ["none", "relu", "leaky_relu"])
    def test_gradient_parity(self, rng, act):
        x = jnp.asarray(rng.normal(size=(2, 8, 5, 8, 16)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(5,)) * 0.5 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(5,)) * 0.2, jnp.float32)
        ct = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

        def loss_f(fn):
            return lambda x, g, b: jnp.sum(fn(x, g, b) * ct)

        gr = jax.grad(loss_f(lambda x, g, b: _xla_ref(x, g, b, act=act)),
                      argnums=(0, 1, 2))(x, gamma, beta)
        with IN.force_interpret():
            gp = jax.grad(
                loss_f(lambda x, g, b: IN.instance_norm_act(x, g, b, 1e-3, act, 0.2)),
                argnums=(0, 1, 2))(x, gamma, beta)
        for name, a_, b_ in zip(("dx", "dgamma", "dbeta"), gp, gr):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(a_) / scale, np.asarray(b_) / scale, atol=2e-5,
                err_msg=f"{name} act={act}")

    def test_large_offset_variance_stability(self, rng):
        """E[x^2]-mean^2 in f32 must survive a mean >> std input."""
        x = jnp.asarray(rng.normal(size=(1, 8, 3, 8, 16)) * 0.1 + 50, jnp.float32)
        gamma = jnp.ones((3,), jnp.float32)
        beta = jnp.zeros((3,), jnp.float32)
        ref = _xla_ref(x, gamma, beta)
        with IN.force_interpret():
            out = IN.instance_norm_act(x, gamma, beta, 1e-3, "none", 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    def test_supported_predicate(self):
        assert not IN.instance_norm_act_supported((1, 8, 128, 8, 16), "NXCYZ")
        assert not IN.instance_norm_act_supported((1, 8, 16, 8, 16), "NXYZC")
        with IN.force_interpret():
            assert IN.instance_norm_act_supported((1, 8, 16, 8, 16), "NXCYZ")


@pytest.mark.quick
def test_supported_rejects_non_tiling_shapes():
    """A y the planner cannot divide exactly must fall back to jnp — a
    non-dividing y-block would silently skip the tail rows (short stats,
    uninitialised apply/dx output). Review r3 finding."""
    from vangan_tpu.ops.pallas import instnorm as m

    with m.force_interpret():
        assert not m.instance_norm_act_supported((1, 8, 64, 21, 128), "NXCYZ")
        # the shapes the models actually run stay supported
        assert m.instance_norm_act_supported((1, 128, 16, 128, 128), "NXCYZ")
        assert m.instance_norm_act_supported((1, 32, 64, 32, 32), "NXCYZ")
        assert m.instance_norm_act_supported((3, 16, 64, 16, 16), "NXCYZ")


@pytest.mark.quick
def test_plan_blocks_y_split():
    """Blocks never exceed the budget; the 256 KB default keeps the worst
    kernel stack (~16x block) plus XLA's in-module S(1) promotions under the
    16 MB scoped-vmem limit (BENCH r3: 1 MB blocks compiled standalone but
    OOMed at 16.25 MB inside jit(train_step) at the C=64 level)."""
    from vangan_tpu.ops.pallas.instnorm import _DEFAULT_BUDGET, _plan_blocks

    assert _DEFAULT_BUDGET <= 256 * 1024
    # C=16 full-res: 512 KB/x-row -> y-split under the 256 KB default
    xb, yb = _plan_blocks(128, 16, 128, 128, 2)
    assert 16 * xb * yb * 128 * 2 <= _DEFAULT_BUDGET
    # C=48 full-res (dec0): 1.5 MB/x-row -> y splits
    xb, yb = _plan_blocks(128, 48, 128, 128, 2)
    assert xb == 1 and yb < 128 and 48 * yb * 128 * 2 <= _DEFAULT_BUDGET
    # the r3 bench-failure shape (enc2, C=64 @ 32^3 bf16)
    xb, yb = _plan_blocks(32, 64, 32, 32, 2)
    assert 64 * xb * yb * 32 * 2 <= _DEFAULT_BUDGET
    xb, yb = _plan_blocks(128, 48, 128, 128, 2, budget=512 * 1024)
    assert xb == 1 and 48 * yb * 128 * 2 <= 512 * 1024
