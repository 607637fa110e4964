"""Shape/behaviour tests for the model zoo on small volumes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.config import VanGanConfig
from vangan_tpu.models import (
    PatchGANDiscriminator3D,
    ResNetGenerator3D,
    ResUNet3D,
    VNet3D,
    build_discriminator,
    build_generator,
)


def _init_and_apply(model, x, train=False, mutable=False, rngs_extra=None):
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, train=False)
    call_rngs = {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}
    if rngs_extra:
        call_rngs.update(rngs_extra)
    if mutable:
        y, _ = model.apply(variables, x, train=train, rngs=call_rngs, mutable=["batch_stats"])
    else:
        y = model.apply(variables, x, train=train, rngs=call_rngs)
    return variables, y


class TestResUNet:
    def test_shape_identity(self):
        m = ResUNet3D(upsample_mode="simple", filters=4, num_layers=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == x.shape
        assert y.dtype == jnp.float32

    def test_tanh_range(self, rng):
        m = ResUNet3D(upsample_mode="simple", filters=4, num_layers=2)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
        _, y = _init_and_apply(m, x)
        assert float(jnp.abs(y).max()) <= 1.0

    def test_deconv_mode_shape(self):
        m = ResUNet3D(upsample_mode="deconv", filters=4, num_layers=2)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == x.shape

    def test_attention_gate_shape(self):
        m = ResUNet3D(upsample_mode="simple", filters=4, num_layers=2, use_attention_gate=True)
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == x.shape

    def test_input_noise_only_in_train(self, rng):
        m = ResUNet3D(upsample_mode="simple", filters=4, num_layers=2, use_input_noise=True)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y_eval1 = m.apply(variables, x, train=False)
        y_eval2 = m.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(y_eval1), np.asarray(y_eval2))
        y_tr1 = m.apply(variables, x, train=True, rngs={"noise": jax.random.PRNGKey(1)})
        y_tr2 = m.apply(variables, x, train=True, rngs={"noise": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(y_tr1) - np.asarray(y_tr2)).max() > 0

    def test_bf16_compute_f32_params(self):
        m = ResUNet3D(upsample_mode="simple", filters=4, num_layers=2, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 16, 16, 16, 1))
        variables, y = _init_and_apply(m, x)
        assert y.dtype == jnp.float32  # head cast
        leaves = jax.tree_util.tree_leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)


class TestVNet:
    @pytest.mark.parametrize("bn,mode", [(False, "simple"), (True, "deconv")])
    def test_shapes(self, bn, mode):
        m = VNet3D(use_batch_norm=bn, upsample_mode=mode, filters=4, num_layers=2,
                   output_activation="tanh")
        x = jnp.zeros((1, 16, 16, 16, 1))
        _, y = _init_and_apply(m, x, train=bn, mutable=bn)
        assert y.shape == x.shape

    def test_addnoise_branch(self, rng):
        m = VNet3D(use_batch_norm=False, upsample_mode="simple", filters=4, num_layers=2,
                   addnoise=True, output_activation="tanh")
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
        _, y = _init_and_apply(m, x, train=True)
        assert y.shape == x.shape


class TestResNetGenerator:
    def test_shape_preserving_any_depth(self):
        for blocks in (2, 3):
            m = ResNetGenerator3D(filters=4, num_downsampling_blocks=blocks,
                                  num_residual_blocks=2, num_upsample_blocks=blocks)
            x = jnp.zeros((1, 16, 16, 16, 1))
            _, y = _init_and_apply(m, x)
            assert y.shape == x.shape


class TestDiscriminator:
    def test_patch_output_shape(self):
        # 32^3 input -> 16 -> 8 -> 4 -> 4 patch logits (discriminator.py:46-114)
        m = PatchGANDiscriminator3D(filters=8, use_dropout=True, use_input_noise=True,
                                    use_layer_noise=True)
        x = jnp.zeros((2, 32, 32, 32, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == (2, 4, 4, 4, 1)
        assert y.dtype == jnp.float32

    def test_wasserstein_head(self):
        m = PatchGANDiscriminator3D(filters=8, wasserstein=True)
        x = jnp.zeros((2, 32, 32, 32, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == (2, 1)

    def test_noise_std_traced_argument(self, rng):
        """σ is a call argument: same params, different σ, no re-init."""
        m = PatchGANDiscriminator3D(filters=8, use_input_noise=True, use_layer_noise=True)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        rngs = {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}
        y0 = m.apply(variables, x, train=True, noise_std=0.0, rngs=rngs)
        y1 = m.apply(variables, x, train=True, noise_std=0.5, rngs=rngs)
        assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 0
        # σ=0 in train == eval forward modulo dropout; with dropout disabled they match
        m2 = PatchGANDiscriminator3D(filters=8, use_input_noise=True, use_layer_noise=True,
                                     use_dropout=False)
        variables2 = m2.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        a = m2.apply(variables2, x, train=True, noise_std=0.0, rngs=rngs)
        b = m2.apply(variables2, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_spectral_norm_variant(self):
        m = PatchGANDiscriminator3D(filters=8, use_SN=True)
        x = jnp.zeros((1, 32, 32, 32, 1))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert "batch_stats" in variables  # spectral norm power-iteration state
        y, updates = m.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert y.shape == (1, 4, 4, 4, 1)


class TestFactory:
    @pytest.mark.slow
    def test_build_all_generators(self):
        cfg = VanGanConfig(compute_dtype="float32")
        x = jnp.zeros((1, 16, 16, 16, 1))
        for kind in ("resUnet", "vnet", "resnet"):
            for role in ("i2s", "s2i"):
                m = build_generator(kind, cfg, role)
                needs_bn = kind == "vnet" and role == "s2i"
                _, y = _init_and_apply(m, x, train=needs_bn, mutable=needs_bn)
                assert y.shape == x.shape, (kind, role)

    def test_build_discriminator(self):
        cfg = VanGanConfig(compute_dtype="float32")
        m = build_discriminator(cfg)
        x = jnp.zeros((1, 32, 32, 32, 1))
        _, y = _init_and_apply(m, x)
        assert y.shape == (1, 4, 4, 4, 1)


class TestLayoutParity:
    """NXCYZ (TPU layout engine) vs NXYZC: identical param trees + outputs.

    On CPU the NXCYZ convs take the XLA transpose fallback, so this validates
    the layout *plumbing* (axes, concat, norm, upsample, entry/exit reshapes);
    kernel parity is tests/test_conv_cxyz.py (+ on-chip tests/test_pallas_tpu).
    """

    KW = dict(upsample_mode="simple", dropout=0.1, dropout_change_per_layer=0.1,
              dropout_type="none", filters=4, num_layers=2, output_activation="tanh")

    @pytest.mark.quick
    def test_resunet_layouts_match(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
        m1 = ResUNet3D(**self.KW, layout="NXYZC")
        m2 = ResUNet3D(**self.KW, layout="NXCYZ")
        v1 = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v2 = m2.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
        for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
            assert a.shape == b.shape
        y1 = m1.apply(v1, x, train=False)
        y2 = m2.apply(v2, x, train=False)  # same seed -> identical params
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=5e-5)

    @pytest.mark.quick
    def test_discriminator_layouts_match(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
        d1 = PatchGANDiscriminator3D(filters=8, layout="NXYZC")
        d2 = PatchGANDiscriminator3D(filters=8, layout="NXCYZ")
        v1 = d1.init({"params": jax.random.PRNGKey(1)}, x, train=False)
        v2 = d2.init({"params": jax.random.PRNGKey(1)}, x, train=False)
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
        z1 = d1.apply(v1, x, train=False)
        z2 = d2.apply(v2, x, train=False)
        assert z1.shape == z2.shape
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=5e-5)

    def test_resunet_nxcyz_train_mode_runs(self, rng):
        """Stochastic layers (dropout/noise collections) work in CXYZ."""
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        m = ResUNet3D(upsample_mode="simple", dropout=0.3, dropout_type="spatial",
                      filters=4, num_layers=2, layout="NXCYZ", use_input_noise=True)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y = m.apply(v, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)})
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.parametrize("mk", [
        lambda lt: VNet3D(use_batch_norm=False, upsample_mode="simple", filters=4,
                          num_layers=2, output_activation="tanh", layout=lt),
        lambda lt: VNet3D(use_batch_norm=True, upsample_mode="deconv", filters=4,
                          num_layers=2, output_activation="tanh", layout=lt),
        lambda lt: ResNetGenerator3D(filters=4, num_downsampling_blocks=2,
                                     num_residual_blocks=2, num_upsample_blocks=2, layout=lt),
    ])
    def test_vnet_resnet_layouts_match(self, rng, mk):
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        m1, m2 = mk("NXYZC"), mk("NXCYZ")
        v1 = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v2 = m2.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
        y1 = m1.apply(v1, x, train=False)
        y2 = m2.apply(v2, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


class TestFusedInstanceNormWiring:
    """Model-level coverage of the fused IN+act dispatch (interpret mode):
    the NXCYZ path with the Pallas instnorm kernels must match the NXYZC jnp
    path through full models and their gradients."""

    KW = dict(upsample_mode="simple", dropout=0.0, dropout_type="none",
              filters=4, num_layers=2, output_activation="tanh")

    @pytest.mark.quick
    def test_resunet_fused_in_matches(self, rng):
        from vangan_tpu.ops.pallas import instnorm as IN

        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        m1 = ResUNet3D(**self.KW, layout="NXYZC")
        m2 = ResUNet3D(**self.KW, layout="NXCYZ")
        v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y1 = m1.apply(v, x, train=False)
        with IN.force_interpret():
            y2 = m2.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=5e-4)

    @pytest.mark.quick
    def test_discriminator_fused_in_gradients(self, rng):
        from vangan_tpu.ops.pallas import instnorm as IN

        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        d1 = PatchGANDiscriminator3D(filters=8, layout="NXYZC")
        d2 = PatchGANDiscriminator3D(filters=8, layout="NXCYZ")
        v = d1.init({"params": jax.random.PRNGKey(1)}, x, train=False)

        def loss(m, v, x):
            return jnp.sum(m.apply(v, x, train=False).astype(jnp.float32) ** 2)

        g1 = jax.grad(lambda v: loss(d1, v, x))(v)
        with IN.force_interpret():
            g2 = jax.grad(lambda v: loss(d2, v, x))(v)
        leaves1 = jax.tree_util.tree_leaves(g1)
        leaves2 = jax.tree_util.tree_leaves(g2)
        # conv biases feeding an InstanceNorm have an exactly-zero true
        # gradient (the mean subtraction cancels them): normalise near-zero
        # leaves by the global scale, not their own numerical residue
        gmax = max(float(jnp.max(jnp.abs(a))) for a in leaves1)
        for a, b in zip(leaves1, leaves2):
            s = max(float(jnp.max(jnp.abs(a))), 1e-3 * gmax) + 1e-6
            np.testing.assert_allclose(np.asarray(b) / s, np.asarray(a) / s, atol=2e-4)
