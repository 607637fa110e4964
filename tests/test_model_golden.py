"""Model-weight-port golden parity: the reference's OWN Keras model builders
(/root/reference/resunet_model.py, /root/reference/discriminator.py) vs our
flax modules, with one set of weights ported between them and f32 forward
values asserted equal (round-4 VERDICT missing #1).

Method: build the reference network with its actual TF code (tfa
InstanceNormalization hand-rolled — tfa is not installed here; the layer is
8 lines of documented semantics, GroupNormalization(groups=C), epsilon 1e-3),
copy our flax-initialised parameters into the TF layers, RANDOMISE the TF-only
parameters our models drop as IN-cancelled dead weights (docs/PARITY.md), and
compare forwards. Agreement proves (a) the architectures are the same function
and (b) the dead-parameter claim — a random dead bias must not change the
output.

Keras auto-names layers with per-class counters (conv3d, conv3d_1, ...), so
sorting a model's layers of one class by name index reconstructs creation
order — the same order our flax modules declare their submodules in.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"

# shared with scripts/baseline_anchor.py — the reference-semantics shims
# (tfa InstanceNormalization epsilon=1e-3, import stubs) live in ONE place
from tf_ref_shims import install_ref_shims  # noqa: E402

InstanceNormalization = install_ref_shims(tf)


def _load_reference_models():
    """Import the reference model modules (shims already installed above;
    same machinery as test_reference_golden.py plus a functional
    tfa.layers — see tests/tf_ref_shims.py)."""
    import discriminator as ref_disc  # noqa: F401
    import resunet_model as ref_resunet  # noqa: F401
    import vnet_model as ref_vnet  # noqa: F401

    assert ref_resunet.__file__.startswith(REF)
    return ref_resunet, ref_disc, ref_vnet


ref_resunet, ref_disc, ref_vnet = _load_reference_models()


def _by_creation(model, cls):
    """A model's layers of one class, in creation order (auto-name counter)."""

    def idx(layer):
        m = re.search(r"_(\d+)$", layer.name)
        return int(m.group(1)) if m else -1

    return sorted([l for l in model.layers if isinstance(l, cls)], key=idx)


def _leaves(tree):
    """{keystr: np.ndarray} for a flax param (sub)tree."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}


class _Port:
    """Copies flax params into TF layers; randomises TF-only dead weights."""

    def __init__(self, params, rng, stats=None):
        self.p = _leaves(params)
        self.s = _leaves(stats) if stats is not None else {}
        self.rng = rng
        self.used = set()

    def conv(self, layer, path, has_bias):
        kernel = self.p[f"{path}['kernel']"]
        assert tuple(layer.kernel.shape) == kernel.shape, (layer.name, path)
        weights = [kernel]
        if layer.use_bias:
            if has_bias:
                weights.append(self.p[f"{path}['bias']"])
            else:
                # our model drops this bias as exactly IN-cancelled
                # (docs/PARITY.md); a RANDOM value here must not matter
                weights.append(self.rng.normal(size=layer.bias.shape).astype(np.float32))
        layer.set_weights(weights)
        self.used.update({f"{path}['kernel']"} | ({f"{path}['bias']"} if has_bias else set()))

    def inorm(self, layer, path):
        layer.set_weights([self.p[f"{path}['scale']"], self.p[f"{path}['bias']"]])
        self.used.update({f"{path}['scale']", f"{path}['bias']"})

    def dense(self, layer, path):
        layer.set_weights([self.p[f"{path}['kernel']"], self.p[f"{path}['bias']"]])
        self.used.update({f"{path}['kernel']", f"{path}['bias']"})

    def bn(self, layer, path):
        """Keras BatchNormalization [gamma, beta, moving_mean, moving_var]
        from our params scale/bias + batch_stats mean/var."""
        layer.set_weights([
            self.p[f"{path}['scale']"], self.p[f"{path}['bias']"],
            self.s[f"{path}['mean']"], self.s[f"{path}['var']"],
        ])
        self.used.update({f"{path}['scale']", f"{path}['bias']"})

    def deconv(self, layer, path):
        """TF Conv3DTranspose kernel is (k,k,k,out,in) and spatially FLIPPED
        relative to flax ConvTranspose's (k,k,k,in,out) (verified
        numerically: swap io + flip all spatial dims maps exactly)."""
        kernel = self.p[f"{path}['kernel']"]
        k_tf = np.transpose(kernel, (0, 1, 2, 4, 3))[::-1, ::-1, ::-1]
        layer.set_weights([np.ascontiguousarray(k_tf), self.p[f"{path}['bias']"]])
        self.used.update({f"{path}['kernel']", f"{path}['bias']"})

    def assert_exhausted(self):
        unused = set(self.p) - self.used
        assert not unused, f"flax params never ported: {sorted(unused)[:6]}"


def _port_resunet(tf_model, params, num_layers, rng):
    """Map our ResUNet3D params onto the reference ResUNet's layers.

    Creation order (resunet_model.py:226-245): stem{conv1, conv_block, shortcut},
    enc1..L{block1, block2, shortcut}, bridge1, bridge2, decL-1..0{same},
    head; INs: stem{conv_block, shortcut_norm}, per block{block1, block2,
    shortcut_norm}, bridge1, bridge2.
    """
    port = _Port(params, rng)
    convs = iter(_by_creation(tf_model, tf.keras.layers.Conv3D))
    ins = iter(_by_creation(tf_model, InstanceNormalization))

    def block(name):
        port.inorm(next(ins), f"['{name}']['block1']['norm_act']['inorm']")
        port.conv(next(convs), f"['{name}']['block1']['conv']", has_bias=False)
        port.inorm(next(ins), f"['{name}']['block2']['norm_act']['inorm']")
        port.conv(next(convs), f"['{name}']['block2']['conv']", has_bias=True)
        port.conv(next(convs), f"['{name}']['shortcut']", has_bias=False)
        port.inorm(next(ins), f"['{name}']['shortcut_norm']['inorm']")

    port.conv(next(convs), "['stem']['conv1']", has_bias=False)
    port.inorm(next(ins), "['stem']['conv_block']['norm_act']['inorm']")
    port.conv(next(convs), "['stem']['conv_block']['conv']", has_bias=True)
    port.conv(next(convs), "['stem']['shortcut']", has_bias=False)
    port.inorm(next(ins), "['stem']['shortcut_norm']['inorm']")
    for e in range(1, num_layers + 1):
        block(f"enc{e}")
    port.inorm(next(ins), "['bridge1']['norm_act']['inorm']")
    port.conv(next(convs), "['bridge1']['conv']", has_bias=False)
    port.inorm(next(ins), "['bridge2']['norm_act']['inorm']")
    port.conv(next(convs), "['bridge2']['conv']", has_bias=True)
    for d in reversed(range(num_layers)):
        block(f"dec{d}")
    port.conv(next(convs), "['head']", has_bias=True)
    assert next(convs, None) is None and next(ins, None) is None
    port.assert_exhausted()


def _port_discriminator(tf_model, params, wasserstein, rng):
    """Map our PatchGANDiscriminator3D params onto get_discriminator's layers
    (discriminator.py:46-121): conv0+inorm0, down0..2{conv, inorm}, head."""
    port = _Port(params, rng)
    convs = iter(_by_creation(tf_model, tf.keras.layers.Conv3D))
    ins = iter(_by_creation(tf_model, InstanceNormalization))
    port.conv(next(convs), "['conv0']", has_bias=False)  # IN-fed: dead bias
    port.inorm(next(ins), "['inorm0']")
    for b in range(3):
        port.conv(next(convs), f"['down{b}']['conv']", has_bias=False)
        port.inorm(next(ins), f"['down{b}']['inorm']")
    port.conv(next(convs), "['head']", has_bias=True)
    if wasserstein:
        port.dense(tf_model.layers[-1], "['w_dense']")
    assert next(convs, None) is None and next(ins, None) is None
    port.assert_exhausted()


def _port_vnet(tf_model, params, stats, num_layers, rng):
    """Map our VNet3D params+batch_stats onto custom_vnet's layers
    (vnet_model.py:149-268, VanGan config: use_batch_norm, 'deconv').

    Creation order: per down layer {conv0, bn0, conv1, bn1}, bottleneck
    {conv0, bn0, conv1, bn1}, per up layer {deconv, conv0, bn0, conv1, bn1},
    head. Block convs are bias-free (use_bias=not use_batch_norm)."""
    port = _Port(params, rng, stats=stats)
    convs = iter(_by_creation(tf_model, tf.keras.layers.Conv3D))
    deconvs = iter(_by_creation(tf_model, tf.keras.layers.Conv3DTranspose))
    bns = iter(_by_creation(tf_model, tf.keras.layers.BatchNormalization))

    def block(name):
        for i in range(2):
            port.conv(next(convs), f"['{name}']['conv{i}']", has_bias=False)
            port.bn(next(bns), f"['{name}']['bn{i}']")

    for d in range(num_layers):
        block(f"down{d}")
    block("bottleneck")
    for u in range(num_layers):
        port.deconv(next(deconvs), f"['deconv{u}']")
        block(f"up{u}")
    port.conv(next(convs), "['head']", has_bias=True)
    assert next(convs, None) is None and next(bns, None) is None
    assert next(deconvs, None) is None
    port.assert_exhausted()


class TestModelGolden:
    @pytest.mark.slow
    def test_resunet_forward_parity(self, rng):
        """VanGan's generator config (vangan.py:111-122: upsample 'simple',
        dropout_type 'none') at reduced size: 32^3, filters=4, num_layers=4
        (the full reference ladder depth; bridge at 2^3)."""
        from vangan_tpu.models import ResUNet3D

        size, f, L = 32, 4, 4
        tf.keras.backend.clear_session()
        tf_model = ref_resunet.ResUNet(
            (size, size, size, 1), upsample_mode="simple", dropout_type="none",
            filters=f, num_layers=L, output_activation="tanh",
        )
        ours = ResUNet3D(upsample_mode="simple", dropout_type="none", filters=f,
                         num_layers=L, layout="NXYZC", dtype=jnp.float32)
        x = rng.normal(size=(2, size, size, size, 1)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
        _port_resunet(tf_model, variables["params"], L, rng)

        want = tf_model(tf.constant(x), training=False).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    @pytest.mark.slow
    def test_vnet_forward_parity(self, rng):
        """VanGan's V-Net config (vangan.py:134-148: BatchNorm act-then-norm,
        'deconv' upsampling, tanh head) at 32^3, filters=4, num_layers=4.
        BatchNorm moving statistics are RANDOMISED before porting so the
        mean/var mapping is actually exercised (init 0/1 would hide a swap)."""
        from vangan_tpu.models import VNet3D

        size, f, L = 32, 4, 4
        tf.keras.backend.clear_session()
        tf_model = ref_vnet.custom_vnet(
            (size, size, size, 1), activation="relu", use_batch_norm=True,
            upsample_mode="deconv", dropout=0.5, dropout_type="spatial",
            use_dropout_on_upsampling=False, use_attention_gate=False,
            filters=f, num_layers=L, output_activation="tanh", addnoise=False,
        )
        ours = VNet3D(use_batch_norm=True, upsample_mode="deconv", dropout=0.5,
                      dropout_type="spatial", filters=f, num_layers=L,
                      output_activation="tanh", layout="NXYZC", dtype=jnp.float32)
        x = rng.normal(size=(2, size, size, size, 1)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(2)}, jnp.asarray(x), train=False)
        variables = dict(variables)
        stats = jax.tree_util.tree_map_with_path(
            lambda p, v: (np.abs(rng.normal(size=v.shape)).astype(np.float32) + 0.5
                          if "var" in jax.tree_util.keystr(p)
                          else rng.normal(size=v.shape, scale=0.3).astype(np.float32)),
            variables["batch_stats"],
        )
        variables["batch_stats"] = stats
        _port_vnet(tf_model, variables["params"], stats, L, rng)

        want = tf_model(tf.constant(x), training=False).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("wasserstein", [False, True])
    def test_discriminator_forward_parity(self, rng, wasserstein):
        """VanGan's discriminator config (vangan.py:167-192: dropout + input/
        layer noise, all inference-inactive) at 32^3, filters=8."""
        from vangan_tpu.models import PatchGANDiscriminator3D

        size, f = 32, 8
        tf.keras.backend.clear_session()
        tf_model = ref_disc.get_discriminator(
            input_img_size=(size, size, size, 1), filters=f, use_dropout=True,
            use_input_noise=True, use_layer_noise=True, noise_std=0.1,
            wasserstein=wasserstein, name="disc",
        )
        ours = PatchGANDiscriminator3D(
            filters=f, use_dropout=True, use_input_noise=True, use_layer_noise=True,
            noise_std=0.1, wasserstein=wasserstein, layout="NXYZC", dtype=jnp.float32,
        )
        x = rng.normal(size=(2, size, size, size, 1)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(x), train=False)
        _port_discriminator(tf_model, variables["params"], wasserstein, rng)

        want = tf_model(tf.constant(x), training=False).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
