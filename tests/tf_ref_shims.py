"""Shared TF-reference import shims.

Single home for the semantically load-bearing reference-environment
reconstruction used by BOTH tests/test_model_golden.py (model-weight-port
golden parity) and scripts/baseline_anchor.py (measured TF reference
anchor): the hand-rolled tfa InstanceNormalization (epsilon=1e-3,
GroupNormalization(groups=C) semantics), the SpectralNormalization
pass-through, the skimage / keras.backend / losses.Reduction import stubs,
and putting /root/reference on sys.path. Keeping one copy means a future
semantics fix (e.g. the epsilon) cannot leave the anchor and the parity
tests checking *different* reference behaviour.

tests/test_reference_golden.py predates this module and keeps its own
loss-only shim set (no tfa layer semantics at stake there).
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"

_cache: dict = {}


def instance_normalization_cls(tf):
    """tfa.layers.InstanceNormalization semantics (per-sample per-channel
    normalisation over spatial axes, epsilon=1e-3, learned gamma/beta) —
    tfa is unavailable here, so the 8-line layer is reconstructed from its
    documented definition (GroupNormalization with groups=channels).

    Cached: repeated installs must hand back the SAME class so
    isinstance-based layer walks keep working across callers.
    """
    if "IN" in _cache:
        return _cache["IN"]

    class InstanceNormalization(tf.keras.layers.Layer):
        def __init__(self, gamma_initializer=None, **kwargs):
            super().__init__(**kwargs)
            self._gamma_init = gamma_initializer or "ones"

        def build(self, input_shape):
            c = int(input_shape[-1])
            self.gamma = self.add_weight(name="gamma", shape=(c,),
                                         initializer=self._gamma_init)
            self.beta = self.add_weight(name="beta", shape=(c,),
                                        initializer="zeros")

        def call(self, x):
            axes = list(range(1, len(x.shape) - 1))
            mean = tf.reduce_mean(x, axis=axes, keepdims=True)
            var = tf.reduce_mean(tf.square(x - mean), axis=axes, keepdims=True)
            return self.gamma * (x - mean) * tf.math.rsqrt(var + 1e-3) + self.beta

    _cache["IN"] = InstanceNormalization
    return InstanceNormalization


def install_ref_shims(tf):
    """Install the import-only stubs the reference modules need and put
    /root/reference on sys.path; cooperative with any stubs another test
    module already installed in this process. Returns the (cached)
    InstanceNormalization class wired into ``tensorflow_addons.layers``."""
    IN = instance_normalization_cls(tf)

    for name in ("skimage", "skimage.io", "skimage.exposure"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__vangan_golden_stub__ = True
            sys.modules[name] = mod
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    sys.modules["skimage"].exposure = sys.modules["skimage.exposure"]

    tfa = sys.modules.get("tensorflow_addons")
    if tfa is None:
        tfa = types.ModuleType("tensorflow_addons")
        tfa.__vangan_golden_stub__ = True
        sys.modules["tensorflow_addons"] = tfa
    tfa.layers = types.SimpleNamespace(
        InstanceNormalization=IN,
        SpectralNormalization=lambda layer: layer,  # unused in tested configs
    )

    import keras.backend as K

    if not hasattr(K, "sum"):  # vnet_model imports utils -> needs the K shim
        K.sum = tf.reduce_sum
    if not hasattr(tf.keras.losses, "Reduction"):  # loss_functions.py import
        tf.keras.losses.Reduction = types.SimpleNamespace(NONE="none")

    if REF not in sys.path:
        sys.path.insert(0, REF)
    return IN
