"""TF golden-parity tests: tiny tensors through the ACTUAL reference
implementation (/root/reference/loss_functions.py, clDice_func.py, utils.py)
vs ``vangan_tpu.losses`` / ``vangan_tpu.ops`` (VERDICT r3 missing #3).

This is the strongest parity evidence available in this environment: every
other loss test compares against NumPy *re*-implementations; these compare
against the reference's own TF code, including the ``reduce_mean`` axis=None
scale quirks (loss_functions.py:22,190,226,338,355) and the distributed-SUM
contract (per-shard evaluation summed over shards == our single-program
global value).

Environment shims (import plumbing ONLY — no reference math is altered):
- ``skimage`` / ``tensorflow_addons`` are absent here; the reference's
  utils.py imports them at module scope but the functions under test
  (min_max_norm_tf, z_score_norm_tf) never touch them -> stub modules.
- Keras 3 (bundled with TF 2.21) dropped ``keras.backend.sum`` and the
  ``Reduction`` enum that Keras 2.10 had; ``K.sum`` is aliased to
  ``tf.reduce_sum`` (its exact Keras-2 definition) and ``Reduction.NONE``
  to the string ``"none"`` Keras 3 accepts.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


def _load_reference():
    """Import the reference modules with import-only shims."""
    # stub skimage(.io/.exposure) + tensorflow_addons for utils.py's imports
    for name in ("skimage", "skimage.io", "skimage.exposure", "tensorflow_addons"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__vangan_golden_stub__ = True
            sys.modules[name] = mod
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    sys.modules["skimage"].exposure = sys.modules["skimage.exposure"]

    import keras.backend as K

    if not hasattr(K, "sum"):  # Keras 2: K.sum IS tf.reduce_sum
        K.sum = tf.reduce_sum
    if not hasattr(tf.keras.losses, "Reduction"):
        tf.keras.losses.Reduction = types.SimpleNamespace(NONE="none")

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import clDice_func as ref_cl  # noqa: F401
    import loss_functions as ref_lf  # noqa: F401
    import utils as ref_utils  # noqa: F401

    assert ref_lf.__file__.startswith(REF), ref_lf.__file__
    return ref_lf, ref_cl, ref_utils


ref_lf, ref_cl, ref_utils = _load_reference()


class _RefSelf:
    """The attribute-bag ``self`` the reference loss functions expect
    (vangan.py:25-34 hyperparameters + the distribution fields)."""

    def __init__(self, global_batch_size: int, n_devices: int):
        self.global_batch_size = float(global_batch_size)
        self.n_devices = n_devices
        self.lambda_cycle = 10.0
        self.lambda_identity = 5.0
        self.lambda_reconstruction = 5.0
        self.lambda_topology = 5.0


def _scales(gb: int, n: int):
    from vangan_tpu.losses.vangan_losses import LossScales

    return LossScales(global_batch_size=gb, n_devices=n)


def _shards(x: np.ndarray, n: int):
    return np.split(x, n, axis=0)


def _ref_distributed(fn, n: int, *arrays) -> float:
    """The reference's distributed value: per-replica evaluation on each
    equal shard, SUM-all-reduced (vangan.py:459-473)."""
    total = 0.0
    for shard in zip(*(_shards(a, n) for a in arrays)):
        total += float(fn(*(tf.constant(s) for s in shard)))
    return total


@pytest.fixture
def vols(rng):
    a = rng.normal(size=(4, 6, 6, 6, 1)).astype(np.float32)
    b = rng.normal(size=(4, 6, 6, 6, 1)).astype(np.float32)
    return a, b


@pytest.fixture
def seg_vols(rng):
    """[0,1]-ish soft segmentation volumes (post min-max in the real path)."""
    a = (rng.uniform(size=(4, 6, 6, 6, 1)) ** 2).astype(np.float32)
    b = (rng.uniform(size=(4, 6, 6, 6, 1)) ** 2).astype(np.float32)
    return a, b


class TestUtilsGolden:
    def test_min_max_norm_tf(self, vols):
        from vangan_tpu.ops.norms import min_max_norm

        a, _ = vols
        got = np.asarray(min_max_norm(jnp.asarray(a)))
        want = ref_utils.min_max_norm_tf(tf.constant(a)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        got_ax = np.asarray(min_max_norm(jnp.asarray(a), axis=(1, 2, 3, 4)))
        want_ax = ref_utils.min_max_norm_tf(tf.constant(a), axis=(1, 2, 3, 4)).numpy()
        np.testing.assert_allclose(got_ax, want_ax, rtol=1e-6, atol=1e-6)

    def test_z_score_norm_tf(self, vols):
        from vangan_tpu.ops.norms import z_score_norm_batch

        a, _ = vols
        got = np.asarray(z_score_norm_batch(jnp.asarray(a)))
        want = ref_utils.z_score_norm_tf(tf.constant(a)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestReduceMeanContract:
    """The two reduce_mean behaviours (loss_functions.py:8-22) under the
    distributed-SUM contract, against our single-program formulations."""

    @pytest.mark.parametrize("n", [1, 2, 4])
    def test_per_sample_axes(self, vols, n):
        from vangan_tpu.losses.vangan_losses import reduce_mean_global

        a, _ = vols
        gb = a.shape[0]
        axes = [1, 2, 3, 4]
        want = _ref_distributed(
            lambda s: ref_lf.reduce_mean(_RefSelf(gb, n), s, axis=axes), n, a
        )
        got = float(reduce_mean_global(_scales(gb, n), jnp.asarray(a)))
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("n", [1, 2, 4])
    def test_axis_none_quirk(self, vols, n):
        from vangan_tpu.losses.vangan_losses import reduce_mean_overall

        a, _ = vols
        gb = a.shape[0]
        want = _ref_distributed(lambda s: ref_lf.reduce_mean(_RefSelf(gb, n), s), n, a)
        got = float(reduce_mean_overall(_scales(gb, n), jnp.asarray(a)))
        assert got == pytest.approx(want, rel=1e-5)


class TestElementaryGolden:
    @pytest.mark.parametrize("name", ["MAE", "MSE", "L4", "MSLE"])
    def test_distances(self, vols, name):
        import vangan_tpu.losses.vangan_losses as vl

        a, b = vols
        if name == "MSLE":  # log(x+1) needs x > -1
            a, b = np.abs(a), np.abs(b)
        n, gb = 2, a.shape[0]
        want = _ref_distributed(
            lambda x, y: getattr(ref_lf, name)(_RefSelf(gb, n), x, y), n, a, b
        )
        got = float(getattr(vl, name)(_scales(gb, n), jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_ssim_loss_3d_map(self, vols):
        from vangan_tpu.ops.ssim import ssim3d_loss_map

        a, b = vols
        # the real path feeds [0,1] per-sample-normalised volumes
        a = (a - a.min()) / (a.max() - a.min())
        b = (b - b.min()) / (b.max() - b.min())
        want = ref_lf.ssim_loss_3d(tf.constant(a), tf.constant(b), max_val=1.0).numpy()
        got = np.asarray(ssim3d_loss_map(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestClDiceGolden:
    def test_soft_morphology(self, seg_vols):
        from vangan_tpu.ops.morphology import soft_dilate, soft_erode, soft_open

        a, _ = seg_vols
        for ours, theirs in (
            (soft_erode, ref_cl.soft_erode),
            (soft_dilate, ref_cl.soft_dilate),
            (soft_open, ref_cl.soft_open),
        ):
            np.testing.assert_allclose(
                np.asarray(ours(jnp.asarray(a))),
                theirs(tf.constant(a)).numpy(),
                rtol=1e-6,
                atol=1e-6,
            )

    @pytest.mark.parametrize("iters", [0, 3])
    def test_soft_skel(self, seg_vols, iters):
        from vangan_tpu.ops.morphology import soft_skel

        a, _ = seg_vols
        np.testing.assert_allclose(
            np.asarray(soft_skel(jnp.asarray(a), iters)),
            ref_cl.soft_skel(tf.constant(a), iters).numpy(),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_soft_dice_cldice_loss(self, seg_vols):
        from vangan_tpu.losses.cldice import soft_dice_cldice_loss

        a, b = seg_vols
        want = float(ref_cl.soft_dice_cldice_loss(iters=3)(tf.constant(a), tf.constant(b)))
        got = float(soft_dice_cldice_loss(iters=3)(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_cycle_seg_loss_sharded(self, seg_vols):
        """cycle_seg_loss's lambda/n_devices + per-replica-batch clDice
        semantics (loss_functions.py:212-226) vs our grouped evaluation."""
        from vangan_tpu.losses.vangan_losses import LossScales, cycle_seg_loss

        a, b = seg_vols
        n, gb = 2, a.shape[0]
        want = _ref_distributed(
            lambda x, y: ref_lf.cycle_seg_loss(_RefSelf(gb, n), x, y), n, a, b
        )
        s = LossScales(global_batch_size=gb, n_devices=n, cldice_iters=15)
        got = float(cycle_seg_loss(s, jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-4)


class TestCompositeGolden:
    @pytest.mark.parametrize("typ", [None, "mse", "L4", "bce"])
    def test_cycle_loss(self, vols, typ):
        from vangan_tpu.losses.vangan_losses import cycle_loss

        a, b = vols
        n, gb = 2, a.shape[0]
        want = _ref_distributed(
            lambda x, y: ref_lf.cycle_loss(_RefSelf(gb, n), x, y, typ=typ), n, a, b
        )
        got = float(cycle_loss(_scales(gb, n), jnp.asarray(a), jnp.asarray(b), typ=typ))
        assert got == pytest.approx(want, rel=1e-4)

    def test_cycle_reconstruction(self, vols):
        from vangan_tpu.losses.vangan_losses import cycle_reconstruction

        a, b = vols
        n, gb = 2, a.shape[0]
        want = _ref_distributed(
            lambda x, y: ref_lf.cycle_reconstruction(_RefSelf(gb, n), x, y), n, a, b
        )
        got = float(cycle_reconstruction(_scales(gb, n), jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_identity_loss_mae(self, vols):
        from vangan_tpu.losses.vangan_losses import identity_loss

        a, b = vols
        n, gb = 2, a.shape[0]
        want = _ref_distributed(
            lambda x, y: ref_lf.identity_loss(_RefSelf(gb, n), x, y), n, a, b
        )
        got = float(identity_loss(_scales(gb, n), jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_identity_loss_cldice_single_device(self, seg_vols):
        # the 'cldice' variant min-max-normalises over the WHOLE tensor
        # (loss_functions.py:246-247) — shard-dependent, so golden parity is
        # at n_devices=1 (our single-program value == the one-replica value)
        from vangan_tpu.losses.vangan_losses import LossScales, identity_loss

        a, b = seg_vols
        gb = a.shape[0]
        want = float(ref_lf.identity_loss(_RefSelf(gb, 1), tf.constant(a), tf.constant(b), typ="cldice"))
        s = LossScales(global_batch_size=gb, n_devices=1, cldice_iters=15)
        got = float(identity_loss(s, jnp.asarray(a), jnp.asarray(b), typ="cldice"))
        assert got == pytest.approx(want, rel=1e-4)

    def test_generator_loss_lsgan(self, vols):
        from vangan_tpu.losses.vangan_losses import generator_loss_fn

        _, fake = vols
        n, gb = 2, fake.shape[0]
        want = _ref_distributed(
            lambda f: ref_lf.generator_loss_fn(_RefSelf(gb, n), f), n, fake
        )
        got = float(generator_loss_fn(_scales(gb, n), jnp.asarray(fake)))
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("typ", ["bce", "bfce"])
    def test_generator_loss_logits(self, vols, typ):
        from vangan_tpu.losses.vangan_losses import generator_loss_fn

        _, fake = vols
        n, gb = 2, fake.shape[0]
        want = _ref_distributed(
            lambda f: ref_lf.generator_loss_fn(_RefSelf(gb, n), f, typ=typ, from_logits=True),
            n, fake,
        )
        got = float(
            generator_loss_fn(_scales(gb, n), jnp.asarray(fake), typ=typ, from_logits=True)
        )
        assert got == pytest.approx(want, rel=1e-4)

    def test_generator_loss_bce_probs(self, vols):
        # from_logits=False min-max-normalises PER SAMPLE (loss_functions.py:284)
        from vangan_tpu.losses.vangan_losses import generator_loss_fn

        _, fake = vols
        n, gb = 2, fake.shape[0]
        want = _ref_distributed(
            lambda f: ref_lf.generator_loss_fn(_RefSelf(gb, n), f, typ="bce", from_logits=False),
            n, fake,
        )
        got = float(
            generator_loss_fn(_scales(gb, n), jnp.asarray(fake), typ="bce", from_logits=False)
        )
        assert got == pytest.approx(want, rel=1e-4)

    def test_discriminator_loss_lsgan(self, vols):
        from vangan_tpu.losses.vangan_losses import discriminator_loss_fn

        real, fake = vols
        n, gb = 2, real.shape[0]
        want = _ref_distributed(
            lambda r, f: ref_lf.discriminator_loss_fn(_RefSelf(gb, n), r, f), n, real, fake
        )
        got = float(discriminator_loss_fn(_scales(gb, n), jnp.asarray(real), jnp.asarray(fake)))
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("typ", ["bce", "bfce"])
    def test_discriminator_loss_logits(self, vols, typ):
        from vangan_tpu.losses.vangan_losses import discriminator_loss_fn

        real, fake = vols
        n, gb = 2, real.shape[0]
        want = _ref_distributed(
            lambda r, f: ref_lf.discriminator_loss_fn(
                _RefSelf(gb, n), r, f, typ=typ, from_logits=True
            ),
            n, real, fake,
        )
        got = float(
            discriminator_loss_fn(
                _scales(gb, n), jnp.asarray(real), jnp.asarray(fake), typ=typ, from_logits=True
            )
        )
        assert got == pytest.approx(want, rel=1e-4)

    def test_discriminator_loss_bce_probs_single_device(self, vols):
        # from_logits=False min-max-normalises over the WHOLE tensor
        # (loss_functions.py:319-320) — shard-dependent; golden at n=1
        from vangan_tpu.losses.vangan_losses import discriminator_loss_fn

        real, fake = vols
        gb = real.shape[0]
        want = float(
            ref_lf.discriminator_loss_fn(
                _RefSelf(gb, 1), tf.constant(real), tf.constant(fake), typ="bce", from_logits=False
            )
        )
        got = float(
            discriminator_loss_fn(
                _scales(gb, 1), jnp.asarray(real), jnp.asarray(fake), typ="bce", from_logits=False
            )
        )
        assert got == pytest.approx(want, rel=1e-4)

    def test_wasserstein_losses(self, rng):
        """The WGAN losses run reduce_mean with NO axis (loss_functions.py:338,355)
        — the axis=None quirk scale, not the per-sample contract."""
        from vangan_tpu.losses.vangan_losses import (
            wasserstein_discriminator_loss,
            wasserstein_generator_loss,
        )

        real = rng.normal(size=(4, 1)).astype(np.float32)
        fake = rng.normal(size=(4, 1)).astype(np.float32)
        n, gb = 2, real.shape[0]
        want_g = _ref_distributed(
            lambda f: ref_lf.wasserstein_generator_loss(_RefSelf(gb, n), f), n, fake
        )
        want_d = _ref_distributed(
            lambda r, f: ref_lf.wasserstein_discriminator_loss(_RefSelf(gb, n), r, f),
            n, real, fake,
        )
        got_g = float(wasserstein_generator_loss(_scales(gb, n), jnp.asarray(fake)))
        got_d = float(
            wasserstein_discriminator_loss(_scales(gb, n), jnp.asarray(real), jnp.asarray(fake))
        )
        assert got_g == pytest.approx(want_g, rel=1e-5)
        assert got_d == pytest.approx(want_d, rel=1e-4)
