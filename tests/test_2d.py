"""DIMENSIONS=2 mode: genuine end-to-end 2-D support.

The reference half-declares a 2-D mode (main.py:87-93, dataset.py:25-29,
custom_callback.py:74-80, clDice_func.py:18-21) but cannot run it — its models
are Conv3D-only and its SSIM is conv3d-only. This framework runs it end to
end: rank is inferred from the input tensors (models.layers.ConvND), the
factory forces the channels-last layout, losses/morphology/SSIM dispatch on
rank, the pipeline crops (h, w, c) images, and the stitcher runs the 3-D grid
with a singleton z axis (the reference's own custom_callback.py:74-80 trick).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.config import VanGanConfig
from vangan_tpu.data.pipeline import random_spatial_augmentation
from vangan_tpu.inference.stitcher import stitch_subvolumes
from vangan_tpu.losses.cldice import soft_dice_cldice_loss
from vangan_tpu.models import PatchGANDiscriminator3D, ResUNet3D
from vangan_tpu.models.factory import build_discriminator, build_generator
from vangan_tpu.ops.morphology import soft_erode, soft_skel
from vangan_tpu.ops.ssim import ssim3d_loss_map
from vangan_tpu.training import make_step_fns


def cfg2d(**kw):
    defaults = dict(
        N_DEVICES=1, BATCH_SIZE=2, EPOCHS=2, DIMENSIONS=2,
        SUBVOL_PATCH_SIZE=(16, 16, 16), compute_dtype="float32",
        cldice_iters=2, output_dir="/tmp/vg_test2d",
    )
    defaults.update(kw)
    return VanGanConfig(**defaults)


class TestConfig2D:
    def test_derived_geometry(self):
        cfg = cfg2d()
        assert cfg.INPUT_IMG_SIZE == (2, 16, 16, 1)
        assert cfg.subvol_patch_shape == (16, 16, 1)
        assert cfg.seg_subvol_patch_shape == (16, 16, 1)


class TestModels2D:
    """Every model family accepts (B, H, W, C) and is shape-preserving."""

    @pytest.mark.parametrize("kind", ["resUnet", "vnet", "resnet"])
    def test_generators(self, rng, kind):
        cfg = cfg2d(gen_filters=4)
        m = build_generator(kind, cfg, role="i2s")
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_vnet_s2i_batchnorm(self, rng):
        cfg = cfg2d(gen_filters=4, gen_s2i="vnet")
        m = build_generator("vnet", cfg, role="s2i")
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y, _ = m.apply(v, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
        assert y.shape == x.shape

    def test_discriminator(self, rng):
        cfg = cfg2d(disc_filters=8)
        d = build_discriminator(cfg)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
        v = d.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                   x, train=False)
        y = d.apply(v, x, train=False)
        # 3 stride-2 convs: 32 -> 4 patch logits per axis
        assert y.shape == (2, 4, 4, 1)

    def test_factory_forces_channels_last(self):
        cfg = cfg2d(layout="NXCYZ")
        m = build_generator("resUnet", cfg, role="i2s")
        assert m.layout == "NXYZC"

    def test_nxcyz_rejects_2d_input(self, rng):
        from vangan_tpu.models.layers import ConvND

        x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
        conv = ConvND(4, 3, 1, padding="same", layout="NXCYZ")
        with pytest.raises(ValueError, match="3-D only"):
            conv.init(jax.random.PRNGKey(0), x)


class TestOps2D:
    def test_soft_erode_matches_reference_formula(self, rng):
        """2-D erode = min of (3,1) and (1,3) min-pools (clDice_func.py:18-21)."""
        img = jnp.asarray(rng.uniform(size=(1, 9, 9, 1)), jnp.float32)
        out = np.asarray(soft_erode(img))
        ref = np.minimum(_minpool_np(np.asarray(img), (3, 1)),
                         _minpool_np(np.asarray(img), (1, 3)))
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_soft_skel_runs_2d(self, rng):
        img = jnp.asarray((rng.uniform(size=(1, 16, 16, 1)) > 0.6), jnp.float32)
        skel = soft_skel(img, 3)
        assert skel.shape == img.shape
        assert np.isfinite(np.asarray(skel)).all()

    def test_cldice_loss_2d(self, rng):
        y_true = jnp.asarray((rng.uniform(size=(2, 16, 16, 1)) > 0.7), jnp.float32)
        y_pred = jnp.asarray(rng.uniform(size=(2, 16, 16, 1)), jnp.float32)
        loss = soft_dice_cldice_loss(iters=2)(y_true, y_pred)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: soft_dice_cldice_loss(iters=2)(y_true, p))(y_pred)
        assert np.isfinite(np.asarray(g)).all()

    def test_ssim_2d_matches_dense_conv(self, rng):
        """Separable shifted-add blur == dense 2-D Gaussian conv (the 3-D
        test's oracle, lowered one rank)."""
        a = jnp.asarray(rng.normal(size=(1, 12, 12, 1)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 12, 12, 1)), jnp.float32)
        out = np.asarray(ssim3d_loss_map(a, b))
        ref = np.asarray(_ssim2d_dense_oracle(np.asarray(a), np.asarray(b)))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)

    def test_augmentation_axes(self, rng):
        """2-D flips act on (h, w), never channels."""
        arr = np.stack([np.arange(16.0).reshape(4, 4)] * 3, axis=-1)  # (4,4,3)
        for _ in range(20):
            out = random_spatial_augmentation(arr.copy(), rng)
            # channel slices must remain identical (no channel mixing/flip)
            for c in range(1, 3):
                np.testing.assert_array_equal(out[..., c], out[..., 0])
            assert out.shape == arr.shape


class TestPipeline2D:
    def test_batches_from_2d_images(self, tmp_path):
        """VanGanDataset yields (GB, h, w, 1) batches from (H, W, C) .npy
        images in DIMENSIONS=2 mode (dataset.py:25-29 shapes)."""
        from vangan_tpu.data.pipeline import VanGanDataset

        rng = np.random.default_rng(0)
        img_paths, seg_paths = [], []
        for d, paths, seg in (("i2d", img_paths, False), ("s2d", seg_paths, True)):
            (tmp_path / d).mkdir()
            for i in range(3):
                if seg:
                    v = (rng.uniform(size=(24, 24, 1)) > 0.85).astype(np.float32) * 2 - 1
                else:
                    v = rng.normal(size=(24, 24, 1)).astype(np.float32)
                p = tmp_path / d / f"v{i}.npy"
                np.save(p, v)
                paths.append(str(p))
        cfg = cfg2d(SUBVOL_PATCH_SIZE=(8, 8, 8), output_dir=str(tmp_path))
        ds = VanGanDataset(
            cfg, {"training": img_paths, "validation": img_paths},
            {"training": seg_paths, "validation": seg_paths}, seed=0,
        )
        it = ds.train_batches(prefetch=1)
        for _ in range(2):
            real_I, real_S = next(it)
            assert real_I.shape == (2, 8, 8, 1)
            assert real_S.shape == (2, 8, 8, 1)
            assert (real_S.reshape(2, -1).max(axis=1) >= cfg.SEG_THRESH).all()
        ds.close()


class TestTrainStep2D:
    def test_step_finite_and_decreasing_d_loss(self, rng):
        cfg = cfg2d()
        gen = dict(upsample_mode="simple", filters=4, num_layers=2, dropout_type="none")
        disc = dict(filters=8, use_dropout=False, use_input_noise=False,
                    use_layer_noise=False)
        models = {
            "gen_IS": ResUNet3D(**gen), "gen_SI": ResUNet3D(**gen),
            "disc_I": PatchGANDiscriminator3D(**disc),
            "disc_S": PatchGANDiscriminator3D(**disc),
        }
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        rI = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
        rS = jnp.asarray((rng.uniform(size=(2, 16, 16, 1)) > 0.7) * 2.0 - 1.0, jnp.float32)
        step = jax.jit(fns.train_step)
        first = last = None
        for i in range(3):
            state, res = step(state, rI, rS, jax.random.PRNGKey(i),
                              jnp.asarray(0.0), jnp.asarray(True))
            assert all(np.isfinite(float(v)) for v in res.values())
            if first is None:
                first = float(res["D_I_loss"])
            last = float(res["D_I_loss"])
        assert last < first


class TestStitcher2D:
    def test_identity_gen_roundtrip(self, rng):
        """Stitching an identity generator over a 2-D image reproduces the
        (min-max-rescaled) image."""
        img = rng.normal(size=(40, 40, 1)).astype(np.float32)
        out = stitch_subvolumes(
            lambda p: p, img, subvol_size=(1, 16, 16, 1), stride=(8, 8),
            complete=True, padFactor=0.25, save=False, batch_size=4,
        )
        assert out.shape == img.shape
        mn, mx = img.min(), img.max()
        ref = 255 * (img - mn) / (mx - mn)
        np.testing.assert_allclose(out, ref, atol=1e-2)

    def test_gaussian_blend_2d(self, rng):
        img = rng.normal(size=(32, 32, 1)).astype(np.float32)
        out = stitch_subvolumes(
            lambda p: p, img, subvol_size=(1, 16, 16, 1), stride=(8, 8),
            complete=True, padFactor=0.1, save=False, batch_size=4, blend="gaussian",
        )
        assert out.shape == img.shape
        assert np.isfinite(out).all()


# --- oracles -----------------------------------------------------------------


def _minpool_np(img: np.ndarray, window) -> np.ndarray:
    """Stride-1 SAME min-pool over the spatial dims of (B, H, W, C)."""
    B, H, W, C = img.shape
    wh, ww = window
    ph, pw = wh // 2, ww // 2
    padded = np.full((B, H + 2 * ph, W + 2 * pw, C), np.inf, img.dtype)
    padded[:, ph : ph + H, pw : pw + W] = img
    out = np.full_like(img, np.inf)
    for dh in range(wh):
        for dw in range(ww):
            out = np.minimum(out, padded[:, dh : dh + H, dw : dw + W])
    return out


def _ssim2d_dense_oracle(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Dense 2-D Gaussian-window SSIM, transcribing loss_functions.py:87-117
    one rank down (the reference's own 2-D mode would crash here)."""
    size, sigma = 3, 1.5
    grid = np.arange((-size) // 2 + 1, size // 2 + 1, dtype=np.float32)
    g = np.exp(-0.5 * (grid / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
    g = g / g.sum()
    k2d = np.outer(g, g)

    def blur(x):
        B, H, W, C = x.shape
        out = np.zeros_like(x)
        pad = size // 2
        xp = np.zeros((B, H + 2 * pad, W + 2 * pad, C), x.dtype)
        xp[:, pad : pad + H, pad : pad + W] = x
        for i in range(size):
            for j in range(size):
                out += k2d[i, j] * xp[:, i : i + H, j : j + W]
        return out

    mu_a, mu_b = blur(a), blur(b)
    sa = blur(a * a) - mu_a**2
    sb = blur(b * b) - mu_b**2
    sab = blur(a * b) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    ssim = (2 * mu_a * mu_b + c1) * (2 * sab + c2) / (
        (mu_a**2 + mu_b**2 + c1) * (sa + sb + c2)
    )
    return 1.0 - ssim
