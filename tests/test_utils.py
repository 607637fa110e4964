"""Tests for host-side utilities (utils.py parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vangan_tpu.utils import (
    add_gauss_noise,
    check_nan,
    get_sub_volume,
    get_vacuum,
    hist_equalization,
    load_dict,
    matched_crop,
    preprocess_rsom_images,
    replace_nan,
    save_dict,
)
from vangan_tpu.config import VanGanConfig, save_args


class TestUtils:
    def test_replace_nan(self):
        x = jnp.asarray([1.0, np.nan, 3.0])
        np.testing.assert_allclose(np.asarray(replace_nan(x)), [1.0, 0.0, 3.0])

    def test_add_gauss_noise_clips(self, rng):
        img = jnp.asarray(rng.uniform(-1, 1, size=(4, 4)).astype(np.float32))
        out = np.asarray(add_gauss_noise(img, 2.0, jax.random.PRNGKey(0)))
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_get_vacuum(self):
        arr = np.zeros((8, 8, 8, 1), dtype=np.float32)
        arr[2:5, 3:6, 1:4, 0] = 1.0
        out = get_vacuum(arr, dim=3)
        assert out.shape == (3, 3, 3, 1)
        assert (out > 0).all()

    def test_hist_equalization_monotone(self, rng):
        img = rng.uniform(size=(16, 16)).astype(np.float32)
        out = hist_equalization(img)
        assert out.min() >= 0 and out.max() <= 1
        flat_in, flat_out = img.ravel(), out.ravel()
        order = np.argsort(flat_in)
        assert (np.diff(flat_out[order]) >= -1e-9).all()

    def test_save_load_dict(self, tmp_path):
        d = {"a": [1, 2], "b": "x"}
        p = str(tmp_path / "d.pkl")
        save_dict(d, p)
        assert load_dict(p) == d

    def test_get_sub_volume(self, rng):
        img = rng.normal(size=(16, 16, 16, 1)).astype(np.float32)
        sub = get_sub_volume(img, (8, 8, 8), rng=np.random.default_rng(0))
        assert sub.shape == (8, 8, 8, 1)

    def test_preprocess_rsom(self, rng):
        img = rng.normal(size=(8, 8, 4)).astype(np.float32) * 10 + 5
        out = preprocess_rsom_images(img.copy())
        assert out.shape == img.shape
        # each z-slice ~zero-mean after slice-wise z-score (then clipped)
        assert abs(out[..., 0].mean()) < 0.5

    def test_matched_crop(self, rng):
        stack = rng.normal(size=(2, 16, 8, 1, 1)).astype(np.float32)
        a, b = matched_crop(stack, batch_size=2, img_size=(0, 8, 8), channels=1, axis=1,
                            rng=np.random.default_rng(0))
        assert a.shape == b.shape
        assert a.shape[1] == 8

    def test_check_nan(self):
        assert check_nan(np.array([np.nan]))
        assert not check_nan(np.array([0.0]))


class TestConfig:
    def test_save_args_format(self, tmp_path):
        cfg = VanGanConfig(N_DEVICES=2, BATCH_SIZE=3)
        p = str(tmp_path / "Args_Settings.txt")
        save_args(cfg, p)
        text = open(p).read()
        assert text.startswith("Command line arguments:\n")
        assert "GLOBAL_BATCH_SIZE: 6" in text
        assert "SUBVOL_PATCH_SIZE: (128, 128, 128)" in text

    def test_yaml_roundtrip(self, tmp_path):
        cfg = VanGanConfig(N_DEVICES=4, EPOCHS=10, SUBVOL_PATCH_SIZE=(32, 32, 32))
        p = str(tmp_path / "cfg.yaml")
        cfg.to_yaml(p)
        cfg2 = VanGanConfig.from_yaml(p)
        assert cfg2.N_DEVICES == 4
        assert cfg2.EPOCHS == 10
        assert cfg2.SUBVOL_PATCH_SIZE == (32, 32, 32)
        assert cfg2.GLOBAL_BATCH_SIZE == cfg.GLOBAL_BATCH_SIZE

    def test_derived_fields(self):
        cfg = VanGanConfig(EPOCHS=100, N_DEVICES=4, BATCH_SIZE=2)
        assert cfg.GLOBAL_BATCH_SIZE == 8
        assert cfg.INITIATE_LR_DECAY == 50
        assert cfg.NO_NOISE == 100
        assert cfg.cldice_groups == 4
        assert cfg.INPUT_IMG_SIZE == (8, 128, 128, 128, 1)

    def test_noise_schedule(self):
        cfg = VanGanConfig(EPOCHS=200)
        assert cfg.noise_std_at_epoch(0) == pytest.approx(0.1)
        assert cfg.noise_std_at_epoch(100) == pytest.approx(0.05)
        assert cfg.noise_std_at_epoch(200) == 0.0
        assert cfg.noise_std_at_epoch(300) == 0.0
