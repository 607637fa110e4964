"""CLI tests: the user preprocessing-function hook (VERDICT r3 missing #1).

The reference wires the RSOM slice-wise z-score + percentile clip into the
imaging-domain preprocessor (main.py:127-161 -> preprocessing.py:121-145's
``preprocess_fn``); ``vangan_tpu preprocess --preprocess rsom`` (or a dotted
``pkg.mod:fn`` path) makes that recipe CLI-reproducible.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from vangan_tpu.cli import _resolve_preprocess_fn, main
from vangan_tpu.config import VanGanConfig
from vangan_tpu.utils import preprocess_rsom_images


class TestResolvePreprocessFn:
    def test_none(self):
        assert _resolve_preprocess_fn(None) is None

    def test_rsom_builtin(self):
        assert _resolve_preprocess_fn("rsom") is preprocess_rsom_images

    def test_dotted_colon_path(self):
        fn = _resolve_preprocess_fn("vangan_tpu.utils:preprocess_rsom_images")
        assert fn is preprocess_rsom_images

    def test_dotted_dot_path(self):
        fn = _resolve_preprocess_fn("vangan_tpu.utils.preprocess_rsom_images")
        assert fn is preprocess_rsom_images

    def test_bad_specs(self):
        for spec in ("nosuchmodule:fn", "vangan_tpu.utils:nosuchfn", "garbage"):
            with pytest.raises(SystemExit):
                _resolve_preprocess_fn(spec)

    def test_non_callable(self):
        with pytest.raises(SystemExit):
            _resolve_preprocess_fn("vangan_tpu.utils:np")


def _write_raw(dirpath, n, shape_zyx=(4, 8, 8), seed=0):
    import imageio.v3 as iio

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        iio.imwrite(os.path.join(dirpath, f"v{i}.tiff"),
                    (rng.normal(size=shape_zyx) * 40 + 100).astype(np.float32))


def _write_seg(dirpath, n, shape_zyx=(4, 8, 8), seed=1):
    import imageio.v3 as iio

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        iio.imwrite(os.path.join(dirpath, f"s{i}.tiff"),
                    ((rng.uniform(size=shape_zyx) > 0.8) * 255.0).astype(np.float32))


class TestPreprocessCLIHook:
    def _run(self, tmp_path, tag, extra_args):
        raw_i = str(tmp_path / "rawA")
        raw_s = str(tmp_path / "rawB")
        _write_raw(raw_i, 3)
        _write_seg(raw_s, 3)
        data = str(tmp_path / f"data_{tag}")
        os.makedirs(data, exist_ok=True)
        cfg = VanGanConfig(
            RAW_IMG_SIZE=(8, 8, 4, 1), TARG_RAW_IMG_SIZE=(8, 8, 4, 1),
            SYNTH_IMG_SIZE=(8, 8, 4), TARG_SYNTH_IMG_SIZE=(8, 8, 4),
            seed=0, output_dir=str(tmp_path / "out"),
        )
        cfg_path = str(tmp_path / f"cfg_{tag}.yaml")
        cfg.to_yaml(cfg_path)
        main(["preprocess", "--config", cfg_path, "--imaging-raw", raw_i,
              "--seg-raw", raw_s, "--data-dir", data] + extra_args)
        with open(os.path.join(data, "dataA_partition.pkl"), "rb") as f:
            part = pickle.load(f)
        files = sorted(p for v in part.values() for p in v)
        return {os.path.basename(p): np.load(p) for p in files}

    def test_rsom_hook_changes_imaging_output(self, tmp_path):
        plain = self._run(tmp_path, "plain", [])
        rsom = self._run(tmp_path, "rsom", ["--preprocess", "rsom"])
        assert set(plain) == set(rsom)
        # same normalised range either way...
        for name in plain:
            assert rsom[name].min() == pytest.approx(-1.0, abs=1e-6)
            assert rsom[name].max() == pytest.approx(1.0, abs=1e-6)
        # ...but the hook must actually have been applied (z-score + clip
        # reshapes the distribution, so the arrays differ)
        assert any(not np.allclose(plain[n], rsom[n], atol=1e-5) for n in plain)

    def test_rsom_hook_matches_manual_pipeline(self, tmp_path):
        """The CLI run equals applying preprocess_rsom_images inside the
        preprocessor directly (what the Python API already supported)."""
        from vangan_tpu.data.preprocess import DataPreprocessor

        rsom = self._run(tmp_path, "rsom2", ["--preprocess", "rsom"])
        raw_i = str(tmp_path / "rawA")
        data = str(tmp_path / "data_manual")
        os.makedirs(data, exist_ok=True)
        pre = DataPreprocessor(
            raw_path=raw_i, main_dir=data, partition_id="A",
            partition_filename="dataA_partition.pkl", tiff_size=(8, 8, 4, 1),
            target_size=(8, 8, 4, 1), domain="imaging", num_workers=1, seed=0,
        )
        pre.preprocess(preprocess_fn=preprocess_rsom_images)
        with open(os.path.join(data, "dataA_partition.pkl"), "rb") as f:
            part = pickle.load(f)
        manual = {os.path.basename(p): np.load(p)
                  for v in part.values() for p in v}
        assert set(manual) == set(rsom)
        for name in manual:
            np.testing.assert_allclose(manual[name], rsom[name], atol=1e-6)
