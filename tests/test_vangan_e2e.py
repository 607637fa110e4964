"""End-to-end integration: VanGan facade + fit loop + checkpoint + inference
on synthetic data, all at tiny scale on the CPU mesh."""

import os

import numpy as np
import pytest

from vangan_tpu.config import VanGanConfig
from vangan_tpu.data.pipeline import VanGanDataset
from vangan_tpu.monitor import GanMonitor, TBSummary
from vangan_tpu.training.loop import fit
from vangan_tpu.vangan import VanGan

from test_data import make_volumes
from test_train_step import tiny_models


@pytest.fixture
def setup(tmp_path):
    cfg = VanGanConfig(
        N_DEVICES=2,
        BATCH_SIZE=1,
        EPOCHS=2,
        SUBVOL_PATCH_SIZE=(16, 16, 16),
        compute_dtype="float32",
        cldice_iters=2,
        output_dir=str(tmp_path / "out"),
        PERIOD_2D_CALLBACK=2,
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    img = make_volumes(tmp_path / "img", 4, shape=(24, 24, 20, 1), seed=1)
    seg = make_volumes(tmp_path / "seg", 4, shape=(24, 24, 20, 1), seg=True, seed=2)
    dataset = VanGanDataset(
        cfg,
        {"training": img, "validation": img, "testing": img},
        {"training": seg, "validation": seg, "testing": seg},
        seed=0,
    )
    return cfg, dataset, tmp_path


class TestEndToEnd:
    @pytest.mark.slow
    def test_fit_checkpoint_predict(self, setup):
        cfg, dataset, tmp_path = setup
        summary = TBSummary(str(tmp_path / "tb"))
        gan = VanGan(cfg, steps_per_epoch=dataset.train_steps, models=tiny_models(False))
        monitor = GanMonitor(
            cfg,
            dataset=dataset,
            imaging_val_data=dataset.imaging_partition["validation"],
            segmentation_val_data=dataset.seg_partition["validation"],
            monitor_dir=str(tmp_path / "mon"),
        )
        fit(cfg, gan, dataset, summary, monitor)
        dataset.close()

        # checkpoint written at epoch cadence (epoch%2==1 -> checkpoint_e2)
        assert gan.checkpointer.latest_epoch() == 2
        assert int(gan.state.step) == 2 * dataset.train_steps

        # monitor panels exist
        pngs = os.listdir(tmp_path / "mon")
        assert any(p.endswith(".png") for p in pngs)

        # restore round-trip through the facade
        step_before = int(gan.state.step)
        gan.load_checkpoint(epoch=2)
        assert gan.checkpoint_loaded
        assert int(gan.state.step) == step_before

        # sliding-window inference through the jitted batched generator
        from vangan_tpu.inference import run_mapping

        out_dir = tmp_path / "pred"
        os.makedirs(out_dir, exist_ok=True)
        run_mapping(
            gan,
            dataset.imaging_partition["testing"][:1],
            sub_img_size=(1, 16, 16, 16, 1),
            segmentation=True,
            stride=(8, 8, 8),
            filetext="VANGAN_",
            filepath=str(out_dir),
        )
        outs = os.listdir(out_dir)
        assert len(outs) == 1 and outs[0].startswith("VANGAN_") and outs[0].endswith(".tiff")

    @pytest.mark.slow
    def test_fit_predict_2d(self, tmp_path):
        """Full facade in DIMENSIONS=2: fit, monitor panels, checkpoint and a
        stitched 2-D prediction (the mode the reference declares but cannot
        run — docs/PARITY.md #5)."""
        rng = np.random.default_rng(0)
        img_paths, seg_paths = [], []
        for d, paths, seg in (("i2", img_paths, False), ("s2", seg_paths, True)):
            (tmp_path / d).mkdir()
            for i in range(4):
                if seg:
                    v = (rng.uniform(size=(24, 24, 1)) > 0.85).astype(np.float32) * 2 - 1
                else:
                    v = rng.normal(size=(24, 24, 1)).astype(np.float32)
                p = tmp_path / d / f"v{i}.npy"
                np.save(p, v)
                paths.append(str(p))
        cfg = VanGanConfig(
            N_DEVICES=2, BATCH_SIZE=1, EPOCHS=2, DIMENSIONS=2,
            SUBVOL_PATCH_SIZE=(16, 16, 16), compute_dtype="float32",
            cldice_iters=2, output_dir=str(tmp_path / "out"), PERIOD_2D_CALLBACK=2,
        )
        os.makedirs(cfg.output_dir, exist_ok=True)
        dataset = VanGanDataset(
            cfg, {"training": img_paths, "validation": img_paths, "testing": img_paths},
            {"training": seg_paths, "validation": seg_paths, "testing": seg_paths},
            seed=0,
        )
        summary = TBSummary(str(tmp_path / "tb"))
        gan = VanGan(cfg, steps_per_epoch=dataset.train_steps, models=tiny_models(False))
        monitor = GanMonitor(
            cfg, dataset=dataset,
            imaging_val_data=dataset.imaging_partition["validation"],
            segmentation_val_data=dataset.seg_partition["validation"],
            monitor_dir=str(tmp_path / "mon"),
        )
        fit(cfg, gan, dataset, summary, monitor)
        dataset.close()
        assert gan.checkpointer.latest_epoch() == 2
        assert any(p.endswith(".png") for p in os.listdir(tmp_path / "mon"))

        from vangan_tpu.inference import run_mapping

        out_dir = tmp_path / "pred2d"
        os.makedirs(out_dir, exist_ok=True)
        run_mapping(
            gan, dataset.imaging_partition["testing"][:1],
            sub_img_size=cfg.INPUT_IMG_SIZE, segmentation=True,
            stride=(8, 8, 8), filetext="VANGAN_", filepath=str(out_dir),
        )
        from vangan_tpu.data.preprocess import read_tiff

        outs = os.listdir(out_dir)
        assert len(outs) == 1
        pred = read_tiff(os.path.join(str(out_dir), outs[0]))
        assert pred.shape == (24, 24, 1)
        assert np.isfinite(pred).all()

    def test_tb_events_written(self, setup):
        cfg, dataset, tmp_path = setup
        summary = TBSummary(str(tmp_path / "tb2"))
        summary.scalar("x", 1.0, epoch=0, training=True)
        summary.scalar("x", 2.0, epoch=0, training=False)
        summary.close()
        files = []
        for root, _, fs in os.walk(tmp_path / "tb2"):
            files += [os.path.join(root, f) for f in fs]
        assert any("tfevents" in f for f in files)
        dataset.close()
