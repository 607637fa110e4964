"""Per-epoch monitoring: sample panels, schedules, model export.

Equivalent of the reference's ``GanMonitor`` (custom_callback.py:12-464), with
two structural changes that fall out of the TPU-native design:

- the LR schedule is step-indexed inside the optimizer, so ``set_learning_rate``
  (custom_callback.py:326-397) reduces to *reporting* the current LR;
- the discriminator noise σ is a traced argument of the train step, so
  ``updateDiscriminatorNoise`` (custom_callback.py:399-424) reduces to the pure
  σ(epoch) computation (config.noise_std_at_epoch).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from vangan_tpu.data.pipeline import random_crop
from vangan_tpu.inference.stitcher import stitch_subvolumes
from vangan_tpu.training.optimizers import make_lr_schedule


class GanMonitor:
    """Generates and saves image panels per epoch (custom_callback.py:12-31)."""

    def __init__(
        self,
        cfg,
        dataset=None,
        imaging_val_data: Optional[Sequence[str]] = None,
        segmentation_val_data: Optional[Sequence[str]] = None,
        process_imaging_domain: Optional[Callable] = None,
        monitor_dir: str = "GANMonitor",
    ):
        self.cfg = cfg
        self.imgSize = cfg.INPUT_IMG_SIZE
        self.dataset = dataset
        self.imaging_val_data = imaging_val_data
        self.segmentation_val_data = segmentation_val_data
        self.process_imaging_domain = process_imaging_domain
        self.period = cfg.PERIOD_2D_CALLBACK
        self.period3D = cfg.PERIOD_3D_CALLBACK
        self.model_path = cfg.output_dir
        self.monitor_dir = monitor_dir
        os.makedirs(monitor_dir, exist_ok=True)
        self._rng = np.random.default_rng(cfg.seed + 77)

    # --- schedules (pure; cf. custom_callback.py:326-424) ---

    def noise_std(self, epoch: int) -> float:
        return self.cfg.noise_std_at_epoch(epoch)

    def current_lr(self, epoch: int, steps_per_epoch: int) -> float:
        sched = make_lr_schedule(self.cfg, steps_per_epoch)
        return float(sched(epoch * steps_per_epoch))

    def on_epoch_start(self, model, epoch: int, steps_per_epoch: Optional[int] = None) -> float:
        """Report schedule positions; returns σ(epoch) for the train step."""
        std = self.noise_std(epoch)
        print(f"Noise std: {std:.5f}")
        if steps_per_epoch:
            print(f"Learning rate: {self.current_lr(epoch, steps_per_epoch):.8f}")
        return std

    # --- model export (custom_callback.py:33-45) ---

    def save_model(self, model, epoch: int) -> str:
        """Standalone model export (SavedModel analogue, custom_callback.py:33-45):
        per-network .npz weights bundled with the config + a manifest, so
        ``vangan_tpu.checkpoint.load_exported`` can rebuild and apply the
        networks without the training run's code state."""
        from vangan_tpu.checkpoint import export_models

        return export_models(self.cfg, model.state, epoch, out_dir=self.model_path)

    # --- sample panels (custom_callback.py:225-324) ---

    def imagePlotter(
        self,
        epoch: int,
        filename: str,
        setlist: Sequence[str],
        dataset_iter,
        genX: Callable,
        genY: Callable,
        nfig: int = 6,
        outputFull: bool = False,
        process_img: bool = False,
    ) -> None:
        """2-D sample panels (input/translated/cycled/identity + histograms)
        from a random validation crop; optional stitched 3-D dump."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sample_full, idx = next(dataset_iter)
        sample_name = os.path.splitext(os.path.basename(str(setlist[idx])))[0]
        crop = random_crop(sample_full, self.imgSize[1:], self._rng)
        sample = crop[None]
        if process_img and self.process_imaging_domain is not None:
            sample = self.process_imaging_domain(sample)

        prediction = np.asarray(genX(sample))
        cycled = np.asarray(genY(prediction))
        identity = np.asarray(genY(sample))
        sample, prediction, cycled, identity = (
            sample[0], prediction[0], cycled[0], identity[0]
        )

        panels = (sample, prediction, cycled, identity)
        titles = ("Input image", "Translated image", "Cycled image", "Identity image")
        if sample.ndim == 3:
            # DIMENSIONS=2: one image row + histogram row (the reference's
            # nfig=1 2-D convention, dataset.py:293-300)
            fig, ax = plt.subplots(2, 4, figsize=(12, 6))
            for c, (arr, title) in enumerate(zip(panels, titles)):
                ax[0, c].imshow(arr[:, :, 0], cmap="gray")
                ax[0, c].set_title(title)
                ax[0, c].axis("off")
                ax[1, c].hist(arr.ravel(), bins=256, range=(arr.min(), arr.max()),
                              fc="k", ec="k", density=True)
            fig.savefig(os.path.join(self.monitor_dir, f"{epoch + 1}_{filename}.png"), dpi=150)
            plt.close(fig)
            if epoch % self.period3D == 1 and outputFull and epoch > 160:
                stitch_subvolumes(
                    genX, sample_full, self.imgSize, epoch=epoch, name=sample_name,
                    process_img=process_img, model_path=self.model_path,
                    batch_size=self.cfg.stitcher_batch,
                )
            return

        fig, ax = plt.subplots(nfig + 1, 4, figsize=(12, 12))
        depth = sample.shape[2]
        for j in range(nfig):
            z = j * int(depth / nfig)
            for c, (arr, title) in enumerate(zip(panels, titles)):
                ax[j, c].imshow(arr[:, :, z, 0], cmap="gray")
                ax[j, c].set_title(title)
                ax[j, c].axis("off")
        for c, arr in enumerate(panels):
            ax[nfig, c].hist(arr.ravel(), bins=256, range=(arr.min(), arr.max()),
                             fc="k", ec="k", density=True)
        fig.savefig(os.path.join(self.monitor_dir, f"{epoch + 1}_{filename}.png"), dpi=150)
        plt.close(fig)

        # 3-D stitched dump cadence parity (custom_callback.py:322-324)
        if epoch % self.period3D == 1 and outputFull and epoch > 160:
            stitch_subvolumes(
                genX, sample_full, self.imgSize, epoch=epoch, name=sample_name,
                process_img=process_img, model_path=self.model_path,
                batch_size=self.cfg.stitcher_batch,
            )

    def on_epoch_end(self, model, epoch: int) -> None:
        """2-D plots for both generators (custom_callback.py:446-464)."""
        if self.dataset is None:
            return
        self.imagePlotter(
            epoch, "genIS", self.imaging_val_data, self._imaging_full_iter(), model.gen_IS_batched,
            model.gen_SI_batched, process_img=True,
        )
        self.imagePlotter(
            epoch, "genSI", self.segmentation_val_data, self._segmentation_full_iter(),
            model.gen_SI_batched, model.gen_IS_batched, outputFull=True,
        )

    def _imaging_full_iter(self):
        if not hasattr(self, "_img_iter"):
            self._img_iter = self.dataset.imaging_val_full()
        return self._img_iter

    def _segmentation_full_iter(self):
        if not hasattr(self, "_seg_iter"):
            self._seg_iter = self.dataset.segmentation_val_full()
        return self._seg_iter
