"""TensorBoard summary writers (tb_callback.py:14-103 equivalent).

Separate train/validate writers; scalar, image, matplotlib-figure and
cycle-panel logging. Uses tensorboardX (framework-free event files).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


class TBSummary:
    """Train/validate scalar+image writers (tb_callback.py:21-103)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        if _HAS_TB:
            self.train_writer = SummaryWriter(os.path.join(log_dir, "train"))
            self.val_writer = SummaryWriter(os.path.join(log_dir, "validate"))
        else:  # pragma: no cover
            self.train_writer = self.val_writer = None

    def _writer(self, training: bool):
        return self.train_writer if training else self.val_writer

    def scalar(self, name: str, value: float, epoch: int, training: bool = True) -> None:
        w = self._writer(training)
        if w is not None:
            w.add_scalar(name, float(value), epoch)
            w.flush()

    def losses(self, results: Dict[str, list]) -> None:
        """Console pretty-print of mean losses (tb_callback.py:32-36)."""
        means = {k: float(np.mean(v)) for k, v in results.items()}
        print("  ".join(f"{k}: {v:.4f}" for k, v in means.items()))

    def image(self, name: str, img: np.ndarray, epoch: int, training: bool = True) -> None:
        w = self._writer(training)
        if w is not None:
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[None]
            elif arr.ndim == 3 and arr.shape[-1] in (1, 3):
                arr = np.moveaxis(arr, -1, 0)
            w.add_image(name, arr, epoch)
            w.flush()

    def figure(self, name: str, fig, epoch: int, training: bool = True) -> None:
        """Render a matplotlib figure to the event file (tb_callback.py:48-64)."""
        w = self._writer(training)
        if w is None:
            return
        w.add_figure(name, fig, epoch)
        w.flush()

    def image_cycle(
        self, name: str, real: np.ndarray, fake: np.ndarray, cycled: np.ndarray, epoch: int,
        training: bool = True,
    ) -> None:
        """3-panel real/fake/cycled strip (tb_callback.py:66-103)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 3, figsize=(9, 3))
        for ax, arr, title in zip(axs, (real, fake, cycled), ("real", "fake", "cycled")):
            ax.imshow(np.squeeze(arr), cmap="gray")
            ax.set_title(title)
            ax.axis("off")
        self.figure(name, fig, epoch, training)
        plt.close(fig)

    def close(self) -> None:
        for w in (self.train_writer, self.val_writer):
            if w is not None:
                w.close()
