"""The end-to-end training loop (main.py:214-235 equivalent)."""

from __future__ import annotations

import time

from vangan_tpu.vangan import VanGan, train


def fit(
    cfg,
    gan: VanGan,
    dataset,
    summary,
    monitor=None,
    start_epoch: int = 0,
) -> None:
    """Epoch loop: schedules -> train -> validate -> periodic panels+checkpoint.

    Cadence parity with main.py:230-232: panels + checkpoint when
    ``epoch % PERIOD_2D_CALLBACK == 1`` or on the final epoch.
    """
    train_iter = dataset.train_batches()
    val_iter = dataset.val_batches()

    try:
        for epoch in range(start_epoch, cfg.EPOCHS):
            print(f"\nEpoch {epoch + 1:03d}/{cfg.EPOCHS:03d}")
            start = time.time()
            gan.current_epoch = epoch

            if monitor is not None:
                noise_std = monitor.on_epoch_start(gan, epoch, dataset.train_steps)
            else:
                noise_std = cfg.noise_std_at_epoch(epoch)

            results = train(train_iter, gan, summary, epoch, dataset.train_steps,
                            "Train", training=True, noise_std=noise_std)
            summary.losses(results)

            results = train(val_iter, gan, summary, epoch, dataset.val_steps,
                            "Validate", training=False)
            summary.losses(results)

            if epoch % cfg.PERIOD_2D_CALLBACK == 1 or epoch == cfg.EPOCHS - 1:
                if monitor is not None:
                    monitor.on_epoch_end(gan, epoch)
                gan.save_checkpoint(epoch=epoch)

            summary.scalar("elapse", time.time() - start, epoch=epoch,
                           training=True)
    finally:
        # saves are async (checkpoint.py); commit the last one even when the
        # loop unwinds on an exception (e.g. a PipelineError mid-epoch) so an
        # announced "Saving checkpoint ... (async)" is never lost — a resume
        # or post-mortem eval must find the run's last saved state on disk
        gan.checkpointer.wait_until_finished()
