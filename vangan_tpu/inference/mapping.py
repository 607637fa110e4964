"""Batch inference over test-set file lists + checkpoint epoch sweep.

Equivalents of ``GanMonitor.run_mapping`` (custom_callback.py:466-509) and
``post_training.epoch_sweep`` (post_training.py:4-39).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from vangan_tpu.inference.stitcher import stitch_subvolumes


def run_mapping(
    vangan,
    test_set: Sequence[str],
    sub_img_size: Sequence[int] = (64, 64, 512, 1),
    segmentation: bool = True,
    stride: Tuple[int, int, int] = (25, 25, 1),
    padFactor: float = 0.25,
    filetext: Optional[str] = None,
    filepath: str = "",
    batch_size: Optional[int] = None,
    blend: str = "uniform",
    mesh=None,
) -> None:
    """Map every volume in ``test_set`` through gen_IS (segmentation) or gen_SI
    (fake imaging) and save stitched TIFFs (custom_callback.py:466-509).

    ``vangan`` is a VanGan facade exposing jitted ``gen_IS_batched`` /
    ``gen_SI_batched`` callables. With ``mesh`` (or cfg.N_DEVICES > 1 and an
    available device mesh) the patch batch of every volume is sharded across
    the data mesh — multi-chip inference.
    """
    gen = vangan.gen_IS_batched if segmentation else vangan.gen_SI_batched
    device_apply = None
    if getattr(vangan.cfg, "stitcher_device", True) and hasattr(vangan, "gen_apply"):
        device_apply = vangan.gen_apply("gen_IS" if segmentation else "gen_SI")
    if mesh is None and device_apply is not None and vangan.cfg.N_DEVICES > 1:
        import jax

        if len(jax.devices()) >= vangan.cfg.N_DEVICES:
            from vangan_tpu.parallel import make_mesh

            mesh = make_mesh(vangan.cfg.N_DEVICES, vangan.cfg.mesh_axis)
    verb = "Segmenting" if segmentation else "Mapping"
    for imgdir in range(len(test_set)):
        img = np.load(str(test_set[imgdir]))
        filename = os.path.splitext(os.path.basename(str(test_set[imgdir])))[0]
        print(f"{verb} {filename} ... ({imgdir + 1} / {len(test_set)})")
        stitch_subvolumes(
            gen,
            img,
            sub_img_size,
            name=(filetext or "") + filename,
            output_path=filepath,
            complete=True,
            stride=stride,
            padFactor=padFactor,
            process_img=not segmentation,
            batch_size=batch_size or getattr(vangan.cfg, "stitcher_batch", 8),
            blend=blend,
            device_apply=device_apply,
            mesh=mesh,
            mesh_axis=getattr(vangan.cfg, "mesh_axis", "data"),
            # the artifact is a 255 x min-max TIFF: stream exactly-scaled
            # uint8 bands (4x fewer bytes on the tunnelled link; within half
            # a grey level of the float path — tests/test_stitcher.py)
            stream_dtype=getattr(vangan.cfg, "stitcher_stream_dtype", "uint8"),
            upload_dtype=getattr(vangan.cfg, "stitcher_upload_dtype", "float16"),
        )


def epoch_sweep(
    cfg,
    vangan,
    test_path,
    start: int = 100,
    end: int = 200,
    step: int = 2,
    segmentation: bool = True,
    sub_img_size: Optional[Sequence[int]] = None,
) -> None:
    """Run inference from every ``step``-th checkpoint in [start, end] for model
    selection (post_training.py:4-39): outputs go to Epoch_Sampling/e{i}/."""
    if isinstance(test_path, (list, tuple, np.ndarray)):
        test_files = [str(p) for p in test_path]
    else:
        test_files = [os.path.join(test_path, f) for f in sorted(os.listdir(test_path))]

    sweep_dir = os.path.join(cfg.output_dir, "Epoch_Sampling")
    os.makedirs(sweep_dir, exist_ok=True)
    for epoch in range(start, end + 1, step):
        vangan.load_checkpoint(epoch=epoch)
        out_dir = os.path.join(sweep_dir, f"e{epoch}")
        os.makedirs(out_dir, exist_ok=True)
        run_mapping(
            vangan,
            test_files,
            sub_img_size or cfg.INPUT_IMG_SIZE,
            segmentation=segmentation,
            stride=(50, 50, 50),
            padFactor=0.1,
            filetext="VANGAN_",
            filepath=out_dir,
        )
