"""Command-line interface: preprocess / train / predict / sweep.

The reference has no CLI — ``main.py`` is an executable script doubling as the
config (SURVEY.md §1). Here the same recipe is driven from a YAML config:

    python -m vangan_tpu preprocess --config cfg.yaml \
        --imaging-raw RAW_A --seg-raw RAW_B --data-dir DATA
    python -m vangan_tpu train --config cfg.yaml --data-dir DATA
    python -m vangan_tpu predict --config cfg.yaml --input DIR --output DIR \
        [--fake-imaging] [--epoch N]
    python -m vangan_tpu sweep --config cfg.yaml --input DIR --start 100 --end 200
"""

from __future__ import annotations

import argparse
import os

# Honor JAX_PLATFORMS=cpu BEFORE backend init: a sitecustomize may have
# force-registered a remote TPU platform with the config already latched, in
# which case the env var alone is ignored and a dead tunnel HANGS backend
# init (tpu-session-discipline). The explicit config.update makes
# `JAX_PLATFORMS=cpu python -m vangan_tpu ...` work everywhere.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from vangan_tpu.config import VanGanConfig, save_args


def _load_cfg(args) -> VanGanConfig:
    cfg = VanGanConfig.from_yaml(args.config) if args.config else VanGanConfig()
    if getattr(args, "output_dir", None):
        cfg.output_dir = args.output_dir
    return cfg


def _load_partitions(cfg, data_dir):
    from vangan_tpu.data.preprocess import DataPreprocessor

    imaging = DataPreprocessor(cfg, partition_id="A", domain="imaging")
    imaging.load_partition(os.path.join(data_dir, "dataA_partition.pkl"))
    seg = DataPreprocessor(cfg, partition_id="B", domain="segmentation")
    seg.load_partition(os.path.join(data_dir, "dataB_partition.pkl"))
    return imaging, seg


def _resolve_preprocess_fn(spec):
    """Resolve the user imaging-domain preprocessing hook (--preprocess).

    ``rsom`` selects the published RSOM recipe — slice-wise z-score +
    percentile clip (reference main.py:127-161, wired into its imaging
    ``DataPreprocessor`` at main.py:115); anything else is a dotted path
    ``pkg.mod:fn`` (or ``pkg.mod.fn``) to a module-level
    ``np.ndarray -> np.ndarray`` function. Module-level is required: the
    preprocessor fans out over a ProcessPoolExecutor, so the hook must
    pickle.
    """
    if spec is None:
        return None
    if spec == "rsom":
        from vangan_tpu.utils import preprocess_rsom_images

        return preprocess_rsom_images
    import importlib

    mod, _, fn = spec.partition(":")
    if not fn:
        mod, _, fn = spec.rpartition(".")
    if not mod or not fn:
        raise SystemExit(f"--preprocess: cannot parse {spec!r} (use 'rsom' or 'pkg.mod:fn')")
    try:
        target = getattr(importlib.import_module(mod), fn)
    except (ImportError, AttributeError) as e:
        raise SystemExit(f"--preprocess: cannot resolve {spec!r}: {e}")
    if not callable(target):
        raise SystemExit(f"--preprocess: {spec!r} is not callable")
    return target


def cmd_preprocess(args) -> None:
    cfg = _load_cfg(args)
    from vangan_tpu.data.preprocess import DataPreprocessor

    imaging = DataPreprocessor(
        cfg, raw_path=args.imaging_raw, main_dir=args.data_dir, partition_id="A",
        partition_filename="dataA_partition.pkl", tiff_size=cfg.RAW_IMG_SIZE,
        target_size=cfg.TARG_RAW_IMG_SIZE, domain="imaging", seed=cfg.seed,
    )
    imaging.preprocess(resize=args.resize,
                       preprocess_fn=_resolve_preprocess_fn(args.preprocess))
    seg = DataPreprocessor(
        cfg, raw_path=args.seg_raw, main_dir=args.data_dir, partition_id="B",
        partition_filename="dataB_partition.pkl", tiff_size=cfg.SYNTH_IMG_SIZE,
        target_size=cfg.TARG_SYNTH_IMG_SIZE, domain="segmentation", seed=cfg.seed,
    )
    seg.preprocess(resize=args.resize)


def cmd_train(args) -> None:
    cfg = _load_cfg(args)
    import jax

    cfg.N_DEVICES = min(cfg.N_DEVICES or len(jax.devices()), len(jax.devices()))
    os.makedirs(cfg.output_dir, exist_ok=True)

    from vangan_tpu.data.pipeline import VanGanDataset
    from vangan_tpu.monitor import GanMonitor, TBSummary
    from vangan_tpu.training.loop import fit
    from vangan_tpu.vangan import VanGan

    if cfg.debug_nans:
        from vangan_tpu.monitor.profiling import enable_nan_debugging

        enable_nan_debugging()

    imaging, seg = _load_partitions(cfg, args.data_dir)
    dataset = VanGanDataset(cfg, imaging.partition, seg.partition, seed=cfg.seed,
                            semi_supervised_dir=args.semi_supervised_dir)
    if cfg.plot_dataset_samples:
        dataset.plot_sample_dataset(os.path.join(cfg.output_dir, "GANMonitor"))
    summary = TBSummary(os.path.join(cfg.output_dir, "TB_Logs"))
    gan = VanGan(cfg, steps_per_epoch=dataset.train_steps)
    monitor = GanMonitor(
        cfg, dataset=dataset, imaging_val_data=imaging.partition["validation"],
        segmentation_val_data=seg.partition["validation"],
        monitor_dir=os.path.join(cfg.output_dir, "GANMonitor"),
    )
    save_args(cfg, os.path.join(cfg.output_dir, "Args_Settings.txt"))

    start_epoch = 0
    if args.resume_epoch is not None:
        gan.load_checkpoint(epoch=args.resume_epoch)
        start_epoch = args.resume_epoch
    from vangan_tpu.monitor.profiling import trace

    with trace(cfg.profile_dir):
        fit(cfg, gan, dataset, summary, monitor, start_epoch=start_epoch)

    # post-training test-set inference (main.py:237-243)
    if args.predict_after:
        from vangan_tpu.inference import run_mapping

        run_mapping(gan, imaging.partition["testing"], cfg.INPUT_IMG_SIZE, filetext="VANGAN_",
                    filepath=cfg.output_dir, segmentation=True, stride=(25, 25, 25))
        run_mapping(gan, seg.partition["testing"], cfg.INPUT_IMG_SIZE, filetext="VANGAN_",
                    filepath=cfg.output_dir, segmentation=False, stride=(25, 25, 25))


def cmd_predict(args) -> None:
    cfg = _load_cfg(args)
    from vangan_tpu.inference import run_mapping
    from vangan_tpu.vangan import VanGan

    gan = VanGan(cfg, steps_per_epoch=1)
    if args.epoch is not None:
        gan.load_checkpoint(epoch=args.epoch)
    listing = sorted(os.listdir(args.input))
    os.makedirs(args.output, exist_ok=True)
    tiffs = [f for f in listing if f.lower().endswith((".tif", ".tiff"))]
    if tiffs:
        # the reference's "segment new data" recipe (main.py:255-270):
        # process_new_data -> run_mapping, straight from raw TIFFs
        from vangan_tpu.data.preprocess import DataPreprocessor

        npy_dir = os.path.join(args.output, "preprocessed_npy")
        pre = DataPreprocessor(cfg, partition_id="A", domain="imaging")
        pre.process_new_data(args.input, npy_dir, tiff_size=cfg.RAW_IMG_SIZE,
                             target_size=cfg.TARG_RAW_IMG_SIZE, resize=args.resize,
                             preprocess_fn=_resolve_preprocess_fn(args.preprocess))
        files = [os.path.join(npy_dir, f) for f in sorted(os.listdir(npy_dir))
                 if f.endswith(".npy")]
    else:
        files = [os.path.join(args.input, f) for f in listing if f.endswith(".npy")]
    run_mapping(gan, files, cfg.INPUT_IMG_SIZE, filetext="VANGAN_", filepath=args.output,
                segmentation=not args.fake_imaging, stride=tuple(args.stride))


def cmd_sweep(args) -> None:
    cfg = _load_cfg(args)
    from vangan_tpu.inference import epoch_sweep
    from vangan_tpu.vangan import VanGan

    gan = VanGan(cfg, steps_per_epoch=1)
    epoch_sweep(cfg, gan, args.input, start=args.start, end=args.end, step=args.step,
                segmentation=not args.fake_imaging)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="vangan_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("preprocess", help="TIFF -> npy + partitions")
    pp.add_argument("--config", default=None)
    pp.add_argument("--imaging-raw", required=True)
    pp.add_argument("--seg-raw", required=True)
    pp.add_argument("--data-dir", required=True)
    pp.add_argument("--resize", action="store_true")
    pp.add_argument("--preprocess", default=None, metavar="rsom|pkg.mod:fn",
                    help="imaging-domain preprocessing hook: 'rsom' (slice-wise "
                         "z-score + percentile clip, reference main.py:127-161) "
                         "or a dotted path to a np.ndarray->np.ndarray function")
    pp.set_defaults(fn=cmd_preprocess)

    pt = sub.add_parser("train", help="train VAN-GAN")
    pt.add_argument("--config", default=None)
    pt.add_argument("--data-dir", required=True)
    pt.add_argument("--output-dir", default=None)
    pt.add_argument("--resume-epoch", type=int, default=None)
    pt.add_argument("--semi-supervised-dir", default=None)
    pt.add_argument("--predict-after", action="store_true")
    pt.set_defaults(fn=cmd_train)

    pr = sub.add_parser(
        "predict", help="sliding-window inference on .npy volumes or raw TIFFs"
    )
    pr.add_argument("--config", default=None)
    pr.add_argument("--input", required=True,
                    help="directory of .npy volumes, or of raw .tiff files "
                         "(preprocessed on the fly, main.py:255-270)")
    pr.add_argument("--output", required=True)
    pr.add_argument("--epoch", type=int, default=None)
    pr.add_argument("--fake-imaging", action="store_true")
    pr.add_argument("--stride", type=int, nargs=3, default=(25, 25, 25))
    pr.add_argument("--resize", action="store_true",
                    help="Lanczos-resize raw TIFFs to TARG_RAW_IMG_SIZE")
    pr.add_argument("--preprocess", default=None, metavar="rsom|pkg.mod:fn",
                    help="preprocessing hook applied to raw TIFF inputs "
                         "(same semantics as `preprocess --preprocess`)")
    pr.add_argument("--output-dir", default=None)
    pr.set_defaults(fn=cmd_predict)

    ps = sub.add_parser("sweep", help="epoch sweep over checkpoints")
    ps.add_argument("--config", default=None)
    ps.add_argument("--input", required=True)
    ps.add_argument("--start", type=int, default=100)
    ps.add_argument("--end", type=int, default=200)
    ps.add_argument("--step", type=int, default=2)
    ps.add_argument("--fake-imaging", action="store_true")
    ps.add_argument("--output-dir", default=None)
    ps.set_defaults(fn=cmd_sweep)

    args = p.parse_args(argv)
    from vangan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
