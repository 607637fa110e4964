"""Typed configuration for VAN-GAN-TPU.

The reference uses a bare ``argparse.ArgumentParser()`` instance as a mutable
attribute bag with ~25 undeclared fields (main.py:62-105) plus ``VanGan.__init__``
keyword defaults (vangan.py:25-34). Here the full config surface is a frozen
dataclass with the same canonical fields (upper-case names preserved for parity
with ``Args_Settings.txt`` dumps), YAML round-tripping, and derived quantities
computed once.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

try:
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover
    _HAS_YAML = False


@dataclass
class VanGanConfig:
    """Canonical config. Field names/defaults mirror main.py:62-105 and vangan.py:25-34."""

    # --- output / devices (main.py:63-67) ---
    output_dir: str = "./VG_Output"
    N_DEVICES: int = 1
    BUFFER_SIZE: int = 256
    MIN_PIXEL_VALUE: float = -1.0
    MAX_PIXEL_VALUE: float = 0.8

    # --- training (main.py:70-76) ---
    EPOCHS: int = 200
    BATCH_SIZE: int = 3  # per-device batch
    GLOBAL_BATCH_SIZE: Optional[int] = None  # derived: N_DEVICES * BATCH_SIZE
    PREFETCH_SIZE: int = 4
    # host sampler threads per split (tf.data AUTOTUNE-parallelism analogue,
    # dataset.py:62-104). 1 = the serial stream; >1 changes the sample stream
    # (each worker owns an independently seeded sampler pair) but stays
    # deterministic for a fixed (seed, DATA_WORKERS)
    DATA_WORKERS: int = 1
    INITIAL_LR: float = 2e-4
    INITIATE_LR_DECAY: Optional[float] = None  # derived: 0.5 * EPOCHS
    NO_NOISE: Optional[int] = None  # derived: EPOCHS (epoch when disc noise hits 0)

    # --- image geometry (main.py:79-101) ---
    CHANNELS: int = 1
    DIMENSIONS: int = 3
    RAW_IMG_SIZE: Tuple[int, ...] = (512, 512, 140, 1)
    TARG_RAW_IMG_SIZE: Tuple[int, ...] = (512, 512, 128, 1)
    SYNTH_IMG_SIZE: Tuple[int, ...] = (512, 512, 128)
    TARG_SYNTH_IMG_SIZE: Tuple[int, ...] = (512, 512, 128)
    SUBVOL_PATCH_SIZE: Tuple[int, ...] = (128, 128, 128)

    # --- callbacks (main.py:104-105) ---
    PERIOD_2D_CALLBACK: int = 2
    PERIOD_3D_CALLBACK: int = 2

    # --- VanGan hyperparameters (vangan.py:25-34) ---
    lambda_cycle: float = 10.0
    lambda_identity: float = 5.0
    lambda_reconstruction: float = 5.0
    lambda_topology: float = 5.0
    gen_i2s: str = "resUnet"  # 'resnet' | 'vnet' | 'resUnet'
    gen_s2i: str = "resUnet"
    semi_supervised: bool = False
    wasserstein: bool = False
    ncritic: int = 5
    gp_weight: float = 10.0
    # ravel each network's Adam moments into one vector (optax.flatten):
    # identical math, ~6 ops instead of ~600 in the update (see
    # training/optimizers.py). Changes the optimizer-state checkpoint
    # layout; set False to restore pre-change optimizer states.
    flatten_opt: bool = True

    # --- loss details (loss_functions.py / clDice_func.py defaults) ---
    cldice_iters: int = 15  # clDice_func.py:122
    cldice_alpha: float = 0.5
    cycle_loss_I_type: str = "bce"  # vangan.py:302 (seg cycle)
    cycle_loss_S_type: str = "mse"  # vangan.py:306 (imaging cycle)
    # identity loss: present-but-commented in the reference (vangan.py:310-312,
    # README.md:21 "No identity loss"). Off by default = reference parity;
    # when on, each term trains its OWN generator (see training/step.py note
    # on the reference's swapped routing, which would be gradient-dead).
    use_identity_loss: bool = False
    identity_loss_IS_type: str = "cldice"  # gen_IS(real_S) term (vangan.py:312)
    identity_loss_SI_type: str = "mae"  # gen_SI(real_I) term (vangan.py:311)
    layer_noise: float = 0.1  # vangan.py:76

    # --- data pipeline (dataset.py:48-49) ---
    IMAGE_THRESH: float = 0.5
    SEG_THRESH: float = 0.8
    REJECTION_MAX_TRIES: int = 200  # dataset.py:235

    # --- steps (computed from partitions in the reference, main.py:189-193) ---
    train_steps: Optional[int] = None
    val_steps: Optional[int] = None

    # --- model width (reference defaults; reducible for dry runs/tests) ---
    gen_filters: int = 16  # vangan.py:119,159 / resunet_model.py:209
    disc_filters: int = 64  # vangan.py:171,184

    # --- TPU-native knobs (new; no reference equivalent) ---
    seed: int = 0
    # Gradient accumulation: split each device step into `micro_batches`
    # sequential microbatches (BATCH_SIZE % micro_batches == 0) with
    # device-side grad accumulation and ONE optimizer apply. Peak activation
    # memory drops to one microbatch's (remat can stay off at 128^3), and the
    # optimizer amortises over the batch. Loss semantics: per-sample losses
    # and the axis=None quirk scales are EXACT; clDice is evaluated per
    # micro-shard — the reference's own distributed convention at
    # N_DEVICES x micro_batches replicas (loss_functions.py:226). See
    # training/step.py and parallel.jit_microbatch_step.
    micro_batches: int = 1
    compute_dtype: str = "bfloat16"  # conv compute dtype; params always float32
    # Activation layout: 'NXCYZ' (the TPU layout engine — sublanes=Y, lanes=Z,
    # channels outer; Pallas conv kernels, zero lane padding at any channel
    # count) or 'NXYZC' (channels-last portable fallback). Checkpoints are
    # layout-portable (identical param trees). See docs/PERF.md.
    layout: str = "NXCYZ"
    mesh_axis: str = "data"
    cldice_groups: Optional[int] = None  # derived: N_DEVICES (see losses/vangan_losses.py)
    # fused Pallas soft-skeleton kernels (auto-fallback to XLA off-TPU or for
    # unsupported shapes; ~170x faster fwd / ~60x fwd+bwd on v5e at 128^3)
    use_pallas_skeleton: bool = True
    remat: bool = True  # rematerialise each network application in the backward
    # 'combined': one backward for all four gradients (lowest FLOPs, but its
    # single huge module OOMs the remote compile helper at 128^3 today);
    # 'two_phase': generators then discriminators, barrier-chained — the
    # round-2 default (fits in HBM with the NXCYZ layout and compiles);
    # 'split': two_phase math compiled as THREE separate jit modules
    # (gen-grads / disc-grads / optimizer) — smaller per-module compile,
    # proven state-identical to two_phase (tests/test_train_step.py);
    # 'sequential': four barrier-chained backwards (lowest peak HBM)
    backward_mode: str = "two_phase"
    profile_dir: Optional[str] = None  # jax.profiler trace output (None = off)
    debug_nans: bool = False  # jax_debug_nans (vangan.py:290-292 equivalent)
    plot_dataset_samples: bool = True  # startup sanity panels (dataset.py:113)
    stitcher_batch: int = 8  # patches per device batch in sliding-window inference
    # dtype the stitched x-bands cross the host link in ('uint8' two-pass
    # exact-min-max quantization | 'float16' | 'float32'); the host link is
    # the full-volume inference bottleneck (~5-20 MB/s tunnelled d2h)
    stitcher_stream_dtype: str = "uint8"
    # dtype the input volume crosses the h2d link in ('float16' halves the
    # upload; the generators compute in bf16 regardless; 'int8' halves it
    # again via symmetric absmax quantization + on-device dequant — lossy by
    # <= absmax/254 per input voxel, within one grey level on the uint8
    # output grid — see stitch_subvolumes docs)
    stitcher_upload_dtype: str = "float16"
    # on-device stitcher accumulation (upload volume once, jitted
    # gather/apply/scatter-add scan, one download) vs host numpy loop
    stitcher_device: bool = True
    donate_state: bool = True

    def __post_init__(self) -> None:
        if self.GLOBAL_BATCH_SIZE is None:
            self.GLOBAL_BATCH_SIZE = self.N_DEVICES * self.BATCH_SIZE
        if self.INITIATE_LR_DECAY is None:
            self.INITIATE_LR_DECAY = 0.5 * self.EPOCHS
        if self.NO_NOISE is None:
            self.NO_NOISE = self.EPOCHS
        if self.cldice_groups is None:
            self.cldice_groups = self.N_DEVICES
        if self.micro_batches > 1 and self.BATCH_SIZE % self.micro_batches:
            raise ValueError(
                f"micro_batches ({self.micro_batches}) must divide "
                f"BATCH_SIZE ({self.BATCH_SIZE})"
            )
        self.RAW_IMG_SIZE = tuple(self.RAW_IMG_SIZE)
        self.TARG_RAW_IMG_SIZE = tuple(self.TARG_RAW_IMG_SIZE)
        self.SYNTH_IMG_SIZE = tuple(self.SYNTH_IMG_SIZE)
        self.TARG_SYNTH_IMG_SIZE = tuple(self.TARG_SYNTH_IMG_SIZE)
        self.SUBVOL_PATCH_SIZE = tuple(self.SUBVOL_PATCH_SIZE)

    # --- derived geometry (main.py:87-101) ---
    @property
    def INPUT_IMG_SIZE(self) -> Tuple[int, ...]:
        if self.DIMENSIONS == 2:
            return (self.GLOBAL_BATCH_SIZE, self.SUBVOL_PATCH_SIZE[0], self.SUBVOL_PATCH_SIZE[1], 1)
        return (
            self.GLOBAL_BATCH_SIZE,
            self.SUBVOL_PATCH_SIZE[0],
            self.SUBVOL_PATCH_SIZE[1],
            self.SUBVOL_PATCH_SIZE[2],
            1,
        )

    @property
    def subvol_patch_shape(self) -> Tuple[int, ...]:
        """Per-sample imaging-domain patch shape incl. channels (vangan.py:53-54)."""
        if self.DIMENSIONS == 2:
            return (*self.SUBVOL_PATCH_SIZE[:2], self.CHANNELS)
        return (*self.SUBVOL_PATCH_SIZE[:3], self.CHANNELS)

    @property
    def seg_subvol_patch_shape(self) -> Tuple[int, ...]:
        """Per-sample segmentation-domain patch shape (vangan.py:55-56)."""
        if self.DIMENSIONS == 2:
            return (*self.SUBVOL_PATCH_SIZE[:2], 1)
        return (*self.SUBVOL_PATCH_SIZE[:3], 1)

    def decay_start_step(self, steps_per_epoch: int) -> int:
        return int(self.INITIATE_LR_DECAY * steps_per_epoch)

    def total_steps(self, steps_per_epoch: int) -> int:
        return int(self.EPOCHS * steps_per_epoch)

    def noise_std_at_epoch(self, epoch: int) -> float:
        """σ(epoch) for discriminator Gaussian noise (custom_callback.py:399-424).

        Linear decay from ``layer_noise`` to 0 at epoch NO_NOISE; clamped at 0.
        """
        decay_rate = 1.0 if self.NO_NOISE == 0 else epoch / self.NO_NOISE
        return max(0.0, self.layer_noise * (1.0 - decay_rate))

    # --- serialization ---
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "VanGanConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            if _HAS_YAML:
                yaml.safe_dump(self.to_dict(), f, sort_keys=False)
            else:  # pragma: no cover
                json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_yaml(cls, path: str) -> "VanGanConfig":
        with open(path) as f:
            if _HAS_YAML:
                d = yaml.safe_load(f)
            else:  # pragma: no cover
                d = json.load(f)
        return cls.from_dict(d)


def save_args(cfg, filename: str) -> None:
    """Dump all config fields to a text file (utils.py:396-409 `Args_Settings.txt` parity)."""

    def format_value(value):
        if isinstance(value, (tuple, list)):
            return f"({', '.join(map(str, value))})"
        return str(value)

    if dataclasses.is_dataclass(cfg):
        items = dataclasses.asdict(cfg).items()
    else:  # argparse.Namespace-style attribute bag
        items = {k: v for k, v in vars(cfg).items() if not k.startswith("_")}.items()
    with open(filename, "w") as f:
        f.write("Command line arguments:\n")
        for arg, value in items:
            f.write(f"{arg}: {format_value(value)}\n")
        # runtime env toggles that shape the compiled program (reproducibility)
        for env in ("VANGAN_CONV_DB", "VANGAN_CONV_STACK",
                    "VANGAN_CONV_YB_MAX", "VANGAN_INSTNORM_BLOCK_KIB"):
            if env in os.environ:
                f.write(f"env {env}: {os.environ[env]}\n")
