"""Offline preprocessing: TIFF -> normalised .npy volumes + dataset partitions.

Host-side equivalent of the reference's ``DataPreprocessor``
(preprocessing.py:14-230): per-domain TIFF ingestion, 72/18/10
train/val/test split, Lanczos resize, min-max normalisation to [-1, 1],
segmentation binarisation with polarity fix, NaN guarding, and pickled
partition manifests. Work is fanned out over processes.

Differences from the reference (documented):
- the segmentation-domain behaviour is selected by an explicit
  ``domain='segmentation'`` flag instead of the magic ``partition_id == 'S'``
  string match (preprocessing.py:175-189 — with ids 'A'/'B' used by main.py
  the reference's binarisation branch silently never runs);
- TIFF I/O via imageio (no skimage dependency in this image).
"""

from __future__ import annotations

import os
import pickle
import random
import shutil
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    import imageio.v3 as iio

    _HAS_IMAGEIO = True
except Exception:  # pragma: no cover
    _HAS_IMAGEIO = False

from vangan_tpu.ops.norms import min_max_norm_np


def check_nan(arr: np.ndarray) -> bool:
    """True if any NaN present (utils.py:136-146)."""
    return bool(np.any(np.isnan(arr)))


def read_tiff(path: str) -> np.ndarray:
    """Read a (multi-page) TIFF as float32, page-major (z, y, x) like skimage."""
    if not _HAS_IMAGEIO:  # pragma: no cover
        raise RuntimeError("imageio is required for TIFF I/O")
    return np.asarray(iio.imread(path)).astype("float32")


def write_tiff(path: str, arr: np.ndarray) -> None:
    if not _HAS_IMAGEIO:  # pragma: no cover
        raise RuntimeError("imageio is required for TIFF I/O")
    iio.imwrite(path, arr)


def resize_volume(img: np.ndarray, target_size: Sequence[int]) -> np.ndarray:
    """Two-pass slice-wise Lanczos4 3-D resize (utils.py:224-255 semantics).

    Pass 1 resizes each z-slice to (target_x, target_y); pass 2 resizes each
    x-slice to (target_y, target_z). Skips pass 1 when XY already matches.
    """
    if not _HAS_CV2:  # pragma: no cover
        raise RuntimeError("cv2 is required for Lanczos volume resize")
    tx, ty, tz = target_size[0], target_size[1], target_size[2]
    if tuple(img.shape[0:2]) != (tx, ty):
        arr1 = np.empty([tx, ty, img.shape[2]], dtype="float32")
        for i in range(img.shape[2]):
            arr1[:, :, i] = cv2.resize(img[:, :, i], (ty, tx), interpolation=cv2.INTER_LANCZOS4)
    else:
        arr1 = img.astype("float32")
    arr2 = np.empty([tx, ty, tz], dtype="float32")
    for i in range(tx):
        arr2[i, :, :] = cv2.resize(arr1[i], (tz, ty), interpolation=cv2.INTER_LANCZOS4)
    return arr2


def _process_one(task: Tuple) -> Optional[str]:
    """Worker: process one TIFF into an .npy volume. Returns filename on NaN skip."""
    (raw_path, file, out_dir, dimensions, domain, tiff_size, target_size, do_resize,
     preprocess_fn, save_filtered, filtered_dir) = task
    stack = read_tiff(os.path.join(raw_path, file))
    base, _ = os.path.splitext(file)

    if dimensions == 3:
        # (z, y, x) -> (x-major spatial, z last) like preprocessing.py:164-165
        stack = np.transpose(stack, (1, 2, 0))

    if preprocess_fn is not None:
        stack = preprocess_fn(stack)

    if do_resize and tuple(tiff_size)[:3] != tuple(target_size)[:3]:
        stack = resize_volume(stack, target_size).astype("float32")
        if domain == "segmentation":
            stack = np.clip(stack, 0.0, 255.0)  # preprocessing.py:175-177

    stack = min_max_norm_np(stack)
    if domain == "segmentation":
        # polarity fix: if background (mode) is 1, invert (preprocessing.py:180-184)
        values, counts = np.unique(stack, return_counts=True)
        mode = values[np.argmax(counts)]
        if mode == 1:
            stack = np.abs(stack - 1.0)
    stack = (stack - 0.5) / 0.5  # [0,1] -> [-1,1]
    if domain == "segmentation":
        stack = np.where(stack < 0.0, -1.0, 1.0).astype("float32")  # preprocessing.py:187-189

    if check_nan(stack):
        return file  # skipped (preprocessing.py:214-215)
    if save_filtered and filtered_dir:
        # filtered uint8 TIFF dump for visual QA (preprocessing.py:193-203)
        os.makedirs(filtered_dir, exist_ok=True)
        arr8 = (np.transpose(stack, (2, 1, 0)) * 127.5 + 127.5).astype("uint8")
        write_tiff(os.path.join(filtered_dir, base + ".tiff"), arr8)
    np.save(os.path.join(out_dir, base), np.expand_dims(stack, axis=dimensions))
    return None


class DataPreprocessor:
    """Per-domain offline preprocessor (preprocessing.py:14 API surface)."""

    def __init__(
        self,
        args=None,
        raw_path: Optional[str] = None,
        main_dir: Optional[str] = None,
        partition_id: str = "",
        partition_filename: Optional[str] = None,
        tiff_size: Sequence[int] = (600, 600, 700),
        target_size: Sequence[int] = (600, 600, 700),
        domain: str = "imaging",  # 'imaging' | 'segmentation'
        num_workers: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.raw_path = raw_path
        self.main_dir = main_dir
        self.partition_id = partition_id
        self.partition_filename = partition_filename
        self.tiff_size = tuple(tiff_size)
        self.target_size = tuple(target_size)
        self.domain = domain
        self.partition: dict = {}
        self.seed = seed
        self.NUM_WORKERS = num_workers or max(1, int(0.8 * (os.cpu_count() or 2) - 1))
        self.DIMENSIONS = getattr(args, "DIMENSIONS", 3) if args is not None else 3
        self.CHANNELS = getattr(args, "CHANNELS", 1) if args is not None else 1

    # --- partition management (preprocessing.py:38-108) ---

    def split_dataset(self) -> None:
        """Shuffle and split raw files 72/18/10 (0.9 then 0.8 splits)."""
        files = sorted(os.listdir(self.raw_path))
        rng = random.Random(self.seed)
        rng.shuffle(files)
        train_files, test_files = np.split(np.asarray(files, dtype=object), [int(len(files) * 0.9)])
        train_files, validate_files = np.split(train_files, [int(len(train_files) * 0.8)])
        self.partition = {
            "training": train_files,
            "validation": validate_files,
            "testing": test_files,
        }

    def save_partition(self, save_path: Optional[str] = None) -> None:
        """Rewrite partition entries as .npy paths under train/val/test dirs and pickle."""
        if save_path is None:
            raise ValueError("Partition save_path is not provided.")
        subdir = {"training": "train", "validation": "val", "testing": "test"}
        new_partition = {}
        for split, files in self.partition.items():
            arr = np.empty(len(files), dtype=object)
            for i, f in enumerate(files):
                base, _ = os.path.splitext(os.path.basename(str(f)))
                arr[i] = os.path.join(save_path, subdir[split] + self.partition_id, base + ".npy")
            new_partition[split] = arr
        with open(os.path.join(save_path, self.partition_filename), "wb") as f:
            pickle.dump(new_partition, f)
        self.partition = new_partition

    def load_partition(self, file_path: str) -> None:
        print(f"*** Loading Dataset {self.partition_id} Partition ***")
        with open(file_path, "rb") as f:
            self.partition = pickle.load(f)

    def move_dataset(self) -> None:
        """Move raw files into train/val/test directories (preprocessing.py:110-119)."""
        subdir = {"training": "train", "validation": "val", "testing": "test"}
        for split, files in self.partition.items():
            for f in files:
                shutil.move(
                    os.path.join(self.raw_path, str(f)),
                    os.path.join(self.main_dir, subdir[split] + self.partition_id),
                )

    # --- processing (preprocessing.py:121-215) ---

    def preprocess(
        self,
        preprocess_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        resize: bool = False,
        save_filtered: bool = False,
    ) -> None:
        """Split + process every partition in parallel, then save the manifest."""
        print(f"*** Preprocessing partition {self.partition_id} images ***")
        self.split_dataset()
        subdir = {"training": "train", "validation": "val", "testing": "test"}
        for split, files in self.partition.items():
            out_dir = os.path.join(self.main_dir, subdir[split] + self.partition_id)
            os.makedirs(out_dir, exist_ok=True)
            filtered = os.path.join(self.main_dir, "filtered", subdir[split] + self.partition_id)
            self._run_parallel(files, out_dir, preprocess_fn, resize, save_filtered, filtered)
        self.save_partition(self.main_dir)

    def _run_parallel(self, files, out_dir, preprocess_fn, resize, save_filtered=False,
                      filtered_dir=None) -> None:
        tasks = [
            (self.raw_path, str(f), out_dir, self.DIMENSIONS, self.domain, self.tiff_size,
             self.target_size, resize, preprocess_fn, save_filtered, filtered_dir)
            for f in files
        ]
        if self.NUM_WORKERS <= 1 or len(tasks) <= 1:
            skipped = [_process_one(t) for t in tasks]
        else:
            with ProcessPoolExecutor(max_workers=self.NUM_WORKERS) as pool:
                skipped = list(pool.map(_process_one, tasks))
        for s in skipped:
            if s is not None:
                print(f"NaN detected, skipped {s} ...")

    def process_new_data(
        self,
        current_path: str,
        new_path: str,
        tiff_size=None,
        target_size=None,
        preprocess_fn=None,
        resize: bool = False,
    ) -> None:
        """Inference-time preprocessing of a directory of TIFFs (preprocessing.py:217-230)."""
        self.raw_path = current_path
        self.main_dir = new_path
        if tiff_size is not None:
            self.tiff_size = tuple(tiff_size)
        if target_size is not None:
            self.target_size = tuple(target_size)
        os.makedirs(new_path, exist_ok=True)
        files = sorted(os.listdir(current_path))
        tasks = [
            (current_path, f, new_path, self.DIMENSIONS, self.domain, self.tiff_size,
             self.target_size, resize, preprocess_fn, False, None)
            for f in files
        ]
        for t in tasks:
            if (skip := _process_one(t)) is not None:
                print(f"NaN detected, skipped {skip} ...")
