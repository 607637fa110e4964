"""Host input-pipeline feed rate (VERDICT r4 weak #4 measurement).

Measures VanGanDataset's sustained batches/s at the reference geometry
(128^3 crops of 256x256x128 volumes; rejection-sampled seg crops) for
several DATA_WORKERS settings, so docs/PERF.md can state whether the host
can feed the chip (device step times: ~0.62 s at batch 1/chip; the
reference's global batch 12 needs 12+12 crops per step).

Host-only (JAX never imported). Usage:
  python scripts/microbench_feed.py [--gb 12] [--batches 8] [--workers 1 2 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vangan_tpu.config import VanGanConfig
from vangan_tpu.data.pipeline import VanGanDataset


def make_volumes(root: str, n: int, shape=(256, 256, 128), seg=False, seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        if seg:
            # sparse tubes-ish foreground so the >=0.8 rejection loop does
            # real work (dense uniform noise would accept every crop)
            v = np.full(shape, -1.0, np.float32)
            for _ in range(40):
                x, y = rng.integers(0, shape[0] - 8), rng.integers(0, shape[1] - 8)
                v[x : x + 4, y : y + 4, :] = 1.0
        else:
            v = rng.normal(size=shape).astype(np.float32)
        p = os.path.join(root, f"vol{i}.npy")
        np.save(p, v[..., None])
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=int, default=12)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--vols", type=int, default=4)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="vg_feed_")
    img = make_volumes(os.path.join(tmp, "img"), args.vols, seed=1)
    seg = make_volumes(os.path.join(tmp, "seg"), args.vols, seg=True, seed=2)

    for w in args.workers:
        cfg = VanGanConfig(N_DEVICES=1, BATCH_SIZE=args.gb, DATA_WORKERS=w,
                           SUBVOL_PATCH_SIZE=(128, 128, 128),
                           output_dir=os.path.join(tmp, "out"))
        ds = VanGanDataset(cfg, {"training": img, "validation": img},
                           {"training": seg, "validation": seg}, seed=0)
        it = ds.train_batches(prefetch=2)
        next(it)  # warm: open mmaps, fill the first buffer
        t0 = time.time()
        for _ in range(args.batches):
            real_I, real_S = next(it)
        dt = time.time() - t0
        ds.close()
        bps = args.batches / dt
        print(json.dumps({
            "workers": w, "global_batch": args.gb,
            "batches_per_s": round(bps, 3),
            "samples_per_s": round(bps * args.gb * 2, 2),
            "MB_per_s": round(bps * args.gb * 2 * 128**3 * 4 / 1e6, 1),
            "host_cores": os.cpu_count(),
        }), flush=True)


if __name__ == "__main__":
    main()
