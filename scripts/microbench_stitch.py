"""Decompose full-volume stitch time (bench.py --inference) into its parts.

Times, via scalar host fetches (block_until_ready is a no-op on the tunnelled
platform): (a) the bare generator forward at the stitcher batch, (b) one
accumulation chunk (gather -> generator -> scatter-add scan), (c) the final
on-device divide + host download. Prints ms per stage and the implied
Mvoxels/s budget so the gap to the measured bench number is attributable.

Usage (one TPU job at a time):  python scripts/microbench_stitch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vangan_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vangan_tpu.config import VanGanConfig
from vangan_tpu.inference import stitcher as st
from vangan_tpu.models.factory import build_generator


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = VanGanConfig(N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(128, 128, 128),
                       output_dir="/tmp/vg_bench")
    model = build_generator(cfg.gen_i2s, cfg, role="i2s")
    rng = np.random.default_rng(0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 128, 128, 128, 1), np.float32), train=False)

    batch = cfg.stitcher_batch
    x = jnp.asarray(rng.normal(size=(batch, 128, 128, 128, 1)), jnp.float32)

    apply_jit = jax.jit(lambda v, p: model.apply(v, p, train=False))
    fetch(apply_jit(variables, x))  # compile
    fetch(apply_jit(variables, x))
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = apply_jit(variables, x)
    fetch(y)
    t_fwd = (time.perf_counter() - t0) / iters * 1e3
    print(f"generator fwd batch={batch}: {t_fwd:.1f} ms "
          f"({t_fwd / batch:.1f} ms/patch)")

    # one chunk: steps_per_call=24 batches of `batch` patches into 720^3 buffers
    vol = rng.normal(size=(720, 720, 720, 1)).astype(np.float32)
    img_d = jnp.asarray(vol)
    token = st._register_apply(lambda v, p: model.apply(v, p, train=False))
    fn = st._device_stitch_fn((128, 128, 128), (0, 0, 0), batch, False, True, token)
    steps = 24
    origins = rng.integers(0, 720 - 128, size=(steps, batch, 3)).astype(np.int32)
    valid = np.ones((steps, batch), np.float32)
    pred = jnp.zeros(img_d.shape, jnp.float32)
    count = jnp.zeros(img_d.shape, jnp.float32)
    pred, count = fn(pred, count, variables, img_d, jnp.asarray(origins),
                     jnp.asarray(valid))  # compile
    fetch(count)
    t0 = time.perf_counter()
    pred, count = fn(pred, count, variables, img_d, jnp.asarray(origins),
                     jnp.asarray(valid))
    fetch(count)
    t_chunk = (time.perf_counter() - t0) * 1e3
    n_p = steps * batch
    print(f"one chunk ({steps} steps x {batch}): {t_chunk:.0f} ms "
          f"({t_chunk / n_p:.1f} ms/patch; fwd alone predicts "
          f"{t_fwd * steps / n_p:.1f})")

    t0 = time.perf_counter()
    out = np.asarray(st._device_divide_fn()(pred, count), np.float32)
    t_div = (time.perf_counter() - t0) * 1e3
    print(f"divide + download 720^3 f32: {t_div:.0f} ms")

    # implied full-run budget at stride 64 on 600^3 (1331 patches, 7 chunks)
    n_patches, n_chunks = 1331, int(np.ceil(1331 / (steps * batch)))
    est = n_patches * (t_chunk / n_p) / 1e3 + t_div / 1e3
    print(f"implied 600^3 run: {est:.0f} s -> {600**3 / est / 1e6:.2f} Mvox/s "
          f"({n_chunks} chunks)")
    assert np.isfinite(out).any()


if __name__ == "__main__":
    main()
