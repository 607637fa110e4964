"""Benchmark: CycleGAN 128^3-patch train-step throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The tracked metric (BASELINE.json) is 128^3 patches/sec/chip for the full
VAN-GAN train step (dual ResU-Net generators + dual PatchGAN discriminators,
cycle + clDice + SSIM + LSGAN losses, all four optimizers, bf16 compute,
fused Pallas clDice kernels, per-network remat).

Batch sizes are probed 3 -> 2 -> 1, each in a FRESH subprocess: a TPU compile
OOM can poison the remote-compile service state for subsequent programs in the
same process.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
comparison constant below is an engineering estimate of the TF-2.10 reference
on its documented hardware (4x CUDA GPU, global batch 12, main.py:22,71-72):
3-D CycleGAN steps of this size run ~2-4 s on a V100-class GPU, i.e. ~1
patch/sec/GPU. vs_baseline = measured / REF_PATCHES_PER_SEC_PER_CHIP; the
north-star is vs_baseline >= 10 (BASELINE.json:5,11).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PATCHES_PER_SEC_PER_CHIP = 1.0  # estimated TF-GPU reference (see docstring)


def run_one(batch_per_chip: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vangan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator
    from vangan_tpu.parallel import jit_train_step, make_mesh, put_batch, put_replicated
    from vangan_tpu.training.step import make_step_fns

    n_devices = len(jax.devices())
    cfg = VanGanConfig(
        N_DEVICES=n_devices,
        BATCH_SIZE=batch_per_chip,
        SUBVOL_PATCH_SIZE=(128, 128, 128),
        compute_dtype="bfloat16",
        output_dir="/tmp/vg_bench",
    )
    models = {
        "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
        "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
        "disc_I": build_discriminator(cfg),
        "disc_S": build_discriminator(cfg),
    }
    fns = make_step_fns(cfg, models, steps_per_epoch=100)
    mesh = make_mesh(n_devices, cfg.mesh_axis)
    state = put_replicated(fns.init(jax.random.PRNGKey(0)), mesh)
    rng = np.random.default_rng(0)
    gb = cfg.GLOBAL_BATCH_SIZE
    real_I = put_batch(jnp.asarray(rng.normal(size=(gb, 128, 128, 128, 1)), jnp.float32), mesh)
    real_S = put_batch(
        jnp.asarray((rng.uniform(size=(gb, 128, 128, 128, 1)) > 0.8) * 2.0 - 1.0, jnp.float32),
        mesh,
    )
    step = jit_train_step(fns, mesh, donate=True, axis_name=cfg.mesh_axis)
    noise = jnp.asarray(0.1, jnp.float32)
    upd = jnp.asarray(True)
    key = jax.random.PRNGKey(1)
    for _ in range(2):  # compile + steady warmup
        state, result = step(state, real_I, real_S, key, noise, upd)
    # NOTE: block_until_ready does not synchronise on this remote TPU
    # platform; a host fetch does. The steps chain through the donated state,
    # so one final fetch bounds the whole timed sequence.
    float(result["total_IS_loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, result = step(state, real_I, real_S, key, noise, upd)
    float(result["total_IS_loss"])
    dt = time.perf_counter() - t0
    patches_per_sec_per_chip = gb * n_steps / dt / n_devices
    print(
        json.dumps(
            {
                "metric": "cyclegan_128cube_train_patches_per_sec_per_chip",
                "value": round(patches_per_sec_per_chip, 4),
                "unit": "patches/s/chip",
                "vs_baseline": round(patches_per_sec_per_chip / REF_PATCHES_PER_SEC_PER_CHIP, 4),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--batch":
        run_one(int(sys.argv[2]))
        return
    # batch 3 first (wins if future memory work lands), then 1 (today's fit);
    # batch 2 skipped — it has never been the winner and each failed probe
    # costs a full ~8 min TPU compile through the tunnel
    for batch in (3, 1):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch", str(batch)],
            capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        sys.stderr.write(
            f"[bench] batch {batch} failed (rc={proc.returncode}); "
            f"stderr tail: {proc.stderr[-500:]}\n"
        )
    raise SystemExit("bench failed at all batch sizes")


if __name__ == "__main__":
    main()
