"""Benchmark: CycleGAN 128^3-patch train-step throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The tracked metric (BASELINE.json) is 128^3 patches/sec/chip for the full
VAN-GAN train step (dual ResU-Net generators + dual PatchGAN discriminators,
cycle + clDice + SSIM + LSGAN losses, all four optimizers).

Baseline: the reference repo publishes no numbers (BASELINE.md). The
comparison constant below is an engineering estimate of the TF-2.10 reference
on its documented hardware (4x CUDA GPU, global batch 12, main.py:22,71-72):
3-D CycleGAN steps of this size run ~2-4 s on a V100-class GPU, i.e. ~1
patch/sec/GPU. vs_baseline = measured / REF_PATCHES_PER_SEC_PER_CHIP; the
north-star is vs_baseline >= 10 (BASELINE.json:5,11).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PATCHES_PER_SEC_PER_CHIP = 1.0  # estimated TF-GPU reference (see docstring)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator
    from vangan_tpu.parallel import jit_train_step, make_mesh, put_batch, put_replicated
    from vangan_tpu.training.step import make_step_fns

    n_devices = len(jax.devices())

    def build(batch_per_chip: int):
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
        real_I = put_batch(
            jnp.asarray(rng.normal(size=(gb, 128, 128, 128, 1)), jnp.float32), mesh
        )
        real_S = put_batch(
            jnp.asarray((rng.uniform(size=(gb, 128, 128, 128, 1)) > 0.8) * 2.0 - 1.0,
                        jnp.float32),
            mesh,
        )
        step = jit_train_step(fns, mesh, donate=True, axis_name=cfg.mesh_axis)
        return cfg, state, step, real_I, real_S

    last_err = None
    for batch in (3, 2, 1):
        try:
            cfg, state, step, real_I, real_S = build(batch)
            noise = jnp.asarray(0.1, jnp.float32)
            upd = jnp.asarray(True)
            key = jax.random.PRNGKey(1)
            # warmup (compile + 1 steady step)
            for _ in range(2):
                state, result = step(state, real_I, real_S, key, noise, upd)
            jax.block_until_ready(result)
            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, result = step(state, real_I, real_S, key, noise, upd)
            jax.block_until_ready(result)
            dt = time.perf_counter() - t0
            patches_per_sec_per_chip = cfg.GLOBAL_BATCH_SIZE * n_steps / dt / n_devices
            print(
                json.dumps(
                    {
                        "metric": "cyclegan_128cube_train_patches_per_sec_per_chip",
                        "value": round(patches_per_sec_per_chip, 4),
                        "unit": "patches/s/chip",
                        "vs_baseline": round(
                            patches_per_sec_per_chip / REF_PATCHES_PER_SEC_PER_CHIP, 4
                        ),
                    }
                )
            )
            return
        except Exception as e:  # OOM etc. -> retry smaller batch
            last_err = e
            continue
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
