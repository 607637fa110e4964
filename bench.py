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
        # batch 3's monolithic module OOMs the remote compile helper; the
        # split step (three modules, state-identical math) compiles
        backward_mode="split" if batch_per_chip >= 3 else "two_phase",
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
    if cfg.backward_mode == "split":
        from vangan_tpu.parallel import jit_split_step

        step = jit_split_step(fns, mesh, donate=True, axis_name=cfg.mesh_axis)
    else:
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


def run_inference() -> None:
    """BASELINE config 3: sliding-window inference on a full ~600^3 volume
    with Gaussian overlap blending, on-device accumulation. Prints one JSON
    line with Mvoxels/sec (output voxels per second of wall time)."""
    import time as _time

    import jax
    import numpy as np

    from vangan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.inference.stitcher import stitch_subvolumes
    from vangan_tpu.models.factory import build_generator

    cfg = VanGanConfig(N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(128, 128, 128),
                       output_dir="/tmp/vg_bench")
    model = build_generator(cfg.gen_i2s, cfg, role="i2s")
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(600, 600, 600, 1)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 128, 128, 128, 1), np.float32), train=False)

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    kw = dict(subvol_size=(1, 128, 128, 128, 1), stride=(64, 64, 64), complete=True,
              padFactor=0.1, save=False, batch_size=cfg.stitcher_batch, blend="gaussian",
              device_apply=(apply_fn, variables))
    # warm-up/compile on a small volume with the same patch/batch config
    stitch_subvolumes(None, vol[:160, :160, :160], **kw)
    t0 = _time.perf_counter()
    out = stitch_subvolumes(None, vol, **kw)
    dt = _time.perf_counter() - t0
    mvox = out.size / dt / 1e6
    print(json.dumps({
        "metric": "fullvol_600cube_gaussian_stitch_Mvoxels_per_sec",
        "value": round(mvox, 2), "unit": "Mvoxels/s",
        "vs_baseline": round(mvox / 1.0, 2),
    }))


def run_selftest() -> int:
    """Run the on-chip Pallas parity tests (VERDICT round-1 weak #6) so every
    bench round re-validates kernel correctness on real hardware."""
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas_tpu.py", "-q",
         "--no-header", "-x"],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env={**os.environ, "JAX_PLATFORMS": "", "VANGAN_TPU_TESTS": "1"},
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "?"
    sys.stderr.write(f"[bench selftest] rc={proc.returncode}: {tail}\n")
    return proc.returncode


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--batch":
        run_one(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--inference":
        run_inference()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        raise SystemExit(run_selftest())

    run_selftest()  # on-chip kernel parity gate (failure is logged, not fatal)

    # probe both per-chip batch sizes (kernels are per-sample latency-bound
    # today, so batch 1 currently wins; batch 3 runs via the split step) and
    # report the best; batch 2 skipped — never the winner
    results = []
    for batch in (1, 3):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch", str(batch)],
            capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                results.append(json.loads(line))
                break
        else:
            sys.stderr.write(
                f"[bench] batch {batch} failed (rc={proc.returncode}); "
                f"stderr tail: {proc.stderr[-500:]}\n"
            )
    if not results:
        raise SystemExit("bench failed at all batch sizes")
    print(json.dumps(max(results, key=lambda r: r["value"])))

    # secondary metric (BASELINE config 3); failure must not mask the primary
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inference"],
            capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[bench] inference bench failed: {e}\n")


if __name__ == "__main__":
    main()
