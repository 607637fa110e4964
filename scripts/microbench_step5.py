"""Round-5 step decomposition at the bench batch-1 config (two_phase, remat
OFF, flattened optimizer).

Times, scalar-fetch bounded (block_until_ready does not synchronise on this
tunnelled platform — docs/PERF.md): the loss forward, each split-module
gradient group, the optimizer apply alone, and the full two_phase train step
— so the current 1.66 patches/s (≈600 ms) step is attributable piece by
piece after the round-5 optax.flatten change.

Usage (one TPU job at a time):  python scripts/microbench_step5.py
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
from vangan_tpu.models.factory import build_discriminator, build_generator
from vangan_tpu.parallel import jit_train_step, make_mesh, put_batch, put_replicated
from vangan_tpu.training.step import make_step_fns


def timed(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = VanGanConfig(
        N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(128, 128, 128),
        compute_dtype="bfloat16", backward_mode="two_phase", remat=False,
        output_dir="/tmp/vg_bench",
    )
    models = {
        "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
        "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
        "disc_I": build_discriminator(cfg),
        "disc_S": build_discriminator(cfg),
    }
    fns = make_step_fns(cfg, models, steps_per_epoch=100)
    mesh = make_mesh(1, cfg.mesh_axis)
    state = put_replicated(fns.init(jax.random.PRNGKey(0)), mesh)
    rng = np.random.default_rng(0)
    real_I = put_batch(jnp.asarray(rng.normal(size=(1, 128, 128, 128, 1)), jnp.float32), mesh)
    real_S = put_batch(
        jnp.asarray((rng.uniform(size=(1, 128, 128, 128, 1)) > 0.8) * 2.0 - 1.0, jnp.float32),
        mesh)
    key = jax.random.PRNGKey(1)
    noise = jnp.asarray(0.1, jnp.float32)
    step_i = jnp.zeros((), jnp.int32)

    @jax.jit
    def loss_fwd(params, mstate, key):
        loss, aux = fns.compute_losses(params, mstate, real_I, real_S, key, noise,
                                       True, None)
        return loss

    t = timed(loss_fwd, state.params, state.model_state, key)
    print(f"loss forward (train, remat off): {t:.1f} ms", flush=True)

    g1 = jax.jit(fns.grad_gens)
    t = timed(lambda: g1(state.params, state.model_state, step_i, real_I, real_S,
                         key, noise))
    print(f"grad_gens module (fwd + gen backward): {t:.1f} ms", flush=True)
    gg, res, ms, fakes = g1(state.params, state.model_state, step_i, real_I, real_S,
                            key, noise)

    g2 = jax.jit(fns.grad_discs)
    t = timed(lambda: g2(state.params, state.model_state, step_i, real_I, real_S,
                         key, noise))
    print(f"grad_discs module RECOMPUTING fakes: {t:.1f} ms", flush=True)
    t = timed(lambda: g2(state.params, state.model_state, step_i, real_I, real_S,
                         key, noise, fakes))
    print(f"grad_discs module with fakes passed in: {t:.1f} ms", flush=True)
    gd = g2(state.params, state.model_state, step_i, real_I, real_S, key, noise, fakes)

    grads = {**gg, **gd}
    upd = jnp.asarray(True)
    app = jax.jit(fns.apply_grads)
    t = timed(lambda: app(state, grads, ms, upd))
    print(f"apply_grads (4x Adam flat + clip + gate): {t:.1f} ms", flush=True)

    step = jit_train_step(fns, mesh, donate=False, axis_name=cfg.mesh_axis)
    new_state, result = step(state, real_I, real_S, key, noise, upd)
    float(result["total_IS_loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        new_state, result = step(state, real_I, real_S, key, noise, upd)
    float(result["total_IS_loss"])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"full two_phase train step: {dt:.1f} ms = {1000/dt:.3f} patches/s", flush=True)


if __name__ == "__main__":
    main()
