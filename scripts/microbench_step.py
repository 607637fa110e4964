"""Step-level decomposition of the 128^3 batch-1 train step (bench.py primary).

Times, scalar-fetch bounded: each model's forward alone, the full loss
forward, the loss forward+backward (grads), and the optimizer apply — so the
gap between per-kernel microbenches and the ~840 ms step is attributable.

Usage (one TPU job at a time):  python scripts/microbench_step.py
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
from vangan_tpu.training.step import make_step_fns


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).astype(jnp.float32).sum()),
                           jax.tree_util.tree_leaves(out)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = VanGanConfig(
        N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(128, 128, 128),
        compute_dtype="bfloat16", backward_mode="two_phase", output_dir="/tmp/vg_bench",
    )
    models = {
        "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
        "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
        "disc_I": build_discriminator(cfg),
        "disc_S": build_discriminator(cfg),
    }
    fns = make_step_fns(cfg, models, steps_per_epoch=100)
    state = fns.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    real_I = jnp.asarray(rng.normal(size=(1, 128, 128, 128, 1)), jnp.float32)
    real_S = jnp.asarray((rng.uniform(size=(1, 128, 128, 128, 1)) > 0.8) * 2.0 - 1.0,
                         jnp.float32)
    key = jax.random.PRNGKey(1)
    noise = jnp.asarray(0.1, jnp.float32)

    # individual forwards (train=False: no dropout/noise rngs needed)
    gen = models["gen_IS"]
    gv = {"params": state.params["gen_IS"]}
    t = timed(jax.jit(lambda v, x: gen.apply(v, x, train=False)), gv, real_I)
    print(f"ResU-Net fwd (inference): {t:.1f} ms")

    disc = models["disc_I"]
    dv = {"params": state.params["disc_I"]}
    t = timed(jax.jit(lambda v, x: disc.apply(v, x, train=False)), dv, real_I)
    print(f"PatchGAN fwd (inference): {t:.1f} ms")

    # full loss forward (exactly what the step differentiates)
    @jax.jit
    def loss_fwd(params, mstate, key):
        loss, aux = fns.compute_losses(params, mstate, real_I, real_S, key, noise,
                                       True, None)
        return loss

    t = timed(loss_fwd, state.params, state.model_state, key)
    print(f"full loss forward: {t:.1f} ms")

    # forward + backward (no optimizer). Return the SUM over every grad leaf:
    # returning a single leaf lets XLA dead-code-eliminate the other loss
    # branches entirely (measured 102 ms vs the 195 ms bare forward).
    @jax.jit
    def loss_bwd(params, mstate, key):
        grads, aux = jax.grad(fns.compute_losses, argnums=0, has_aux=True)(
            params, mstate, real_I, real_S, key, noise, True, None)
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))

    t_bwd = timed(loss_bwd, state.params, state.model_state, key)
    print(f"loss forward+backward (all grads): {t_bwd:.1f} ms")
    print("full train step: see bench.py --batch 1 (the monolithic re-jit "
          "here tends to OOM the remote compile helper)")


if __name__ == "__main__":
    main()
