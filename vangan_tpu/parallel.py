"""Device mesh + sharding for data-parallel training.

TPU-native replacement for the reference's ``tf.distribute.MirroredStrategy``
(main.py:22, vangan.py:475-507): a 1-D ``jax.sharding.Mesh`` over the data
axis. The train step is a single jit-compiled global-batch program; GSPMD
shards the batch across devices and inserts the gradient all-reduce
(the NCCL all-reduce implicit in ``optimizer.minimize`` under
``strategy.run``) as XLA collectives over ICI. Parameters and optimizer state
are replicated.

The clDice group reduction (losses/cldice.py:soft_dice_cldice_grouped) aligns
its groups with the device shards, so each group's skeleton pipeline stays
chip-local.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data mesh over the first ``n_devices`` devices (default: all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def put_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard a (global-batch-leading) array pytree across the data axis."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)


def jit_train_step(fns, mesh: Mesh, donate: bool = True, axis_name: str = "data"):
    """Jit the train step with explicit DP shardings.

    in: state (replicated), real_I/real_S (batch-sharded), rng/noise_std/
    update_gen (replicated); out: state replicated, result dict replicated.
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(
        fns.train_step,
        in_shardings=(repl, bsh, bsh, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def jit_microbatch_step(fns, mesh: Mesh, micro: int, donate: bool = True,
                        axis_name: str = "data"):
    """Gradient-accumulation train step (cfg.micro_batches = ``micro`` > 1).

    Each global batch is split into ``micro`` interleaved slices
    (``x[m::micro]`` keeps every slice shard-aligned on the data mesh); the
    split-module grad programs run once per slice at the micro shapes with
    device-side gradient/result accumulation, then ONE optimizer apply.

    Why: at 128^3 the per-network activations of a batch>=2 step do not fit
    HBM without remat (docs/PERF.md round-3) — microbatching keeps the
    measured-best batch-1 remat-off peak while amortising the ~90 ms
    optimizer+schedule tail over the whole batch, and reuses the split
    modules (each stays under the remote compile helper's ceiling).

    Loss semantics: see training/step.py (micro grads are built at per-micro
    scales; summed results reproduce the full-batch loss dict exactly for
    every term except clDice, which evaluates per micro-shard — the
    reference's own distributed convention at N_DEVICES x micro replicas).
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    gsh = (repl, repl, repl, bsh, bsh, repl, repl)
    g1 = jax.jit(fns.grad_gens_micro, in_shardings=gsh,
                 out_shardings=(repl, repl, repl, (bsh, bsh)))
    g2 = jax.jit(fns.grad_discs_micro, in_shardings=(*gsh, (bsh, bsh)),
                 out_shardings=repl)
    acc = jax.jit(
        lambda a, b: jax.tree_util.tree_map(jax.numpy.add, a, b),
        donate_argnums=(0,),
    )
    app = jax.jit(
        fns.apply_grads,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=repl,
        donate_argnums=(0, 1) if donate else (),
    )

    def _avg_leaf(*xs):
        # mutable collections (BatchNorm moving stats): every micro updates
        # from the SAME input state, so averaging the per-micro EMA results
        # averages the per-micro batch statistics — the batch mean is exact
        # (mean of equal-sized micro means) and the variance is the
        # within-micro average, far closer to the full-batch-3 statistics
        # the reference computes than any single micro-slice's. Non-float
        # leaves (none today) keep the first micro's value.
        if jnp.issubdtype(jnp.asarray(xs[0]).dtype, jnp.inexact):
            return sum(xs[1:], start=xs[0]) / len(xs)
        return xs[0]

    avg_ms = jax.jit(lambda *ts: jax.tree_util.tree_map(_avg_leaf, *ts))

    def step(state, real_I, real_S, rng, noise_std, update_gen):
        grads = result = None
        mss = []  # per-micro mutable-collection updates (BN stats: tiny)
        for m in range(micro):
            xI, xS = real_I[m::micro], real_S[m::micro]
            r = jax.random.fold_in(rng, m)
            gg, res, ms, fakes = g1(state.params, state.model_state, state.step,
                                    xI, xS, r, noise_std)
            gd = g2(state.params, state.model_state, state.step, xI, xS, r, noise_std,
                    fakes)
            g = {**gg, **gd}
            mss.append(ms)
            if grads is None:
                grads, result = g, res
            else:
                grads = acc(grads, g)
                result = acc(result, res)
        new_ms = mss[0] if micro == 1 else avg_ms(*mss)
        new_state = app(state, grads, new_ms, update_gen)
        return new_state, result

    return step


def jit_test_step(fns, mesh: Mesh, axis_name: str = "data"):
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(
        fns.test_step,
        in_shardings=(repl, bsh, bsh, repl),
        out_shardings=repl,
    )


def jit_split_step(fns, mesh: Mesh, donate: bool = True, axis_name: str = "data"):
    """Split-module train step: the two backward groups and the optimizer
    update are jitted as three separate XLA modules (backward_mode='split').

    Identical math to the monolithic 'two_phase' step; each module stays
    small enough for the remote compile helper (docs/ROADMAP.md P0.1). The
    returned callable has the train_step signature.
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    gsh = (repl, repl, repl, bsh, bsh, repl, repl)
    # the gens module hands its translated fakes (batch-sharded like the
    # inputs) to the disc module, whose forward then contains only the four
    # discriminator applications (training/step.py compute_losses docstring)
    g1 = jax.jit(fns.grad_gens, in_shardings=gsh,
                 out_shardings=(repl, repl, repl, (bsh, bsh)))
    g2 = jax.jit(fns.grad_discs, in_shardings=(*gsh, (bsh, bsh)), out_shardings=repl)
    app = jax.jit(
        fns.apply_grads,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=repl,
        donate_argnums=(0, 1) if donate else (),
    )

    def step(state, real_I, real_S, rng, noise_std, update_gen):
        gg, result, new_ms, fakes = g1(state.params, state.model_state, state.step,
                                       real_I, real_S, rng, noise_std)
        gd = g2(state.params, state.model_state, state.step,
                real_I, real_S, rng, noise_std, fakes)
        new_state = app(state, {**gg, **gd}, new_ms, update_gen)
        return new_state, result

    return step
