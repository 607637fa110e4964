"""Scoped-vmem ceiling experiment (ROADMAP P1 / round-4 launch-overhead work).

docs/PERF.md round 3: the fused IN+act kernels at the 256 KB blocks forced by
the 16 MB scoped-vmem limit run ~23x over their bandwidth floor (~7 us fixed
cost x ~512 grid steps), and a 1 MB-block variant OOMed scoped vmem INSIDE
jit(train_step) (XLA promoted 4 MB of surrounding buffers into S(1)). This
script answers, on hardware:

  1. Does --xla_tpu_scoped_vmem_limit_kib propagate through the tunnelled
     (axon) PJRT client — via XLA_FLAGS or jit compiler_options?
  2. If the limit can be raised, how much do larger instnorm blocks and a
     larger conv slab budget actually buy at the model's hot shapes?

Usage (one TPU job at a time):
    python scripts/microbench_scoped.py                   # default limit
    VANGAN_SCOPED_KIB=65536 python scripts/microbench_scoped.py
        # raised limit via compiler_options + matching block budgets
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# NOTE: XLA_FLAGS cannot carry TPU flags here — the local (client) flag
# parser aborts on flags it doesn't know (F parse_flags_from_env: Unknown
# flag, measured 2026-08-19). Per-compile compiler_options is the only
# channel that reaches the remote compiler through the axon tunnel.
SCOPED_KIB = int(os.environ.get("VANGAN_SCOPED_KIB", "0"))

from vangan_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def compile_with_options(fn, *args):
    """jit-compile with the raised scoped-vmem limit when requested."""
    lowered = jax.jit(fn).lower(*args)
    if SCOPED_KIB:
        return lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": SCOPED_KIB}
        )
    return lowered.compile()


def timed(compiled, *args, iters=10):
    out = compiled(*args)
    float(out)  # warm (fetch bounds completion on this platform)
    out = compiled(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    s = float(out)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt * 1e3


def main():
    from vangan_tpu.ops.pallas.instnorm import instance_norm_act
    from vangan_tpu.ops.pallas.conv3d import conv3d_cxyz

    blk = int(os.environ.get("VANGAN_INSTNORM_BLOCK_KIB", "256"))
    convb = int(os.environ.get("VANGAN_CONV_VMEM_KIB", str(11 * 1024)))
    print(f"# scoped_kib={SCOPED_KIB or 'default'} instnorm_block_kib={blk} "
          f"conv_vmem_kib={convb}")

    rng = np.random.default_rng(0)
    for c in (16, 32):
        x = jnp.asarray(rng.normal(size=(1, 128, c, 128, 128)), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)

        def fwd(x):
            return jnp.sum(
                instance_norm_act(x, gamma, beta, 1e-3, "relu", 0.2)
                .astype(jnp.float32))

        def fwdbwd(x):
            return jax.grad(lambda x: jnp.sum(
                instance_norm_act(x, gamma, beta, 1e-3, "relu", 0.2)
                .astype(jnp.float32) ** 2))(x).astype(jnp.float32).sum()

        try:
            t_f = timed(compile_with_options(fwd, x), x)
            t_fb = timed(compile_with_options(fwdbwd, x), x)
            print(f"IN+relu C={c:3d}   fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms")
        except Exception as e:  # surface compile OOMs without aborting the sweep
            print(f"IN+relu C={c:3d}   FAILED: {type(e).__name__}: {str(e)[:200]}")

    pads = ((1, 1),) * 3
    for name, ci, co, stride in (("conv 16->16", 16, 16, (1, 1, 1)),
                                 ("enc1 s2 16->32", 16, 32, (2, 2, 2)),
                                 ("dec0 48->16", 48, 16, (1, 1, 1))):
        x = jnp.asarray(rng.normal(size=(1, 128, ci, 128, 128)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.2, jnp.bfloat16)

        def fwd(x, w, stride=stride):
            return jnp.sum(
                conv3d_cxyz(x, w, None, stride, pads, "reflect")
                .astype(jnp.float32))

        def fwdbwd(x, w, stride=stride):
            def loss(x, w):
                return jnp.sum(
                    conv3d_cxyz(x, w, None, stride, pads, "reflect")
                    .astype(jnp.float32))
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return l + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

        try:
            t_f = timed(compile_with_options(fwd, x, w), x, w)
            t_fb = timed(compile_with_options(fwdbwd, x, w), x, w)
            print(f"{name:16s}  fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms")
        except Exception as e:
            print(f"{name:16s}  FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
