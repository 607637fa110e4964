"""Quantify per-Pallas-launch fixed overhead inside one jit module.

Chains N data-dependent, identical small kernel calls in a single jit and
fits time(N) — the slope is the per-launch fixed cost (dispatch, semaphore
setup, pipeline fill) with the body time held tiny. Decides the next perf
lever (docs/ROADMAP.md P0.3): ms-scale slope -> fuse launches (conv+IN+act
whole-level kernels); us-scale -> in-kernel relayout work instead.

Usage (one TPU job at a time):  python scripts/microbench_launch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vangan_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vangan_tpu.ops.pallas.conv3d import conv3d_cxyz
from vangan_tpu.ops.pallas.instnorm import instance_norm_act


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    # small tensor: per-kernel body ~0.1 ms of bandwidth -> slope ~= fixed cost
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 64, 128)), jnp.bfloat16)  # 2 MB
    gamma = jnp.ones((16,), jnp.float32)
    beta = jnp.zeros((16,), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) * 0.1, jnp.bfloat16)

    print("# IN+act chain (2 Pallas launches per link: stats + apply)")
    ts = {}
    for n in (1, 4, 16):
        @jax.jit
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = instance_norm_act(y, gamma, beta, 1e-3, "relu", 0.2)
            return y

        ts[n] = timed(chain, x)
        print(f"  N={n:3d}: {ts[n]:7.2f} ms")
    slope = (ts[16] - ts[1]) / 15
    print(f"  -> per-link cost {slope*1e3:.0f} us ({slope/2*1e3:.0f} us/launch)")

    print("# conv 3^3 16->16 chain (reflect pad folded)")
    ts = {}
    for n in (1, 4, 8):
        @jax.jit
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = conv3d_cxyz(y, w, None, (1, 1, 1), ((1, 1),) * 3, "reflect")
            return y

        ts[n] = timed(chain, x)
        print(f"  N={n:3d}: {ts[n]:7.2f} ms")
    slope = (ts[8] - ts[1]) / 7
    print(f"  -> per-conv cost {slope*1e3:.0f} us")

    print("# XLA elementwise chain (contrast: near-zero per-op cost expected)")
    for n in (1, 16):
        @jax.jit
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = jnp.tanh(y) * 1.0001
            return y

        print(f"  N={n:3d}: {timed(chain, x):7.2f} ms")


if __name__ == "__main__":
    main()
