"""Per-conv microbenchmarks for the Pallas CXYZ kernels (docs/PERF.md tables).

Scalar-fetch timed (jax.block_until_ready does not synchronise on the
tunnelled platform): each measured program reduces its output to ONE scalar
on-device; the host fetch bounds completion.

Usage (one TPU job at a time — see memory: tpu-session-discipline):
    python scripts/microbench_conv.py            # Pallas kernels
    VANGAN_CONV_DB=0 python scripts/microbench_conv.py   # no double-buffering
    python scripts/microbench_conv.py --xla      # XLA channels-last reference
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vangan_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from vangan_tpu.ops.pallas.conv3d import conv3d_cxyz, conv3d_cxyz_reference

# (name, k, ci, co, stride, pads, pad_mode, X, Z) at 128^3 bf16 — the
# model-representative set measured in round 2 (docs/PERF.md)
CONFIGS = [
    ("stem 3^3 1->16", (3, 3, 3), 1, 16, (1, 1, 1), ((1, 1),) * 3, "reflect", 128, 128),
    ("conv 3^3 16->16", (3, 3, 3), 16, 16, (1, 1, 1), ((1, 1),) * 3, "reflect", 128, 128),
    ("dec0 3^3 48->16", (3, 3, 3), 48, 16, (1, 1, 1), ((1, 1),) * 3, "reflect", 128, 128),
    ("enc1 3^3 s2 16->32", (3, 3, 3), 16, 32, (2, 2, 2), ((1, 1),) * 3, "reflect", 128, 128),
    ("disc0 4^3 s2 1->64", (4, 4, 4), 1, 64, (2, 2, 2), ((1, 1),) * 3, "reflect", 128, 128),
    ("head 1^3 16->1", (1, 1, 1), 16, 1, (1, 1, 1), "same", "zeros", 128, 128),
]


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out) if out.ndim else out)  # compile + warm
    out = fn(*args)
    float(jnp.sum(out) if out.ndim else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out) if out.ndim else out)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt * 1e3


def bench_norm():
    """Fused IN+act vs the jnp (XLA) formulation at the model's hot shape."""
    from vangan_tpu.ops.pallas.instnorm import instance_norm_act

    rng = np.random.default_rng(0)
    for c in (16, 32):
        x = jnp.asarray(rng.normal(size=(1, 128, c, 128, 128)), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)

        @jax.jit
        def fused(x):
            y = instance_norm_act(x, gamma, beta, 1e-3, "relu", 0.2)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def xla(x):
            mean = jnp.mean(x, axis=(1, 3, 4), keepdims=True, dtype=jnp.float32)
            xc = x - mean.astype(x.dtype)
            var = jnp.mean(jax.lax.square(xc), axis=(1, 3, 4), keepdims=True,
                           dtype=jnp.float32)
            y = jnp.maximum(xc * jax.lax.rsqrt(var + 1e-3).astype(x.dtype), 0)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def fused_bwd(x):
            return jax.grad(lambda x: jnp.sum(
                instance_norm_act(x, gamma, beta, 1e-3, "relu", 0.2).astype(jnp.float32)
                ** 2))(x).astype(jnp.float32).sum()

        print(f"IN+relu C={c:3d}  fused fwd {timed(fused, x):6.2f} ms   "
              f"xla fwd {timed(xla, x):6.2f} ms   fused fwd+bwd {timed(fused_bwd, x):6.2f} ms")


def bench_launch_overhead():
    """ROADMAP P0.3: per-Pallas-launch fixed cost. N identical IN applies in
    one jit vs 1 — the slope is the per-launch overhead (data dependence via
    += keeps XLA from de-duplicating the launches)."""
    from vangan_tpu.ops.pallas.instnorm import instance_norm_act

    rng = np.random.default_rng(0)
    c = 16
    x = jnp.asarray(rng.normal(size=(1, 128, c, 128, 128)), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    times = {}
    for n in (1, 4, 8):

        @jax.jit
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = instance_norm_act(y, gamma, beta, 1e-3, "none", 0.2)
            return jnp.sum(y.astype(jnp.float32))

        times[n] = timed(chain, x)
        print(f"IN-apply chain n={n}:  {times[n]:7.2f} ms   "
              f"({times[n] / n:6.2f} ms/launch)")
    slope = (times[8] - times[1]) / 7.0
    print(f"marginal per-launch cost: {slope:6.2f} ms "
          f"(vs ~{2 * 128**3 * c * 2 / 8.2e11 * 1e3:.2f} ms bandwidth floor)")


def main():
    if "--norm" in sys.argv:
        bench_norm()
        return
    if "--launch" in sys.argv:
        bench_launch_overhead()
        return
    use_xla = "--xla" in sys.argv
    conv = conv3d_cxyz_reference if use_xla else conv3d_cxyz
    tag = "XLA" if use_xla else "Pallas"
    only = None
    if "--only" in sys.argv:  # substring filter, e.g. --only enc1
        only = sys.argv[sys.argv.index("--only") + 1]
    rng = np.random.default_rng(0)
    print(f"# {tag} conv micro-bench (bf16, batch 1)")
    for name, k, ci, co, stride, pads, pad_mode, X, Z in CONFIGS:
        if only and only not in name:
            continue
        x = jnp.asarray(rng.normal(size=(1, X, ci, X, Z)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(*k, ci, co)) * 0.2, jnp.bfloat16)

        @jax.jit
        def fwd(x, w, stride=stride, pads=pads, pad_mode=pad_mode):
            return jnp.sum(conv(x, w, None, stride, pads, pad_mode).astype(jnp.float32))

        @jax.jit
        def fwdbwd(x, w, stride=stride, pads=pads, pad_mode=pad_mode):
            def loss(x, w):
                return jnp.sum(conv(x, w, None, stride, pads, pad_mode).astype(jnp.float32))

            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return l + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

        t_f = timed(fwd, x, w)
        t_fb = timed(fwdbwd, x, w)
        print(f"{name:24s} fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")


if __name__ == "__main__":
    main()
