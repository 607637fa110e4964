"""Locally measured reference anchor (BASELINE.md acceptance; VERDICT r4 #8).

Times ONE optimisation step of the reference's own TF code — its models
(/root/reference/resunet_model.py, discriminator.py), its losses
(loss_functions.py, clDice_func.py) and its step structure (one persistent
GradientTape forward, four restricted backwards, vangan.py:270-440) — against
our JAX train step, both on the SAME host CPU at the same reduced geometry.

This is a *lower-bound anchor*, not the 4-GPU baseline: no GPU exists in this
environment, so the reference's production throughput cannot be measured here.
What this does pin down is the two frameworks' step cost on identical hardware
with identical math, replacing the bench's 1.0 patches/s engineering estimate
with a measured ratio at reduced size.

Usage: python scripts/baseline_anchor.py [--size 32] [--batch 1] [--steps 3]
Emits one JSON line per framework.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # never contend for the chip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _install_shims():
    """Import-only shims for the reference modules — shared with
    tests/test_model_golden.py via tests/tf_ref_shims.py so the reference
    semantics (tfa InstanceNormalization epsilon, K.sum, Reduction) cannot
    drift between the anchor and the golden-parity tests."""
    import tensorflow as tf

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from tf_ref_shims import install_ref_shims

    install_ref_shims(tf)


def time_reference_tf(size: int, batch: int, steps: int, filters: int) -> dict:
    import tensorflow as tf

    _install_shims()
    import discriminator as ref_disc
    import loss_functions as ref_lf
    import resunet_model as ref_resunet

    class Bag:  # the attribute-bag 'self' the reference losses expect
        global_batch_size = float(batch)
        n_devices = 1
        lambda_cycle = 10.0
        lambda_identity = 5.0
        lambda_reconstruction = 5.0
        lambda_topology = 5.0

    shape = (size, size, size, 1)
    # VanGan's exact builder configs (vangan.py:111-192) at reduced size
    gen_IS = ref_resunet.ResUNet(shape, upsample_mode="simple", dropout_type="none",
                                 filters=filters, num_layers=4)
    gen_SI = ref_resunet.ResUNet(shape, upsample_mode="simple", dropout_type="none",
                                 filters=filters, num_layers=4)
    disc_I = ref_disc.get_discriminator(shape, filters=4 * filters, use_dropout=True,
                                        use_input_noise=True, use_layer_noise=True,
                                        name="disc_I")
    disc_S = ref_disc.get_discriminator(shape, filters=4 * filters, use_dropout=True,
                                        use_input_noise=True, use_layer_noise=True,
                                        name="disc_S")
    opts = [tf.keras.optimizers.Adam(2e-4, beta_1=0.5, beta_2=0.9, clipnorm=100)
            for _ in range(4)]

    bag = Bag()

    @tf.function
    def train_step(real_I, real_S):
        # the reference's persistent-tape step (vangan.py:380-440): one
        # forward graph, four restricted gradients, four Adam applies
        with tf.GradientTape(persistent=True) as tape:
            fake_S = gen_IS(real_I, training=True)
            fake_I = gen_SI(real_S, training=True)
            cycled_S = gen_IS(fake_I, training=True)
            cycle_loss_I = ref_lf.cycle_loss(bag, real_S, cycled_S, typ="bce")
            seg_loss = ref_lf.cycle_seg_loss(bag, real_S, cycled_S)
            cycled_I = gen_SI(fake_S, training=True)
            cycle_loss_S = ref_lf.cycle_loss(bag, real_I, cycled_I, typ="mse")
            rec_loss = ref_lf.cycle_reconstruction(bag, real_I, cycled_I)
            d_real_S = disc_S(real_S, training=True)
            d_fake_S = disc_S(fake_S, training=True)
            d_real_I = disc_I(real_I, training=True)
            d_fake_I = disc_I(fake_I, training=True)
            gen_IS_loss = ref_lf.generator_loss_fn(bag, d_fake_S, from_logits=True)
            gen_SI_loss = ref_lf.generator_loss_fn(bag, d_fake_I, from_logits=True)
            disc_I_loss = ref_lf.discriminator_loss_fn(bag, d_real_I, d_fake_I,
                                                       from_logits=True)
            disc_S_loss = ref_lf.discriminator_loss_fn(bag, d_real_S, d_fake_S,
                                                       from_logits=True)
            total_I = gen_IS_loss + cycle_loss_I + seg_loss
            total_S = gen_SI_loss + cycle_loss_S + rec_loss
        for loss, net, opt in ((total_I, gen_IS, opts[0]), (total_S, gen_SI, opts[1]),
                               (disc_I_loss, disc_I, opts[2]),
                               (disc_S_loss, disc_S, opts[3])):
            grads = tape.gradient(loss, net.trainable_variables)
            opt.apply_gradients(zip(grads, net.trainable_variables))
        return total_I

    rng = np.random.default_rng(0)
    real_I = tf.constant(rng.normal(size=(batch, *shape)).astype(np.float32))
    real_S = tf.constant(
        (2 * (rng.uniform(size=(batch, *shape)) > 0.7) - 1).astype(np.float32))

    t0 = time.time()
    train_step(real_I, real_S)  # trace + compile + first run
    compile_s = time.time() - t0
    times = []
    for _ in range(steps):
        t0 = time.time()
        loss = train_step(real_I, real_S)
        _ = float(loss)  # forces completion
        times.append(time.time() - t0)
    return {"framework": "tensorflow-reference", "compile_s": round(compile_s, 2),
            "step_s": round(float(np.median(times)), 4),
            "patches_per_s": round(batch / float(np.median(times)), 4)}


def time_ours_jax(size: int, batch: int, steps: int, filters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator
    from vangan_tpu.training import make_step_fns

    cfg = VanGanConfig(
        N_DEVICES=1, BATCH_SIZE=batch, EPOCHS=2, SUBVOL_PATCH_SIZE=(size,) * 3,
        gen_filters=filters, disc_filters=4 * filters, output_dir="/tmp/vg_anchor",
        compute_dtype="float32",  # CPU anchor: match TF's f32 exactly
        layout="NXYZC",  # the portable XLA path — the Pallas engine is TPU-only
    )
    models = {
        "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
        "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
        "disc_I": build_discriminator(cfg),
        "disc_S": build_discriminator(cfg),
    }
    fns = make_step_fns(cfg, models, steps_per_epoch=100)
    state = fns.init(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step, donate_argnums=0)

    rng = np.random.default_rng(0)
    real_I = jnp.asarray(rng.normal(size=(batch, size, size, size, 1)), jnp.float32)
    real_S = jnp.asarray(
        2 * (rng.uniform(size=(batch, size, size, size, 1)) > 0.7) - 1, jnp.float32)
    key = jax.random.PRNGKey(1)
    noise = jnp.asarray(0.1, jnp.float32)
    upd = jnp.asarray(True)

    t0 = time.time()
    state, result = step(state, real_I, real_S, key, noise, upd)
    _ = float(result["total_IS_loss"])
    compile_s = time.time() - t0
    times = []
    for _ in range(steps):
        t0 = time.time()
        state, result = step(state, real_I, real_S, key, noise, upd)
        _ = float(result["total_IS_loss"])  # forces completion
        times.append(time.time() - t0)
    return {"framework": "vangan-tpu (jax, cpu)", "compile_s": round(compile_s, 2),
            "step_s": round(float(np.median(times)), 4),
            "patches_per_s": round(batch / float(np.median(times)), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--filters", type=int, default=16)
    ap.add_argument("--only", choices=["tf", "jax"], default=None)
    args = ap.parse_args()

    base = {"size": args.size, "batch": args.batch, "filters": args.filters,
            "host_cores": os.cpu_count()}
    if args.only in (None, "jax"):
        r = time_ours_jax(args.size, args.batch, args.steps, args.filters)
        print(json.dumps({**base, **r}), flush=True)
    if args.only in (None, "tf"):
        r = time_reference_tf(args.size, args.batch, args.steps, args.filters)
        print(json.dumps({**base, **r}), flush=True)


if __name__ == "__main__":
    main()
