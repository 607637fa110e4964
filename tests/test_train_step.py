"""Tests for the one-forward/one-backward GAN train step.

The load-bearing test here is gradient *exactness*: the combined-scalar
stop-gradient routing must produce bit-for-bit the same four restricted
gradients as the reference semantics (four independent backward passes, each
w.r.t. one network's parameters with every other network live —
vangan.py:394-438).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vangan_tpu.config import VanGanConfig
from vangan_tpu.losses import (
    LossScales,
    cycle_loss,
    cycle_reconstruction,
    cycle_seg_loss,
    discriminator_loss_fn,
    generator_loss_fn,
)
from vangan_tpu.models import PatchGANDiscriminator3D, ResUNet3D
from vangan_tpu.training import VanGanState, make_step_fns


def tiny_cfg(**kw):
    defaults = dict(
        N_DEVICES=1,
        BATCH_SIZE=2,
        EPOCHS=2,
        SUBVOL_PATCH_SIZE=(16, 16, 16),
        compute_dtype="float32",
        cldice_iters=2,
        output_dir="/tmp/vg_test",
    )
    defaults.update(kw)
    return VanGanConfig(**defaults)


def tiny_models(deterministic=True, wasserstein=False):
    """Small models; deterministic=True strips noise/dropout for grad tests."""
    gen = dict(upsample_mode="simple", filters=4, num_layers=2, dropout_type="none")
    disc = dict(
        filters=8,
        use_dropout=not deterministic,
        use_input_noise=not deterministic,
        use_layer_noise=not deterministic,
        wasserstein=wasserstein,
    )
    return {
        "gen_IS": ResUNet3D(**gen),
        "gen_SI": ResUNet3D(**gen),
        "disc_I": PatchGANDiscriminator3D(**disc),
        "disc_S": PatchGANDiscriminator3D(**disc),
    }


def make_batch(rng, cfg):
    real_I = rng.normal(size=(cfg.GLOBAL_BATCH_SIZE, *cfg.subvol_patch_shape)).astype(np.float32)
    seg = (rng.uniform(size=(cfg.GLOBAL_BATCH_SIZE, *cfg.seg_subvol_patch_shape)) > 0.7).astype(
        np.float32
    )
    real_S = 2 * seg - 1
    return jnp.asarray(real_I), jnp.asarray(real_S)


class TestGradientExactness:
    @pytest.mark.slow
    def test_matches_four_independent_backwards(self, rng):
        cfg = tiny_cfg()
        models = tiny_models(deterministic=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        key = jax.random.PRNGKey(7)
        noise_std = jnp.zeros(())

        # ours: one backward through the combined routed scalar
        grads, _ = jax.grad(fns.compute_losses, argnums=0, has_aux=True)(
            state.params, state.model_state, real_I, real_S, key, noise_std, True, None
        )

        # reference semantics: four losses WITHOUT any stop_gradient, each
        # differentiated w.r.t. only its own network's parameters
        scales = LossScales(global_batch_size=cfg.GLOBAL_BATCH_SIZE, n_devices=1,
                            cldice_iters=cfg.cldice_iters)

        def ref_losses(params):
            ap = lambda name, x: models[name].apply({"params": params[name]}, x, train=True)
            fake_S = ap("gen_IS", real_I)
            fake_I = ap("gen_SI", real_S)
            cycled_S = ap("gen_IS", fake_I)
            cycled_I = ap("gen_SI", fake_S)
            cl_I = cycle_loss(scales, real_S, cycled_S, "bce")
            seg = cycle_seg_loss(scales, real_S, cycled_S)
            cl_S = cycle_loss(scales, real_I, cycled_I, "mse")
            rec = cycle_reconstruction(scales, real_I, cycled_I)
            d = lambda name, x: models[name].apply(
                {"params": params[name]}, x, train=True, noise_std=noise_std
            )
            d_real_S, d_fake_S = d("disc_S", real_S), d("disc_S", fake_S)
            d_real_I, d_fake_I = d("disc_I", real_I), d("disc_I", fake_I)
            total_I = generator_loss_fn(scales, d_fake_S) + cl_I + seg
            total_S = generator_loss_fn(scales, d_fake_I) + cl_S + rec
            dI = discriminator_loss_fn(scales, d_real_I, d_fake_I)
            dS = discriminator_loss_fn(scales, d_real_S, d_fake_S)
            return total_I, total_S, dI, dS

        p = state.params
        want = {
            "gen_IS": jax.grad(lambda q: ref_losses({**p, "gen_IS": q})[0])(p["gen_IS"]),
            "gen_SI": jax.grad(lambda q: ref_losses({**p, "gen_SI": q})[1])(p["gen_SI"]),
            "disc_I": jax.grad(lambda q: ref_losses({**p, "disc_I": q})[2])(p["disc_I"]),
            "disc_S": jax.grad(lambda q: ref_losses({**p, "disc_S": q})[3])(p["disc_S"]),
        }
        for name in ("gen_IS", "gen_SI", "disc_I", "disc_S"):
            got_flat = jax.tree_util.tree_leaves(grads[name])
            want_flat = jax.tree_util.tree_leaves(want[name])
            assert len(got_flat) == len(want_flat)
            for g, w in zip(got_flat, want_flat):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-6)


class TestMicrobatch:
    """cfg.micro_batches gradient accumulation (parallel.jit_microbatch_step)."""

    def _setup(self, micro, batch=3):
        from vangan_tpu.parallel import jit_microbatch_step, make_mesh

        cfg = tiny_cfg(BATCH_SIZE=batch, micro_batches=micro)
        models = tiny_models(deterministic=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        mesh = make_mesh(1)
        # donate=False: the tests reuse `state` after the step (donation
        # would invalidate its buffers)
        step = jit_microbatch_step(fns, mesh, micro, donate=False)
        return cfg, models, fns, step

    @pytest.mark.slow
    def test_loss_dict_parity_with_full_batch(self, rng):
        """Summed micro results == the full-batch two_phase step's dict for
        every per-sample and axis=None-quirk loss; seg_loss follows the
        per-micro-shard grouped convention (groups = micro)."""
        import jax.numpy as jnp

        from vangan_tpu.losses import LossScales, cycle_seg_loss

        micro, batch = 3, 3
        cfg, models, fns, step = self._setup(micro, batch)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        key = jax.random.PRNGKey(7)
        _, result = step(state, real_I, real_S, key, jnp.zeros(()), jnp.asarray(True))

        # full-batch reference dict (same params; rng differs per micro, but
        # deterministic models make the forward rng-independent)
        cfg_full = tiny_cfg(BATCH_SIZE=batch)
        fns_full = make_step_fns(cfg_full, models, steps_per_epoch=10)
        _, (want, _) = fns_full.compute_losses(
            state.params, state.model_state, real_I, real_S, key, jnp.zeros(()), False
        )
        exact_keys = ["gen_IS_loss", "gen_SI_loss", "cycle_gen_SIS_loss",
                      "cycle_gen_ISI_loss", "reconstruction_loss_I",
                      "D_I_loss", "D_S_loss"]
        for k in exact_keys:
            assert float(result[k]) == pytest.approx(float(want[k]), rel=2e-5), k

        # seg_loss: per-micro grouped convention == grouped eval at groups=micro
        scales_g = LossScales(global_batch_size=batch, n_devices=1,
                              cldice_iters=cfg.cldice_iters, cldice_groups=micro)
        # reconstruct the micro slicing order: micro m takes samples m::micro,
        # and grouped eval splits contiguously -> reorder accordingly
        order = np.concatenate([np.arange(batch)[m::micro] for m in range(micro)])
        ap = lambda name, x: models[name].apply({"params": state.params[name]}, x, train=False)
        cycled_S = ap("gen_IS", ap("gen_SI", real_S))
        want_seg = cycle_seg_loss(scales_g, real_S[order], cycled_S[order])
        assert float(result["seg_loss"]) == pytest.approx(float(want_seg), rel=2e-4)

    @pytest.mark.slow
    def test_grads_match_manual_accumulation(self, rng):
        """The jitted micro loop == manual per-slice grad calls summed."""
        import jax.numpy as jnp

        micro, batch = 3, 3
        cfg, models, fns, step = self._setup(micro, batch)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        key = jax.random.PRNGKey(9)
        new_state, _ = step(state, real_I, real_S, key, jnp.zeros(()), jnp.asarray(True))

        grads = None
        ms = None
        for m in range(micro):
            xI, xS = real_I[m::micro], real_S[m::micro]
            r = jax.random.fold_in(key, m)
            gg, _, ms_m, fk = fns.grad_gens_micro(state.params, state.model_state,
                                                  state.step, xI, xS, r, jnp.zeros(()))
            gd = fns.grad_discs_micro(state.params, state.model_state,
                                      state.step, xI, xS, r, jnp.zeros(()), fk)
            g = {**gg, **gd}
            grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
            ms = ms if ms is not None else ms_m
        want_state = fns.apply_grads(state, grads, ms, jnp.asarray(True))
        # tolerance note: the jitted step and this eager reconstruction round
        # f32 conv-backward sums differently; Adam's m/sqrt(nu) amplifies
        # that noise to O(lr) on near-zero-gradient elements (observed 4/8192
        # elements at ~3e-4 abs). A slicing/accumulation bug would move EVERY
        # element by O(lr), which these bounds still catch; exact semantics
        # are proven by test_loss_dict_parity_with_full_batch.
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(want_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)

    def test_facade_microbatch_smoke(self, rng):
        """VanGan facade with cfg.micro_batches=3: finite losses, params move."""
        from vangan_tpu.vangan import VanGan

        cfg = tiny_cfg(BATCH_SIZE=3, micro_batches=3)
        models = tiny_models(deterministic=False)
        gan = VanGan(cfg, steps_per_epoch=10, models=models)
        real_I, real_S = make_batch(rng, cfg)
        before = jax.tree_util.tree_leaves(gan.state.params["gen_IS"])[0].copy()
        result = gan.distributed_train_step(real_I, real_S, 0.1, True)
        assert all(np.isfinite(float(v)) for v in result.values())
        after = jax.tree_util.tree_leaves(gan.state.params["gen_IS"])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_config_validates_divisibility(self):
        with pytest.raises(ValueError, match="micro_batches"):
            tiny_cfg(BATCH_SIZE=3, micro_batches=2)


class TestIdentityLoss:
    """cfg.use_identity_loss wiring (vangan.py:310-312, commented there)."""

    @pytest.mark.slow
    def test_identity_grads_match_independent_backwards(self, rng):
        from vangan_tpu.losses import identity_loss

        cfg = tiny_cfg(use_identity_loss=True)
        models = tiny_models(deterministic=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        key = jax.random.PRNGKey(7)
        noise_std = jnp.zeros(())

        grads, (result, _) = jax.grad(fns.compute_losses, argnums=0, has_aux=True)(
            state.params, state.model_state, real_I, real_S, key, noise_std, True, None
        )
        assert "identity_IS_loss" in result and "identity_SI_loss" in result
        assert np.isfinite(float(result["identity_IS_loss"]))

        scales = LossScales(global_batch_size=cfg.GLOBAL_BATCH_SIZE, n_devices=1,
                            cldice_iters=cfg.cldice_iters)

        def ref_losses(params):
            ap = lambda name, x: models[name].apply({"params": params[name]}, x, train=True)
            fake_S = ap("gen_IS", real_I)
            fake_I = ap("gen_SI", real_S)
            cycled_S = ap("gen_IS", fake_I)
            cycled_I = ap("gen_SI", fake_S)
            cl_I = cycle_loss(scales, real_S, cycled_S, "bce")
            seg = cycle_seg_loss(scales, real_S, cycled_S)
            cl_S = cycle_loss(scales, real_I, cycled_I, "mse")
            rec = cycle_reconstruction(scales, real_I, cycled_I)
            # identity terms, each in its own generator's total (step.py note)
            id_IS = identity_loss(scales, real_S, ap("gen_IS", real_S), typ="cldice")
            id_SI = identity_loss(scales, real_I, ap("gen_SI", real_I), typ=None)
            d = lambda name, x: models[name].apply(
                {"params": params[name]}, x, train=True, noise_std=noise_std
            )
            d_fake_S, d_fake_I = d("disc_S", fake_S), d("disc_I", fake_I)
            total_I = generator_loss_fn(scales, d_fake_S) + cl_I + seg + id_IS
            total_S = generator_loss_fn(scales, d_fake_I) + cl_S + rec + id_SI
            return total_I, total_S

        p = state.params
        want_IS = jax.grad(lambda q: ref_losses({**p, "gen_IS": q})[0])(p["gen_IS"])
        want_SI = jax.grad(lambda q: ref_losses({**p, "gen_SI": q})[1])(p["gen_SI"])
        for got, want in ((grads["gen_IS"], want_IS), (grads["gen_SI"], want_SI)):
            for g, w in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-6)

    def test_disc_grads_unaffected_by_identity(self, rng):
        models = tiny_models(deterministic=True)
        real_I = real_S = None
        outs = {}
        for flag in (False, True):
            cfg = tiny_cfg(use_identity_loss=flag)
            fns = make_step_fns(cfg, models, steps_per_epoch=10)
            state = fns.init(jax.random.PRNGKey(0))
            if real_I is None:
                real_I, real_S = make_batch(rng, cfg)
            grads, _ = jax.grad(fns.compute_losses, argnums=0, has_aux=True)(
                state.params, state.model_state, real_I, real_S, jax.random.PRNGKey(7),
                jnp.zeros(()), True, None,
            )
            outs[flag] = grads
        for name in ("disc_I", "disc_S"):
            for a, b in zip(jax.tree_util.tree_leaves(outs[False][name]),
                            jax.tree_util.tree_leaves(outs[True][name])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainStep:
    @pytest.mark.slow
    def test_smoke_and_params_change(self, rng):
        cfg = tiny_cfg()
        models = tiny_models(deterministic=False)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        new_state, result = step(
            state, real_I, real_S, jax.random.PRNGKey(1), jnp.asarray(0.1), jnp.asarray(True)
        )
        for k, v in result.items():
            assert np.isfinite(float(v)), k
        assert int(new_state.step) == 1
        # every network's params moved
        for name in ("gen_IS", "gen_SI", "disc_I", "disc_S"):
            before = jax.tree_util.tree_leaves(state.params[name])
            after = jax.tree_util.tree_leaves(new_state.params[name])
            assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))
        # expected metric keys (vangan.py:338-351)
        assert set(result) == {
            "total_IS_loss", "total_SI_loss", "D_I_loss", "D_S_loss", "gen_IS_loss",
            "gen_SI_loss", "cycle_gen_SIS_loss", "cycle_gen_ISI_loss", "seg_loss",
            "reconstruction_loss_I",
        }

    @pytest.mark.slow
    def test_multiple_steps_reduce_disc_loss(self, rng):
        """With frozen generators' input distribution, D should learn: D loss
        after a few steps < first step."""
        cfg = tiny_cfg()
        models = tiny_models(deterministic=False)
        fns = make_step_fns(cfg, models, steps_per_epoch=100)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        first = None
        for i in range(5):
            state, result = step(
                state, real_I, real_S, jax.random.PRNGKey(i), jnp.asarray(0.0), jnp.asarray(True)
            )
            if first is None:
                first = float(result["D_I_loss"]) + float(result["D_S_loss"])
        last = float(result["D_I_loss"]) + float(result["D_S_loss"])
        assert last < first

    def test_test_step(self, rng):
        cfg = tiny_cfg()
        models = tiny_models(deterministic=False)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        result = jax.jit(fns.test_step)(state, real_I, real_S, jax.random.PRNGKey(1))
        assert all(np.isfinite(float(v)) for v in result.values())

    @pytest.mark.slow
    def test_deterministic_given_same_rng(self, rng):
        cfg = tiny_cfg()
        models = tiny_models(deterministic=False)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        s1, r1 = step(state, real_I, real_S, jax.random.PRNGKey(3), jnp.asarray(0.1), jnp.asarray(True))
        s2, r2 = step(state, real_I, real_S, jax.random.PRNGKey(3), jnp.asarray(0.1), jnp.asarray(True))
        for k in r1:
            assert float(r1[k]) == float(r2[k])


class TestWassersteinPath:
    @pytest.mark.slow
    def test_ncritic_gating(self, rng):
        cfg = tiny_cfg(wasserstein=True)
        models = tiny_models(deterministic=False, wasserstein=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        # update_gen=False: generators frozen, discriminators move
        new_state, result = step(
            state, real_I, real_S, jax.random.PRNGKey(1), jnp.asarray(0.1), jnp.asarray(False)
        )
        for name in ("gen_IS", "gen_SI"):
            for a, b in zip(
                jax.tree_util.tree_leaves(new_state.params[name]),
                jax.tree_util.tree_leaves(state.params[name]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for name in ("disc_I", "disc_S"):
            before = jax.tree_util.tree_leaves(state.params[name])
            after = jax.tree_util.tree_leaves(new_state.params[name])
            assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))
        # wasserstein output heads give finite losses; GP disabled at step 0
        assert np.isfinite(float(result["D_I_loss"]))

    @pytest.mark.slow
    def test_gp_active_after_first_step(self, rng):
        cfg = tiny_cfg(wasserstein=True)
        models = tiny_models(deterministic=False, wasserstein=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        state1, r0 = step(state, real_I, real_S, jax.random.PRNGKey(1), jnp.asarray(0.1), jnp.asarray(True))
        _, r1 = step(state1, real_I, real_S, jax.random.PRNGKey(1), jnp.asarray(0.1), jnp.asarray(True))
        assert np.isfinite(float(r1["D_I_loss"]))
        assert np.isfinite(float(r1["D_S_loss"]))


class TestBackwardModes:
    @pytest.mark.slow
    def test_sequential_equals_combined(self, rng):
        """The barrier-chained grouped backwards must produce the same
        gradients, losses, and updated parameters as the combined mode
        (up to compilation-level float reassociation)."""
        models = tiny_models(deterministic=False)
        real_rng = np.random.default_rng(5)

        def run(mode):
            cfg = tiny_cfg(backward_mode=mode)
            fns = make_step_fns(cfg, models, steps_per_epoch=10)
            state = fns.init(jax.random.PRNGKey(0))
            real_I, real_S = make_batch(np.random.default_rng(5), cfg)
            step = jax.jit(fns.train_step)
            new_state, result = step(
                state, real_I, real_S, jax.random.PRNGKey(2), jnp.asarray(0.1),
                jnp.asarray(True),
            )
            return new_state, {k: float(v) for k, v in result.items()}

        s_comb, r_comb = run("combined")
        for mode in ("sequential", "two_phase"):
            s_m, r_m = run(mode)
            # not bit-exact: each grouped grad graph is compiled (fused)
            # separately, so float reassociation differs at the 1e-6 level
            for k in r_comb:
                assert r_m[k] == pytest.approx(r_comb[k], rel=1e-4), (mode, k)
            for a, b in zip(jax.tree_util.tree_leaves(s_m.params),
                            jax.tree_util.tree_leaves(s_comb.params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                           atol=1e-6)


class TestSplitStep:
    @pytest.mark.slow
    def test_split_matches_monolithic_two_phase(self):
        """backward_mode='split' (three separate jit modules) produces the
        SAME state update as the monolithic two_phase step."""
        from vangan_tpu.parallel import jit_split_step, jit_train_step, make_mesh

        cfg = tiny_cfg(backward_mode="two_phase")
        models = tiny_models()
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        mesh = make_mesh(1, cfg.mesh_axis)
        state0 = fns.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        real_I = jnp.asarray(rng.normal(size=(1, *cfg.subvol_patch_shape)), jnp.float32)
        real_S = jnp.asarray(
            (rng.uniform(size=(1, *cfg.seg_subvol_patch_shape)) > 0.7) * 2.0 - 1.0, jnp.float32
        )
        key = jax.random.PRNGKey(3)
        noise = jnp.asarray(0.05, jnp.float32)
        upd = jnp.asarray(True)

        mono = jit_train_step(fns, mesh, donate=False, axis_name=cfg.mesh_axis)
        s_mono, r_mono = mono(state0, real_I, real_S, key, noise, upd)
        split = jit_split_step(fns, mesh, donate=False, axis_name=cfg.mesh_axis)
        s_split, r_split = split(state0, real_I, real_S, key, noise, upd)

        for k in r_mono:
            np.testing.assert_allclose(float(r_split[k]), float(r_mono[k]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_mono.params),
                        jax.tree_util.tree_leaves(s_split.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert int(s_split.step) == 1


class TestFakesReuse:
    """The disc-only gradient pull may take the gen pull's translated fakes as
    inputs instead of recomputing the generator forward (training/step.py
    compute_losses ``fakes``): the disc branch consumes stop_gradient(fake),
    so identical values => identical gradients. Guards the round-5 perf path
    (parallel.jit_split_step / jit_microbatch_step / two_phase groups)."""

    @pytest.mark.quick
    def test_disc_grads_identical_with_and_without_fakes(self):
        cfg = tiny_cfg(BATCH_SIZE=1)
        models = tiny_models(deterministic=False)  # exercise noise/dropout rngs
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        real_I = jnp.asarray(rng.normal(size=(1, *cfg.subvol_patch_shape)), jnp.float32)
        real_S = jnp.asarray(
            (rng.uniform(size=(1, *cfg.seg_subvol_patch_shape)) > 0.7) * 2.0 - 1.0, jnp.float32
        )
        key = jax.random.PRNGKey(7)
        noise = jnp.asarray(0.05, jnp.float32)

        _, _, _, fakes = fns.grad_gens(state.params, state.model_state, state.step,
                                       real_I, real_S, key, noise)
        g_reuse = fns.grad_discs(state.params, state.model_state, state.step,
                                 real_I, real_S, key, noise, fakes)
        g_recompute = fns.grad_discs(state.params, state.model_state, state.step,
                                     real_I, real_S, key, noise)
        assert set(g_reuse) == {"disc_I", "disc_S"}
        for a, b in zip(jax.tree_util.tree_leaves(g_reuse),
                        jax.tree_util.tree_leaves(g_recompute)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)

    @pytest.mark.quick
    def test_fakes_match_standalone_generator_apply(self):
        """The aux fakes ARE the translations gen_IS(real_I) / gen_SI(real_S)
        — not stale, permuted, or from a later (cycled) application. Uses
        deterministic models so a direct flax apply reproduces them exactly."""
        cfg = tiny_cfg(BATCH_SIZE=1)
        models = tiny_models()  # deterministic: no dropout/noise rng influence
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        real_I = jnp.asarray(rng.normal(size=(1, *cfg.subvol_patch_shape)), jnp.float32)
        real_S = jnp.asarray(
            (rng.uniform(size=(1, *cfg.seg_subvol_patch_shape)) > 0.7) * 2.0 - 1.0, jnp.float32
        )
        key = jax.random.PRNGKey(9)
        _, _, _, (fake_I, fake_S) = fns.grad_gens(
            state.params, state.model_state, state.step, real_I, real_S, key,
            jnp.zeros((), jnp.float32))
        want_S = models["gen_IS"].apply({"params": state.params["gen_IS"]}, real_I,
                                        train=True, rngs={"dropout": key, "noise": key})
        want_I = models["gen_SI"].apply({"params": state.params["gen_SI"]}, real_S,
                                        train=True, rngs={"dropout": key, "noise": key})
        np.testing.assert_allclose(np.asarray(fake_S), np.asarray(want_S), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fake_I), np.asarray(want_I), atol=1e-6)

    @pytest.mark.quick
    def test_disc_grads_identical_with_fakes_wgan_gp(self):
        """Same identity on the WGAN-GP path: the gradient_penalty term also
        consumes stop_gradient(fake) (training/step.py), so a fakes pull with
        gp_scale active must reproduce the recomputing pull's disc grads."""
        cfg = tiny_cfg(BATCH_SIZE=1, wasserstein=True)
        models = tiny_models(deterministic=False, wasserstein=True)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        real_I = jnp.asarray(rng.normal(size=(1, *cfg.subvol_patch_shape)), jnp.float32)
        real_S = jnp.asarray(
            (rng.uniform(size=(1, *cfg.seg_subvol_patch_shape)) > 0.7) * 2.0 - 1.0, jnp.float32
        )
        key = jax.random.PRNGKey(11)
        noise = jnp.asarray(0.05, jnp.float32)
        step1 = jnp.ones((), jnp.int32)  # step > 0: GP active (vangan.py:410-415)

        _, _, _, fakes = fns.grad_gens(state.params, state.model_state, step1,
                                       real_I, real_S, key, noise)
        g_reuse = fns.grad_discs(state.params, state.model_state, step1,
                                 real_I, real_S, key, noise, fakes)
        g_recompute = fns.grad_discs(state.params, state.model_state, step1,
                                     real_I, real_S, key, noise)
        for a, b in zip(jax.tree_util.tree_leaves(g_reuse),
                        jax.tree_util.tree_leaves(g_recompute)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


class TestFlattenedOptimizer:
    """cfg.flatten_opt ravels each network's Adam moments into one vector
    (optax.flatten, training/optimizers.py) — identical updates, far fewer
    launch-sized ops. The per-leaf clipnorm stays outside the flatten."""

    @pytest.mark.quick
    def test_updates_identical_to_unflattened(self, rng):
        import optax

        from vangan_tpu.training.optimizers import make_optimizer

        cfg_f = VanGanConfig(N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(16, 16, 16),
                             gen_filters=4, output_dir="/tmp/vg_optflat")
        cfg_u = VanGanConfig(N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(16, 16, 16),
                             gen_filters=4, flatten_opt=False,
                             output_dir="/tmp/vg_optflat")
        model = ResUNet3D(filters=4, num_layers=2, layout="NXCYZ",
                          dropout_type="none")
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        grads = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
        # a large-gradient leaf exercises the per-leaf clip too
        grads = jax.tree_util.tree_map(lambda g: g * 37.0, grads)

        tx_f = make_optimizer(cfg_f, steps_per_epoch=10)
        tx_u = make_optimizer(cfg_u, steps_per_epoch=10)
        st_f, st_u = tx_f.init(params), tx_u.init(params)
        for _ in range(3):  # a few steps so the moments are non-trivial
            u_f, st_f = tx_f.update(grads, st_f, params)
            u_u, st_u = tx_u.update(grads, st_u, params)
        for (kf, a), (ku, b) in zip(
            jax.tree_util.tree_leaves_with_path(u_f),
            jax.tree_util.tree_leaves_with_path(u_u),
        ):
            assert jax.tree_util.keystr(kf) == jax.tree_util.keystr(ku)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=jax.tree_util.keystr(kf))
