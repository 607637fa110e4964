"""Checkpoint save/restore round-trip tests (orbax)."""

import jax
import numpy as np
import pytest

from vangan_tpu.checkpoint import VanGanCheckpointer
from vangan_tpu.training import make_step_fns

from test_train_step import make_batch, tiny_cfg, tiny_models


class TestCheckpoint:
    @pytest.mark.slow
    def test_roundtrip(self, tmp_path, rng):
        cfg = tiny_cfg(output_dir=str(tmp_path))
        models = tiny_models(deterministic=False)
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))

        import jax.numpy as jnp

        real_I, real_S = make_batch(rng, cfg)
        step = jax.jit(fns.train_step)
        state, _ = step(state, real_I, real_S, jax.random.PRNGKey(1), jnp.asarray(0.1),
                        jnp.asarray(True))

        ck = VanGanCheckpointer(cfg.output_dir)
        ck.save(state, epoch=4)  # writes checkpoint_e5 (epoch+1, vangan.py:249)
        assert ck.latest_epoch() == 5

        template = fns.init(jax.random.PRNGKey(123))  # different values, same structure
        restored = ck.load(template, epoch=5)
        assert restored is not None
        assert int(restored.step) == int(state.step) == 1
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                        jax.tree_util.tree_leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_checkpoint_returns_none(self, tmp_path):
        cfg = tiny_cfg(output_dir=str(tmp_path))
        models = tiny_models()
        fns = make_step_fns(cfg, models, steps_per_epoch=10)
        state = fns.init(jax.random.PRNGKey(0))
        ck = VanGanCheckpointer(cfg.output_dir)
        assert ck.load(state, epoch=99) is None
        assert ck.latest_epoch() is None

    def test_resume_restores_schedule_position(self, tmp_path, rng):
        """state.step drives the LR schedule, so restore == exact LR resume
        (replaces custom_callback.py:367-397)."""
        from vangan_tpu.training.optimizers import make_lr_schedule

        cfg = tiny_cfg(output_dir=str(tmp_path), EPOCHS=4)
        sched = make_lr_schedule(cfg, steps_per_epoch=10)
        # decay starts at epoch 2 (= step 20), hits 0 at step 40
        assert float(sched(0)) == pytest.approx(cfg.INITIAL_LR)
        assert float(sched(19)) == pytest.approx(cfg.INITIAL_LR)
        assert float(sched(30)) == pytest.approx(cfg.INITIAL_LR * 0.5, rel=1e-5)
        assert float(sched(40)) == pytest.approx(0.0, abs=1e-12)
