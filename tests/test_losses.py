"""Tests for the loss library, including the cross-replica reduction contract.

The reduction contract is verified against a NumPy simulation of the
reference's distributed semantics: split the global batch into n_devices
shards, compute each shard's ``reduce_mean`` (mean over given axes /
GLOBAL_BATCH, loss_functions.py:8-22), and SUM the shard results
(vangan.py:459-473).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vangan_tpu.losses import (
    L4,
    MAE,
    MSE,
    LossScales,
    cycle_loss,
    cycle_reconstruction,
    cycle_seg_loss,
    discriminator_loss_fn,
    generator_loss_fn,
    gradient_penalty,
    identity_loss,
    reduce_mean_global,
    reduce_mean_overall,
    soft_clDice_loss,
    soft_dice,
    soft_dice_cldice_loss,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)
from vangan_tpu.losses.cldice import soft_dice_cldice_grouped


def _simulate_ref_reduce(x: np.ndarray, n_dev: int, per_sample_axes: bool) -> float:
    """Reference semantics: per-replica reduce_mean then SUM all-reduce."""
    gb = x.shape[0]
    shards = np.split(x, n_dev, axis=0)
    total = 0.0
    for s in shards:
        if per_sample_axes:
            arr = s.mean(axis=tuple(range(1, s.ndim))) if s.ndim > 1 else s
        else:
            arr = s.mean()
        total += np.sum(arr) / gb
    return float(total)


SCALES = LossScales(global_batch_size=8, n_devices=4)


class TestReductionContract:
    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_reduce_mean_global(self, rng, n_dev):
        scales = LossScales(global_batch_size=8, n_devices=n_dev)
        x = rng.normal(size=(8, 3, 3, 3, 1)).astype(np.float32)
        got = float(reduce_mean_global(scales, jnp.asarray(x)))
        want = _simulate_ref_reduce(x, n_dev, per_sample_axes=True)
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_reduce_mean_overall(self, rng, n_dev):
        scales = LossScales(global_batch_size=8, n_devices=n_dev)
        x = rng.normal(size=(8, 3, 3, 3, 1)).astype(np.float32)
        got = float(reduce_mean_overall(scales, jnp.asarray(x)))
        want = _simulate_ref_reduce(x, n_dev, per_sample_axes=False)
        assert got == pytest.approx(want, rel=1e-5)


class TestElementary:
    def test_mae_mse_l4(self, rng):
        a = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        b = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        # single-device global mean semantics
        s1 = LossScales(global_batch_size=8, n_devices=1)
        assert float(MAE(s1, jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            np.abs(a - b).mean(), rel=1e-5
        )
        assert float(MSE(s1, jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            ((a - b) ** 2).mean(), rel=1e-5
        )
        assert float(L4(s1, jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            ((a - b) ** 4).mean(), rel=1e-4
        )


class TestClDice:
    def test_perfect_prediction_dice_zero(self):
        y = np.zeros((1, 9, 9, 9, 1), dtype=np.float32)
        y[0, 3:6, 3:6, :, 0] = 1.0
        d = float(soft_dice(jnp.asarray(y), jnp.asarray(y)))
        assert d == pytest.approx(0.0, abs=1e-3)

    def test_disjoint_prediction_dice_near_one(self):
        a = np.zeros((1, 9, 9, 9, 1), dtype=np.float32)
        b = np.zeros_like(a)
        a[0, :3, :, :, 0] = 1.0
        b[0, 6:, :, :, 0] = 1.0
        assert float(soft_dice(jnp.asarray(a), jnp.asarray(b))) > 0.97

    def test_cldice_perfect_low(self):
        y = np.zeros((1, 12, 12, 12, 1), dtype=np.float32)
        y[0, 5:8, 5:8, :, 0] = 1.0
        cl = float(soft_clDice_loss(jnp.asarray(y), jnp.asarray(y), iter_=5))
        assert cl < 0.05

    def test_combined_closure(self):
        y = np.zeros((2, 9, 9, 9, 1), dtype=np.float32)
        y[:, 4, 4, :, 0] = 1.0
        fn = soft_dice_cldice_loss(iters=3, alpha=0.5)
        assert float(fn(jnp.asarray(y), jnp.asarray(y))) == pytest.approx(0.0, abs=1e-2)

    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_grouped_matches_per_replica_simulation(self, rng, n_dev):
        """grouped clDice == mean of per-shard losses == reference's
        SUM(lambda/n_dev * loss_r) with lambda=1."""
        yt = (rng.uniform(size=(4, 6, 6, 6, 1)) > 0.5).astype(np.float32)
        yp = rng.uniform(size=(4, 6, 6, 6, 1)).astype(np.float32)
        got = float(soft_dice_cldice_grouped(jnp.asarray(yt), jnp.asarray(yp), groups=n_dev, iters=3))
        fn = soft_dice_cldice_loss(iters=3)
        shard_losses = [
            float(fn(jnp.asarray(s_t), jnp.asarray(s_p)))
            for s_t, s_p in zip(np.split(yt, n_dev), np.split(yp, n_dev))
        ]
        want = sum(shard_losses) / n_dev
        assert got == pytest.approx(want, rel=1e-5)


class TestCompositeLosses:
    def test_cycle_loss_types(self, rng):
        a = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        b = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        for typ in (None, "mse", "L4", "bce"):
            v = float(cycle_loss(SCALES, jnp.asarray(a), jnp.asarray(b), typ))
            assert np.isfinite(v)
        # lambda scaling
        assert float(cycle_loss(SCALES, jnp.asarray(a), jnp.asarray(b), "mse")) == pytest.approx(
            SCALES.lambda_cycle * float(MSE(SCALES, jnp.asarray(a), jnp.asarray(b))), rel=1e-5
        )

    def test_cycle_bce_identical_inputs_is_entropy_floor(self, rng):
        a = rng.uniform(-1, 1, size=(8, 4, 4, 4, 1)).astype(np.float32)
        v = float(cycle_loss(SCALES, jnp.asarray(a), jnp.asarray(a), "bce"))
        assert np.isfinite(v) and v > 0  # BCE(p, p) > 0 except at {0,1}

    def test_reconstruction_identical_near_zero(self, rng):
        a = rng.uniform(-1, 1, size=(4, 8, 8, 8, 1)).astype(np.float32)
        v = float(cycle_reconstruction(SCALES, jnp.asarray(a), jnp.asarray(a)))
        assert abs(v) < 0.05

    def test_seg_loss_perfect_low(self):
        y = np.zeros((8, 8, 8, 8, 1), dtype=np.float32)
        y[:, 3:5, 3:5, :, 0] = 1.0
        y = 2 * y - 1  # segmentation domain is ±1
        scales = LossScales(global_batch_size=8, n_devices=4, cldice_iters=3)
        v = float(cycle_seg_loss(scales, jnp.asarray(y), jnp.asarray(y)))
        assert v < 0.1 * scales.lambda_topology

    def test_identity_loss(self, rng):
        a = rng.uniform(-1, 1, size=(8, 4, 4, 4, 1)).astype(np.float32)
        b = rng.uniform(-1, 1, size=(8, 4, 4, 4, 1)).astype(np.float32)
        v = float(identity_loss(SCALES, jnp.asarray(a), jnp.asarray(b)))
        assert v == pytest.approx(SCALES.lambda_identity * float(MAE(SCALES, jnp.asarray(a), jnp.asarray(b))), rel=1e-5)
        v2 = float(identity_loss(SCALES, jnp.asarray(a), jnp.asarray(b), typ="cldice"))
        assert np.isfinite(v2)

    def test_lsgan_losses(self, rng):
        real = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        fake = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        s1 = LossScales(global_batch_size=8, n_devices=1)
        g = float(generator_loss_fn(s1, jnp.asarray(fake)))
        d = float(discriminator_loss_fn(s1, jnp.asarray(real), jnp.asarray(fake)))
        assert g == pytest.approx(((1 - fake) ** 2).mean(), rel=1e-5)
        assert d == pytest.approx(0.5 * (((1 - real) ** 2).mean() + (fake**2).mean()), rel=1e-5)
        # perfect discriminator: d -> 0
        ones, zeros = np.ones_like(real), np.zeros_like(fake)
        assert float(discriminator_loss_fn(s1, jnp.asarray(ones), jnp.asarray(zeros))) == pytest.approx(0.0)

    def test_bce_gan_losses_finite(self, rng):
        real = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        fake = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        for typ in ("bce", "bfce"):
            assert np.isfinite(float(generator_loss_fn(SCALES, jnp.asarray(fake), typ=typ)))
            assert np.isfinite(
                float(discriminator_loss_fn(SCALES, jnp.asarray(real), jnp.asarray(fake), typ=typ))
            )

    def test_wasserstein_losses(self, rng):
        # the reference's reduce_mean runs with NO axis here
        # (loss_functions.py:338,355), so the axis=None quirk scale applies:
        # value = -global_mean * n_devices / GLOBAL_BATCH
        s1 = LossScales(global_batch_size=8, n_devices=1)
        real = rng.normal(size=(8, 1)).astype(np.float32)
        fake = rng.normal(size=(8, 1)).astype(np.float32)
        g = float(wasserstein_generator_loss(s1, jnp.asarray(fake)))
        d = float(wasserstein_discriminator_loss(s1, jnp.asarray(real), jnp.asarray(fake)))
        assert g == pytest.approx(-fake.mean() / 8.0, rel=1e-5)
        assert d == pytest.approx(-(real - fake).mean() / 8.0, rel=1e-4)

    def test_gradient_penalty_linear_disc(self, rng):
        """For D(x) = sum(w*x) the input-gradient is w everywhere, so
        gp = (||w|| - 1)^2 * overall-quirk scale."""
        import jax

        w = 3.0  # D(x) = 3*sum(x) -> grad norm = 3*sqrt(N)
        real = rng.normal(size=(4, 2, 2, 2, 1)).astype(np.float32)
        fake = rng.normal(size=(4, 2, 2, 2, 1)).astype(np.float32)
        n = np.prod(real.shape[1:])
        s1 = LossScales(global_batch_size=4, n_devices=1)
        gp = float(
            gradient_penalty(
                s1, lambda x: w * jnp.sum(x, axis=(1, 2, 3, 4)), jnp.asarray(real), jnp.asarray(fake),
                jax.random.PRNGKey(0),
            )
        )
        want = (w * np.sqrt(n) - 1.0) ** 2 / 4.0  # axis=None quirk: mean/GB, n_dev=1
        assert gp == pytest.approx(want, rel=1e-4)
