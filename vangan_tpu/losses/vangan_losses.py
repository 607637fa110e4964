"""The VAN-GAN loss library (loss_functions.py re-derived for JAX).

Reduction contract
------------------
The reference's ``reduce_mean`` (loss_functions.py:8-22) computes a mean over
the given axes then divides by the *global* batch size; per-replica results are
then SUM-all-reduced across devices (vangan.py:459-473). Two behaviours result:

- per-sample axes (MAE/MSE/L4, loss_functions.py:42-83): the SUM of per-sample
  means over the global batch / GLOBAL_BATCH = true global mean. In this
  single-program global-batch formulation: ``reduce_mean_global``.
- ``axis=None`` (BCE cycle, SSIM recon, GP; loss_functions.py:190,205,377):
  each replica contributes mean(local)/GLOBAL_BATCH, so the all-reduced value
  is ``n_devices * global_mean / GLOBAL_BATCH`` (= global_mean / per-device
  batch). We reproduce that *exactly* (equal-sized shards make the average of
  shard means equal the global mean): ``reduce_mean_overall``.

These scale quirks are part of the reference's effective loss weighting and are
kept so loss values and training dynamics match.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from vangan_tpu.losses.cldice import soft_dice_cldice_grouped, soft_dice_cldice_loss
from vangan_tpu.ops.norms import min_max_norm
from vangan_tpu.ops.ssim import ssim3d_loss_map

_BCE_EPS = 1e-7  # keras backend epsilon


@dataclass(frozen=True)
class LossScales:
    """The cross-replica loss-scaling contract + lambda weights (vangan.py:25-34)."""

    global_batch_size: int
    n_devices: int
    lambda_cycle: float = 10.0
    lambda_identity: float = 5.0
    lambda_reconstruction: float = 5.0
    lambda_topology: float = 5.0
    cldice_iters: int = 15
    cldice_alpha: float = 0.5
    cldice_groups: Optional[int] = None  # defaults to n_devices
    use_pallas_skeleton: bool = False

    @property
    def groups(self) -> int:
        return self.cldice_groups if self.cldice_groups is not None else self.n_devices


def reduce_mean_global(scales: LossScales, x: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-sample means / global batch (loss_functions.py:8-22 with sample axes)."""
    axes = tuple(range(1, x.ndim))
    per_sample = jnp.mean(x, axis=axes) if axes else x
    return jnp.sum(per_sample) / scales.global_batch_size


def reduce_mean_overall(scales: LossScales, x: jnp.ndarray) -> jnp.ndarray:
    """All-reduced value of the reference's ``reduce_mean(..., axis=None)`` quirk.

    Per replica: mean(local)/GLOBAL_BATCH; SUM over replicas == n_devices *
    global_mean / GLOBAL_BATCH (exact for equal shards).
    """
    return jnp.mean(x) * scales.n_devices / scales.global_batch_size


# --- elementary distances (loss_functions.py:26-83) ---


def MSLE(scales: LossScales, real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    return reduce_mean_global(scales, jnp.square(jnp.log(real + 1.0) - jnp.log(fake + 1.0)))


def MAE(scales: LossScales, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return reduce_mean_global(scales, jnp.abs(y_true - y_pred))


def MSE(scales: LossScales, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return reduce_mean_global(scales, jnp.square(y_true - y_pred))


def L4(scales: LossScales, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return reduce_mean_global(scales, jnp.power(y_true - y_pred, 4))


def bce_elementwise(y_true: jnp.ndarray, y_prob: jnp.ndarray) -> jnp.ndarray:
    """Keras BinaryCrossentropy(from_logits=False, reduction=NONE): per-element BCE
    with probability clipping, averaged over the trailing (channel) axis."""
    p = jnp.clip(y_prob, _BCE_EPS, 1.0 - _BCE_EPS)
    bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    return jnp.mean(bce, axis=-1)


def bce_from_logits(y_true: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Keras BinaryCrossentropy(from_logits=True, reduction=NONE)."""
    bce = jnp.maximum(logits, 0.0) - logits * y_true + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(bce, axis=-1)


def bfce_from_logits(y_true: jnp.ndarray, logits: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """Keras BinaryFocalCrossentropy(from_logits=True) defaults: gamma=2, no class balancing."""
    p = jax.nn.sigmoid(logits)
    p_t = y_true * p + (1.0 - y_true) * (1.0 - p)
    bce = jnp.maximum(logits, 0.0) - logits * y_true + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(jnp.power(1.0 - p_t, gamma) * bce, axis=-1)


# --- composite VAN-GAN losses ---


def cycle_loss(
    scales: LossScales, real_image: jnp.ndarray, cycled_image: jnp.ndarray, typ: Optional[str] = None
) -> jnp.ndarray:
    """Cycle-consistency loss (loss_functions.py:164-190).

    typ=None: MAE; 'mse': MSE; 'L4': L4 — all x lambda_cycle with per-sample
    reduction. Fallback (the 'bce' branch used for the S->I->S cycle,
    vangan.py:302): per-sample min-max to [0,1], probability BCE, overall-mean
    reduction quirk.
    """
    if typ is None:
        return MAE(scales, real_image, cycled_image) * scales.lambda_cycle
    if typ == "mse":
        return MSE(scales, real_image, cycled_image) * scales.lambda_cycle
    if typ == "L4":
        return L4(scales, real_image, cycled_image) * scales.lambda_cycle
    axes = tuple(range(1, real_image.ndim))
    real = min_max_norm(real_image, axis=axes)
    cycled = min_max_norm(cycled_image, axis=axes)
    return reduce_mean_overall(scales, bce_elementwise(real, cycled)) * scales.lambda_cycle


def cycle_reconstruction(
    scales: LossScales, real_image: jnp.ndarray, cycled_image: jnp.ndarray
) -> jnp.ndarray:
    """SSIM reconstruction loss on per-sample min-max-normalised volumes
    (loss_functions.py:194-208); overall-mean reduction quirk; x lambda_reconstruction."""
    axes = tuple(range(1, real_image.ndim))
    loss_map = ssim3d_loss_map(
        min_max_norm(real_image, axis=axes), min_max_norm(cycled_image, axis=axes), max_val=1.0
    )
    return reduce_mean_overall(scales, loss_map) * scales.lambda_reconstruction


def cycle_seg_loss(
    scales: LossScales, real_image: jnp.ndarray, cycled_image: jnp.ndarray
) -> jnp.ndarray:
    """Topology (dice+clDice) segmentation cycle loss (loss_functions.py:212-226).

    The reference computes the loss over each replica's local batch and scales
    by lambda_topology/n_devices before the SUM all-reduce — i.e. lambda x the
    mean of per-shard losses; reproduced via grouped evaluation.
    """
    axes = tuple(range(1, real_image.ndim))
    real = min_max_norm(real_image, axis=axes)
    cycled = min_max_norm(cycled_image, axis=axes)
    per = soft_dice_cldice_grouped(
        real, cycled, groups=scales.groups, iters=scales.cldice_iters,
        alpha=scales.cldice_alpha, use_pallas=scales.use_pallas_skeleton,
    )
    return per * scales.lambda_topology


def identity_loss(
    scales: LossScales, real_image: jnp.ndarray, same_image: jnp.ndarray, typ: Optional[str] = None
) -> jnp.ndarray:
    """Identity loss (loss_functions.py:230-252): MAE x lambda_identity, or
    'cldice' variant on globally min-max-normalised tensors. Present but
    disabled in the reference's default path (vangan.py:310-312)."""
    if typ is None:
        return scales.lambda_identity * MAE(scales, real_image, same_image)
    if typ == "cldice":
        real = min_max_norm(real_image)
        same = min_max_norm(same_image)
        loss_fn = soft_dice_cldice_loss(iters=scales.cldice_iters, alpha=scales.cldice_alpha)
        return reduce_mean_overall(scales, loss_fn(real, same)) * scales.lambda_identity
    raise ValueError(f"unknown identity loss type {typ!r}")


def generator_loss_fn(
    scales: LossScales, fake_image: jnp.ndarray, typ: Optional[str] = None, from_logits: bool = True
) -> jnp.ndarray:
    """Adversarial generator loss (loss_functions.py:256-286).

    Default (typ=None, used by vangan.py:329-330): LSGAN MSE(1, D(fake)) on raw
    patch logits with per-sample reduction.
    """
    if typ is None:
        return MSE(scales, jnp.ones_like(fake_image), fake_image)
    if typ not in ("bce", "bfce"):
        raise ValueError(f"unknown generator loss type {typ!r}")
    fake = fake_image
    if from_logits:
        fn = bce_from_logits if typ == "bce" else bfce_from_logits
    else:
        # min-max the logits to [0,1] probabilities first (loss_functions.py:283-284)
        fake = min_max_norm(fake, axis=tuple(range(1, fake.ndim)))
        fn = bce_elementwise
    loss = fn(jnp.ones_like(fake), fake)
    return reduce_mean_overall(scales, loss)


def discriminator_loss_fn(
    scales: LossScales,
    real_image: jnp.ndarray,
    fake_image: jnp.ndarray,
    typ: Optional[str] = None,
    from_logits: bool = True,
) -> jnp.ndarray:
    """Adversarial discriminator loss (loss_functions.py:290-322).

    Default (typ=None, used by vangan.py:331-332): LSGAN
    0.5*[MSE(1, D(real)) + MSE(0, D(fake))] with per-sample reduction.
    """
    if typ is None:
        return 0.5 * (
            MSE(scales, jnp.ones_like(real_image), real_image)
            + MSE(scales, jnp.zeros_like(fake_image), fake_image)
        )
    real, fake = real_image, fake_image
    if not from_logits:
        real = min_max_norm(real)
        fake = min_max_norm(fake)
        fn = bce_elementwise
    else:
        fn = bce_from_logits if typ == "bce" else bfce_from_logits
    loss = (fn(jnp.ones_like(real), real) + fn(jnp.zeros_like(fake), fake)) * 0.5
    return reduce_mean_overall(scales, loss)


def wasserstein_generator_loss(scales: LossScales, prob_fake_is_real: jnp.ndarray) -> jnp.ndarray:
    """-E[D(fake)] (loss_functions.py:341-355).

    The reference calls ``reduce_mean`` with NO axis (loss_functions.py:355),
    so the axis=None scale quirk applies: the all-reduced value is
    ``-global_mean / per_device_batch``, not ``-global_mean`` (TF-golden-tested
    in tests/test_reference_golden.py)."""
    return -reduce_mean_overall(scales, prob_fake_is_real)


def wasserstein_discriminator_loss(
    scales: LossScales, prob_real_is_real: jnp.ndarray, prob_fake_is_real: jnp.ndarray
) -> jnp.ndarray:
    """-E[D(real) - D(fake)] (loss_functions.py:325-338); axis=None quirk as above."""
    return -reduce_mean_overall(scales, prob_real_is_real - prob_fake_is_real)


def gradient_penalty(
    scales: LossScales,
    disc_apply: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """WGAN-GP gradient penalty (vangan.py:355-378).

    Reference quirks preserved: interpolation weights drawn from a *normal*
    distribution (vangan.py:367, not the uniform of Gulrajani et al.), and the
    1e-12 stabiliser inside the norm. Reference divergence: the reference
    routes both domains through ``disc_S`` due to a descrip typo
    (vangan.py:370-373 checks 'I' but is called with 'A'/'B'); we apply the
    penalty with the *matching* discriminator via ``disc_apply``.
    ``reduce_mean`` axis=None quirk applies (vangan.py:377).
    """
    bshape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.normal(rng, bshape, dtype=real.dtype)
    interpolated = real + alpha * (fake - real)

    def disc_sum(x):
        return jnp.sum(disc_apply(x))

    grads = jax.grad(disc_sum)(interpolated)
    axes = tuple(range(1, real.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(grads), axis=axes) + 1.0e-12)
    return reduce_mean_overall(scales, (norm - 1.0) ** 2)
