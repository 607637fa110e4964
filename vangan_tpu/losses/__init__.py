from vangan_tpu.losses.cldice import (  # noqa: F401
    soft_clDice_loss,
    soft_dice,
    soft_dice_cldice_loss,
)
from vangan_tpu.losses.vangan_losses import (  # noqa: F401
    L4,
    MAE,
    MSE,
    MSLE,
    LossScales,
    bce_elementwise,
    cycle_loss,
    cycle_reconstruction,
    cycle_seg_loss,
    discriminator_loss_fn,
    generator_loss_fn,
    gradient_penalty,
    identity_loss,
    reduce_mean_global,
    reduce_mean_overall,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)
