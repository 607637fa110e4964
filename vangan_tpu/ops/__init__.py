from vangan_tpu.ops.norms import (  # noqa: F401
    binarise,
    clip_images,
    min_max_norm,
    min_max_norm_np,
    rescale_arr,
    threshold_outliers,
    z_score_norm,
    z_score_norm_batch,
)
from vangan_tpu.ops.pad import reflect_pad  # noqa: F401
from vangan_tpu.ops.ssim import ssim3d_loss_map  # noqa: F401
from vangan_tpu.ops.morphology import (  # noqa: F401
    soft_dilate,
    soft_erode,
    soft_open,
    soft_skel,
)
