from vangan_tpu.inference.stitcher import stitch_origins, stitch_subvolumes  # noqa: F401
from vangan_tpu.inference.mapping import epoch_sweep, run_mapping  # noqa: F401
