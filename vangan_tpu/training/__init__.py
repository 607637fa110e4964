from vangan_tpu.training.optimizers import make_lr_schedule, make_optimizer  # noqa: F401
from vangan_tpu.training.state import VanGanState  # noqa: F401
from vangan_tpu.training.step import TrainStepFns, make_step_fns  # noqa: F401
