from vangan_tpu.monitor.tb import TBSummary  # noqa: F401
from vangan_tpu.monitor.gan_monitor import GanMonitor  # noqa: F401
