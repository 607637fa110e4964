from vangan_tpu.data.pipeline import VanGanDataset  # noqa: F401
from vangan_tpu.data.preprocess import DataPreprocessor  # noqa: F401
