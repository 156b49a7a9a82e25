from rlenv_tpu.train.checkpoint import CheckpointManager
from rlenv_tpu.train.metrics import MonitorWriter, TrainingLogWriter

__all__ = ["CheckpointManager", "MonitorWriter", "TrainingLogWriter"]
