from .loop import Trainer, make_train_step, partition_params  # noqa: F401
from .checkpoints import CheckpointStore  # noqa: F401
