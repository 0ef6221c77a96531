"""Training subsystem: train state, supervised loss assembly, trainer loop,
checkpointing, metric logging."""

from polardepth_tpu.train.state import TrainState, create_train_state
from polardepth_tpu.train.losses import supervised_losses, preprocess_batch
from polardepth_tpu.train.trainer import Trainer
