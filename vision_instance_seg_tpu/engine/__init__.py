"""Training / evaluation / serving engine."""

from vision_instance_seg_tpu.engine.trainer import (  # noqa: F401
    Trainer, TrainState, create_train_state, make_train_step)
