from rtmodt_tpu.training.train_step import TrainState, create_train_state, train_step  # noqa: F401
from rtmodt_tpu.training.loss import yolo_loss  # noqa: F401
