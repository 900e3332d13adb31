from cmgan_tpu.train.loop import Trainer
from cmgan_tpu.train.state import TrainState, init_train_state, make_optimizers
from cmgan_tpu.train.steps import make_train_steps, pesq_labels_host

__all__ = [
    "Trainer",
    "TrainState",
    "init_train_state",
    "make_optimizers",
    "make_train_steps",
    "pesq_labels_host",
]
