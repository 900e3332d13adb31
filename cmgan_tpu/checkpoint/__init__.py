from cmgan_tpu.checkpoint.orbax_io import (
    restore_train_state,
    save_train_state,
    save_variables,
    restore_variables,
)

__all__ = [
    "restore_train_state",
    "save_train_state",
    "save_variables",
    "restore_variables",
]
