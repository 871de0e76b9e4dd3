from pcc_tpu.train.state import TrainState, create_train_state
from pcc_tpu.train.steps import build_train_step
from pcc_tpu.train.checkpoint import (
    save_checkpoint,
    load_latest_checkpoint,
    export_inference_params,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "build_train_step",
    "save_checkpoint",
    "load_latest_checkpoint",
    "export_inference_params",
]
