"""Joint AE+prob training state (optax Adam, jointly optimized as in
reference train.py:132-135)."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from pcc_tpu.codec import init_params
from pcc_tpu.config import CodecConfig


@struct.dataclass
class TrainState:
    params: Any                 # {"ae": ..., "prob": ...}
    opt_state: Any
    step: int

    def apply_gradients(self, grads, tx):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
        )


def make_optimizer(lr: float, lr_decay: float, lr_decay_steps: int,
                   max_steps: int) -> optax.GradientTransformation:
    """Adam with the reference's step-decay schedule (train.py:241-245:
    lr *= lr_decay every lr_decay_steps)."""
    boundaries = {
        s: lr_decay
        for s in range(lr_decay_steps, max_steps + 1, lr_decay_steps)
    }
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    return optax.adam(schedule)


def create_train_state(key: jax.Array, cfg: CodecConfig,
                       tx: optax.GradientTransformation) -> TrainState:
    ae_params, prob_params = init_params(key, cfg)
    params = {"ae": ae_params, "prob": prob_params}
    return TrainState(params=params, opt_state=tx.init(params), step=0)
