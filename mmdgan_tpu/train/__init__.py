"""Training runtime: TTUR optimizers, fused SPMD train step, Agent loop.

Rebuilds the reference's optimizer config + MySession/Agent runtime
(``GeneralTools/graph_func.py:446-575, 641-1219``) around one jitted
train step and Orbax checkpointing.
"""

from mmdgan_tpu.train.optim import (  # noqa: F401
    multi_opt_config,
    opt_config,
    with_bf16_slots,
)
from mmdgan_tpu.train.state import TrainState  # noqa: F401
from mmdgan_tpu.train.step import build_train_step, init_train_state  # noqa: F401
from mmdgan_tpu.train.trainer import Agent  # noqa: F401
