"""TrainState: the complete training state as one pytree.

Carries everything the reference kept as TF global variables (trainable
vars, optimizer slots, SN power vectors, BN statistics, loss moving
averages, global step, RNG) so one jitted step is fully pure and the whole
state checkpointable as a single Orbax item.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mmdgan_tpu.ops.losses import LossState

Array = jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]        # {'gen': ..., 'dis': ...}
    net_state: Dict[str, Any]     # SN power vectors + BN stats
    loss_state: LossState         # moving averages for mix/instance-noise
    opt_state_dis: Any
    opt_state_gen: Any
    step: Array                   # int32 global step
    rng: Array                    # PRNG key threaded through steps
