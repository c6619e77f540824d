"""Optimizer configuration on optax.

Rebuild of ``opt_config`` / ``multi_opt_config``
(``GeneralTools/graph_func.py:478-575``): per-optimizer learning-rate
schedules — SGD/momentum exponential decay to ``end_lr`` over
``target_step``; Adam(beta1=0.5, beta2=0.999, eps=1e-8) with constant lr
(the GAN-standard TTUR configuration, graph_func.py:525-526); RMSProp
(decay=0.9, eps=1e-10).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import optax


def opt_config(
    initial_lr: float,
    lr_decay_steps: Optional[int] = None,
    end_lr: float = 1e-7,
    optimizer: str = "adam",
    target_step: float = 1e5,
) -> optax.GradientTransformation:
    """One optimizer (graph_func.py:478-537)."""
    if optimizer in ("SGD", "sgd", "Momentum", "momentum"):
        if lr_decay_steps is None:
            lr_decay_steps = int(
                np.round(target_step * np.log(0.96) / np.log(end_lr / initial_lr))
            )
        schedule = optax.exponential_decay(
            init_value=initial_lr,
            transition_steps=lr_decay_steps,
            decay_rate=0.96,
            staircase=False,
        )
        if optimizer in ("SGD", "sgd"):
            return optax.sgd(schedule)
        return optax.sgd(schedule, momentum=0.9)
    if optimizer in ("Adam", "adam"):
        return optax.adam(initial_lr, b1=0.5, b2=0.999, eps=1e-8)
    if optimizer in ("RMSProp", "rmsprop"):
        return optax.rmsprop(initial_lr, decay=0.9, momentum=0.0, eps=1e-10)
    raise ValueError(f"Optimizer {optimizer} not supported.")


def multi_opt_config(
    lr_list: Sequence[float],
    lr_decay_steps: Optional[int] = None,
    end_lr: float = 1e-7,
    optimizer: Union[str, Sequence[str]] = "adam",
    target_step: float = 1e5,
) -> List[optax.GradientTransformation]:
    """One optimizer per net for TTUR (graph_func.py:540-575);
    index 0 = discriminator, index 1 = generator (my_sngan.py:413)."""
    num_opt = len(lr_list)
    if isinstance(optimizer, str):
        optimizer = [optimizer] * num_opt
    elif len(optimizer) == 1:
        optimizer = list(optimizer) * num_opt
    return [
        opt_config(lr_list[i], lr_decay_steps, end_lr, optimizer[i], target_step)
        for i in range(num_opt)
    ]
