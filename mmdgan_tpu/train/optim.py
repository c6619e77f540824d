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
    bf16_moments: bool = False,
) -> optax.GradientTransformation:
    """One optimizer (graph_func.py:478-537).

    ``bf16_moments=True`` stores the optimizer slot buffers (Adam m/v,
    momentum, RMS) in bfloat16 — halves the slots' HBM and their
    read/write bandwidth per step (measured ~6% step-time win on the
    CIFAR SNGAN, see docs/perf_notes.md). OFF by default: the default
    f32 slots are the strict-TF1-parity mode (bf16's 8-bit mantissa
    perturbs the moment EMAs at roundoff level)."""
    opt = _opt_config_f32(initial_lr, lr_decay_steps, end_lr, optimizer,
                          target_step)
    return with_bf16_slots(opt) if bf16_moments else opt


def _opt_config_f32(
    initial_lr: float,
    lr_decay_steps: Optional[int] = None,
    end_lr: float = 1e-7,
    optimizer: str = "adam",
    target_step: float = 1e5,
) -> optax.GradientTransformation:
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
    if optimizer in ("adam_tf1",):
        return adam_tf1(initial_lr, b1=0.5, b2=0.999, eps=1e-8)
    if optimizer in ("RMSProp", "rmsprop"):
        return optax.rmsprop(initial_lr, decay=0.9, momentum=0.0, eps=1e-10)
    raise ValueError(f"Optimizer {optimizer} not supported.")


def adam_tf1(
    learning_rate: float, b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam with TF1's exact update rule (tf.train.AdamOptimizer):

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        w   -= lr_t * m_t / (sqrt(v_t) + eps)

    differs from optax.adam in the epsilon placement (TF1 adds eps to the
    *uncorrected* sqrt(v)), which matters for near-zero gradients. Use for
    strict step-level parity with the reference (verified in
    tests/test_tf1_train_step_crossval.py)."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return {"m": zeros(), "v": zeros(), "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["v"], grads)
        lr_t = learning_rate * jnp.sqrt(1.0 - b2 ** t.astype(jnp.float32)) / (
            1.0 - b1 ** t.astype(jnp.float32))
        updates = jax.tree.map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), m, v)
        return updates, {"m": m, "v": v, "t": t}

    return optax.GradientTransformation(init, update)


def with_bf16_slots(opt: optax.GradientTransformation) -> optax.GradientTransformation:
    """Store an optimizer's float32 slot buffers in bfloat16.

    The slots (Adam's m/v, momentum, RMS accumulators) are pure
    bandwidth: read + written once per step, never matmul'd. bf16 halves
    that traffic on an HBM-roofline-bound step. Compute still happens in
    f32 — state is upcast before the wrapped update and downcast after —
    so only the *storage* precision changes. Schedule counters and other
    non-f32 leaves pass through untouched."""
    import jax
    import jax.numpy as jnp

    def _cast(tree, src, dst):
        return jax.tree.map(
            lambda x: x.astype(dst)
            if hasattr(x, "dtype") and x.dtype == src else x,
            tree,
        )

    def init(params):
        return _cast(opt.init(params), jnp.float32, jnp.bfloat16)

    def update(grads, state, params=None):
        updates, new_state = opt.update(
            grads, _cast(state, jnp.bfloat16, jnp.float32), params)
        return updates, _cast(new_state, jnp.float32, jnp.bfloat16)

    return optax.GradientTransformation(init, update)


def multi_opt_config(
    lr_list: Sequence[float],
    lr_decay_steps: Optional[int] = None,
    end_lr: float = 1e-7,
    optimizer: Union[str, Sequence[str]] = "adam",
    target_step: float = 1e5,
    bf16_moments: bool = False,
) -> List[optax.GradientTransformation]:
    """One optimizer per net for TTUR (graph_func.py:540-575);
    index 0 = discriminator, index 1 = generator (my_sngan.py:413)."""
    num_opt = len(lr_list)
    if isinstance(optimizer, str):
        optimizer = [optimizer] * num_opt
    elif len(optimizer) == 1:
        optimizer = list(optimizer) * num_opt
    return [
        opt_config(lr_list[i], lr_decay_steps, end_lr, optimizer[i],
                   target_step, bf16_moments=bf16_moments)
        for i in range(num_opt)
    ]
