"""Weight / bias initializers per activation function.

Rebuild of ``GeneralTools/layer_func.py:14-100``: variance-scaling scale
factors chosen per activation (relu 2.0 fan_in, lrelu 2/1.01 fan_in,
sigmoid 16 fan_avg uniform, else xavier fan_avg uniform), the SN-paper
truncated-normal(0.02) mode, and an SVD-normalized initializer.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _fans(shape: Sequence[int], transpose_conv: bool = False):
    """fan_in/fan_out following TF variance_scaling conventions.

    For dense [in, out]: (in, out). For conv HWIO [k,k,I,O]:
    (k*k*I, k*k*O). The reference's transpose-conv kernels are laid out
    [k,k,out,in] in TF, so TF computed fan_in over the *output* channels
    (layer_func.py:595 + TF _compute_fans); we mirror that by swapping for
    transpose conv.
    """
    shape = list(shape)
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        fan_in, fan_out = shape
    else:
        receptive = int(np.prod(shape[:-2]))
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    if transpose_conv:
        fan_in, fan_out = fan_out, fan_in
    return fan_in, fan_out


def weight_initializer(act_fun: str, init_w_scale: float = 1.0, mode: str = "default"):
    """Return init_fn(key, shape, dtype, transpose_conv=False) -> Array.

    Mirrors ``weight_initializer`` (layer_func.py:14-66).
    """

    def init(key, shape, dtype=jnp.float32, transpose_conv=False):
        if mode == "default":
            if init_w_scale == 0.0:
                return jnp.zeros(shape, dtype)
            fan_in, fan_out = _fans(shape, transpose_conv)
            if act_fun == "relu":
                scale, fan, dist = 2.0 * init_w_scale, fan_in, "normal"
            elif act_fun == "lrelu":  # assume alpha = 0.1
                scale, fan, dist = 2.0 / 1.01 * init_w_scale, fan_in, "normal"
            elif act_fun == "sigmoid":
                scale, fan, dist = 16.0 * init_w_scale, (fan_in + fan_out) / 2.0, "uniform"
            else:  # xavier
                scale, fan, dist = 1.0 * init_w_scale, (fan_in + fan_out) / 2.0, "uniform"
            if dist == "normal":
                std = np.sqrt(scale / fan)
                return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
            limit = np.sqrt(3.0 * scale / fan)
            return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)
        elif mode == "sn_paper":
            # spectral-norm paper: truncated_normal(stddev=0.02)
            return 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        elif mode == "pg_paper":
            # progressive-GAN: unit normal; runtime multiplier rescales
            return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        raise NotImplementedError(f"initializer {mode} not implemented")

    return init


def bias_initializer(init_b_scale: float = 0.0):
    """Bias init (layer_func.py:69-80): zeros, or tiny truncated normal."""

    def init(key, shape, dtype=jnp.float32):
        if init_b_scale == 0.0:
            return jnp.zeros(shape, dtype)
        return init_b_scale * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def sn_variable_initializer(key, shape, dtype=jnp.float32):
    """SVD-normalized initializer (layer_func.py:84-100): unit-normal kernel
    divided by its top singular value (as a reshaped matrix)."""
    w = jax.random.normal(key, shape, dtype)
    mat = w.reshape(-1, shape[-1]) if len(shape) > 2 else w
    sigma = jnp.linalg.svd(mat, compute_uv=False)[0]
    return w / (sigma + 1e-10)
