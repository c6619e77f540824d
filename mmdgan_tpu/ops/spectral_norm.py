"""Spectral normalization via power iteration on the layer operator (PICO).

Functional JAX rebuild of the reference ``SpectralNorm`` class
(``GeneralTools/math_func.py:397-749``), which generalizes Miyato-style
spectral normalization from the reshaped kernel matrix to *any linear op*:
the forward/backward pair of the power iteration are the layer's actual
conv / conv-transpose / matmul, so the sigma normalized away is the true
operator norm of the layer including stride/padding effects.

TPU-native design decisions:

- The adjoint operator is obtained from ``jax.vjp`` of the forward op
  (exact transpose of any linear map) rather than hand-written
  conv-transpose calls; this guarantees the fwd/bwd pair is a conjugate
  pair for every op/stride/padding combination — the property the
  reference establishes manually (math_func.py:604-637).
- The persistent power vector (the reference's non-trainable ``in_rand``
  variable updated through UPDATE_OPS, math_func.py:565-567, 744) is
  explicit functional state: ``apply`` returns ``(sigma, new_state)`` and
  the train step threads the state pytree.
- Side selection: the power vector lives in the smaller of the layer's
  input/output spaces (math_func.py:483-514 ``use_u``), halving iteration
  memory/FLOPs.
- Closed-form shortcuts for rank-1 cases (math_func.py:700-721).

Semantics preserved: one iteration per training step; ``sigma`` keeps its
gradient path to the kernel while the power vector update is
``stop_gradient``-ed (matching the TF UPDATE_OPS assign semantics where
the variable read happens before the assign).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

EPSI = 1e-10

Array = jnp.ndarray
_DIMSPEC = ("NHWC", "HWIO", "NHWC")


@dataclasses.dataclass(frozen=True)
class SnDef:
    """Static description of the linear op to be normalized.

    Mirrors the reference ``sn_def`` dict (math_func.py:431-443), in NHWC.

    op:
      'd'       dense [num_in, num_out]
      'project' projection kernel [num_class, num_in] treated as a matrix
      'c'       conv, kernel [k, k, C_in, C_out] (HWIO)
      'tc'      transpose conv, kernel [k, k, C_in, C_out] (HWIO,
                jax.lax.conv_transpose convention)
      'cd'      per-class dense [num_class, num_in, num_out]
      'dcd'     dense + conditional dense (kernel is a 2-tuple)
      'dck'     dense * (1 + per-class scale) (kernel is a 2-tuple)
      'cck'     conv * (1 + per-class channel scale) (kernel is a 2-tuple)
      'tcck'    transpose conv * (1 + per-class channel scale)
    input_shape / output_shape: per-example shapes WITHOUT the batch dim —
      (H, W, C) for conv ops, (num_features,) for dense ops.
    """

    op: str
    input_shape: Tuple[int, ...] = ()
    output_shape: Tuple[int, ...] = ()
    strides: int = 1
    dilation: int = 1
    padding: str = "SAME"
    num_class: int = 0


def _conv(v: Array, w: Array, sn: SnDef) -> Array:
    if sn.dilation > 1:
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(1, 1), padding=sn.padding,
            rhs_dilation=(sn.dilation, sn.dilation), dimension_numbers=_DIMSPEC,
        )
    return jax.lax.conv_general_dilated(
        v, w, window_strides=(sn.strides, sn.strides), padding=sn.padding,
        dimension_numbers=_DIMSPEC,
    )


def _conv_t(v: Array, w: Array, sn: SnDef) -> Array:
    return jax.lax.conv_transpose(
        v, w, strides=(sn.strides, sn.strides), padding=sn.padding,
        rhs_dilation=(sn.dilation, sn.dilation) if sn.dilation > 1 else None,
        dimension_numbers=_DIMSPEC,
    )


def _forward_op(sn: SnDef, kernel):
    """The layer's linear map F: input space -> output space (batched)."""
    if sn.op in ("d",):
        return lambda v: v @ kernel
    if sn.op == "project":
        # treat the [num_class, num_in] kernel as a plain matrix mapping
        # num_in -> num_class (math_func.py:477-486 handles it as 'd')
        return lambda v: v @ kernel.T
    if sn.op == "c":
        return lambda v: _conv(v, kernel, sn)
    if sn.op == "tc":
        return lambda v: _conv_t(v, kernel, sn)
    if sn.op == "cd":
        # v: [num_class, 1, num_in]; kernel: [num_class, num_in, num_out]
        return lambda v: jnp.einsum("cbn,cnm->cbm", v, kernel)
    if sn.op == "dcd":
        w = kernel[0][None, :, :] + kernel[1]
        return lambda v: jnp.einsum("cbn,cnm->cbm", v, w)
    if sn.op == "dck":
        # v: [num_class, num_in]; scale: [num_class, num_out]
        return lambda v: (v @ kernel[0]) * (1.0 + kernel[1])
    if sn.op == "cck":
        # v: [num_class, H, W, C_in]; per-class scale [num_class, 1, 1, C_out]
        return lambda v: _conv(v, kernel[0], sn) * (1.0 + kernel[1])
    if sn.op == "tcck":
        return lambda v: _conv_t(v, kernel[0], sn) * (1.0 + kernel[1])
    raise NotImplementedError(f"SpectralNorm: op {sn.op} not supported")


def _batched(sn: SnDef) -> int:
    """Leading dim of the power vector: 1, or num_class for conditional ops."""
    return sn.num_class if sn.op in ("cd", "dcd", "dck", "cck", "tcck") else 1


def _norm(sn: SnDef, x: Array) -> Array:
    """Per-class or global l2 norm (math_func.py:639-651)."""
    if sn.op in ("cd", "dcd"):
        return jnp.linalg.norm(x, axis=2, keepdims=True)  # [C,1,1]
    if sn.op == "dck":
        return jnp.linalg.norm(x, axis=1, keepdims=True)  # [C,1]
    if sn.op in ("cck", "tcck"):
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2, 3), keepdims=True))
    return jnp.linalg.norm(x.reshape(-1))  # scalar


def _l2n(sn: SnDef, x: Array) -> Array:
    return x / (_norm(sn, x) + EPSI)


def _x_shape(sn: SnDef) -> Tuple[int, ...]:
    """Shape of the persistent power vector: lives in the smaller space."""
    b = _batched(sn)
    use_u = int(np.prod(sn.input_shape)) <= int(np.prod(sn.output_shape))
    space = sn.input_shape if use_u else sn.output_shape
    return (b,) + tuple(space)


def _use_u(sn: SnDef) -> bool:
    return int(np.prod(sn.input_shape)) <= int(np.prod(sn.output_shape))


def _closed_form(sn: SnDef, kernel) -> Optional[Array]:
    """Rank-1 shortcuts (math_func.py:700-721)."""
    if sn.op in ("d", "project"):
        shape = kernel.shape
        if 1 in shape:
            return jnp.linalg.norm(kernel.reshape(-1))
    elif sn.op == "cd":
        shape = kernel.shape
        if len(shape) == 2:  # [num_class, num_in] == per-class row vectors
            return jnp.linalg.norm(kernel, axis=1, keepdims=True)
        if shape[1] == 1 or shape[2] == 1:
            return jnp.sqrt(jnp.sum(jnp.square(kernel), axis=(1, 2), keepdims=True))
    elif sn.op == "dcd":
        d_shape = kernel[0].shape
        if 1 in d_shape:
            cd = kernel[1] if kernel[1].ndim == 3 else kernel[1][:, :, None]
            comb = kernel[0][None, :, :] + cd
            return jnp.sqrt(jnp.sum(jnp.square(comb), axis=(1, 2), keepdims=True))
    elif sn.op == "dck":
        if kernel[0].shape[1] == 1:
            return jnp.linalg.norm(kernel[0].reshape(-1)) * jnp.abs(kernel[1])
    return None


def spectral_norm_init(key: Array, sn: SnDef) -> Array:
    """Initialize the persistent power vector (truncated normal, matching
    math_func.py:565-567)."""
    shape = _x_shape(sn)
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def spectral_norm_apply(
    kernel,
    x_state: Array,
    sn: SnDef,
    num_iter: int = 1,
) -> Tuple[Array, Array]:
    """One (or more) power-iteration step(s); returns (sigma, new_x_state).

    ``sigma`` is differentiable w.r.t. ``kernel``; the state update is
    stop-gradiented. With ``num_iter > 1`` only the final application
    carries gradient (the training configuration is always num_iter=1,
    layer_func.py:798).
    """
    closed = _closed_form(sn, kernel)
    if closed is not None:
        return closed, x_state

    F = _forward_op(sn, kernel)

    if _use_u(sn):
        def G(v):
            return F(v)

        def GT(y):
            zeros = jnp.zeros_like(x_state)
            _, vjp = jax.vjp(F, zeros)
            return vjp(y)[0]
    else:
        # power vector lives in the output space; G maps output -> input
        def G(v):
            zeros_in = jnp.zeros((v.shape[0],) + tuple(sn.input_shape), v.dtype)
            _, vjp = jax.vjp(F, zeros_in)
            return vjp(v)[0]

        def GT(y):
            return F(y)

    x = jax.lax.stop_gradient(x_state)
    # warm-up iterations without gradient
    for _ in range(max(num_iter - 1, 0)):
        y = _l2n(sn, G(x))
        x = _l2n(sn, GT(y))
        x = jax.lax.stop_gradient(x)
    # final iteration: sigma keeps its gradient path to the kernel
    gx = G(x)
    sigma = _norm(sn, gx)
    y = _l2n(sn, gx)
    x_new = jax.lax.stop_gradient(_l2n(sn, GT(y)))
    if sn.op in ("d", "project", "c", "tc"):
        sigma = jnp.squeeze(sigma)
    return sigma, x_new


def spectral_norm_pim_apply(
    kernel: Array, x_state: Array, num_iter: int = 1
) -> Tuple[Array, Array]:
    """PIM mode: power iteration on the kernel reshaped to a matrix
    (layer_func.py:811-814, the Miyato sn_paper approach)."""
    w = kernel.reshape(-1, kernel.shape[-1])
    sn = SnDef(op="d", input_shape=(w.shape[0],), output_shape=(w.shape[1],))
    return spectral_norm_apply(w, x_state, sn, num_iter=num_iter)


def spectral_norm_pim_init(key: Array, kernel_shape: Sequence[int]) -> Array:
    num_in = int(np.prod(kernel_shape[:-1]))
    num_out = int(kernel_shape[-1])
    sn = SnDef(op="d", input_shape=(num_in,), output_shape=(num_out,))
    return spectral_norm_init(key, sn)


class SpectralNorm:
    """Object-style convenience wrapper mirroring the reference usage.

    Example::

        sn = SpectralNorm(SnDef(op='c', input_shape=(32, 32, 64),
                                output_shape=(16, 16, 128), strides=2))
        state = sn.init(jax.random.PRNGKey(0))
        sigma, state = sn.apply(w, state, num_iter=20)
    """

    def __init__(self, sn_def: SnDef, num_iter: int = 1):
        self.sn_def = sn_def
        self.num_iter = num_iter

    def init(self, key: Array) -> Array:
        return spectral_norm_init(key, self.sn_def)

    def apply(self, kernel, x_state: Array, num_iter: Optional[int] = None):
        return spectral_norm_apply(
            kernel, x_state, self.sn_def,
            num_iter=self.num_iter if num_iter is None else num_iter,
        )
