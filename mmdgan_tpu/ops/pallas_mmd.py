"""Fused Pallas TPU kernel for the repulsive MMD loss.

One ``pallas_call`` takes the two score matrices (B x d, e.g. 64 x 16)
and emits the off-diagonal kernel means the rep/rmb losses are built
from — Gram matrices, distance matrices, exponentials and masked
reductions all stay in VMEM, nothing is materialized in HBM
(SURVEY.md §7 stage 1; at B=64 this is a fusion/latency win, not a
memory necessity).

Implementation notes:
- Scores are zero-padded to the 128-lane width; zero columns change
  neither dot products nor squared norms, so distances are exact without
  masking.
- The backward pass is the analytic gradient expressed in plain JAX
  (a custom_vjp over the same e_k reductions); XLA fuses it into the
  surrounding step. The forward is the latency-critical part (it sits
  between the two discriminator passes).
- On non-TPU backends the kernel runs in interpreter mode, so the public
  functions work everywhere (tests run on CPU).

Behavioral parity: matches ``mmd_g`` / ``mmd_g_bounded``
(math_func.py:1288-1431) with ``custom_weights``; validated against the
reference implementations in tests/test_pallas_mmd.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_LANES = 128
_SUBLANES = 8


def _pad_scores(s: Array) -> Array:
    b, d = s.shape
    b_pad = (-b) % _SUBLANES
    d_pad = (-d) % _LANES
    if b_pad or d_pad:
        s = jnp.pad(s, ((0, b_pad), (0, d_pad)))
    return s


def _kernel_means_kernel(bounds_ref, sg_ref, sx_ref, out_ref, *, batch: int):
    """Compute the six off-diagonal kernel means.

    bounds_ref: SMEM (1, 3) = (inv_two_sigma2, lower_bound, upper_bound)
    sg_ref, sx_ref: VMEM [B_pad, d_pad] zero-padded scores (gen, data)
    out_ref: SMEM (1, 8) — means written at [0, 0..5]:
        (e_kxx, e_kxy, e_kyy, e_kxx_b, e_kxy_b, e_kyy_b)
    where xx = gen-gen, xy = gen-data, yy = data-data.
    """
    inv2s2 = bounds_ref[0, 0]
    lb = bounds_ref[0, 1]
    ub = bounds_ref[0, 2]
    sg = sg_ref[:]
    sx = sx_ref[:]
    b_pad = sg.shape[0]

    gg = jnp.dot(sg, sg.T, preferred_element_type=jnp.float32)
    gx = jnp.dot(sg, sx.T, preferred_element_type=jnp.float32)
    xx = jnp.dot(sx, sx.T, preferred_element_type=jnp.float32)
    dg = jnp.diagonal(gg)
    dx = jnp.diagonal(xx)
    dist_gg = jnp.maximum(dg[:, None] - 2.0 * gg + dg[None, :], 0.0)
    dist_gx = jnp.maximum(dg[:, None] - 2.0 * gx + dx[None, :], 0.0)
    dist_xx = jnp.maximum(dx[:, None] - 2.0 * xx + dx[None, :], 0.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (b_pad, b_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b_pad, b_pad), 1)
    valid = (rows < batch) & (cols < batch)
    offdiag = valid & (rows != cols)
    denom = float(batch) * (float(batch) - 1.0)

    def mean_offdiag(k):
        return jnp.sum(jnp.where(offdiag, k, 0.0)) / denom

    k_gg = jnp.exp(-dist_gg * inv2s2)
    k_gx = jnp.exp(-dist_gx * inv2s2)
    k_xx = jnp.exp(-dist_xx * inv2s2)
    # bounded variants (math_func.py:1386-1394): gen-gen lower-bounded,
    # data-data upper-bounded (repulsive direction), gen-data unchanged
    k_gg_b = jnp.exp(-jnp.maximum(dist_gg, lb) * inv2s2)
    k_xx_b = jnp.exp(-jnp.minimum(dist_xx, ub) * inv2s2)

    e_kgx = mean_offdiag(k_gx)
    out_ref[0, 0] = mean_offdiag(k_gg)
    out_ref[0, 1] = e_kgx
    out_ref[0, 2] = mean_offdiag(k_xx)
    out_ref[0, 3] = mean_offdiag(k_gg_b)
    out_ref[0, 4] = e_kgx  # k_xy_b == k_xy in the repulsive direction
    out_ref[0, 5] = mean_offdiag(k_xx_b)
    out_ref[0, 6] = 0.0
    out_ref[0, 7] = 0.0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnums=(2,))
def _kernel_means(s_gen: Array, s_x: Array, sigma: float) -> Array:
    """Run the fused kernel; returns the [6] means vector."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = s_gen.shape[0]
    sg = _pad_scores(s_gen.astype(jnp.float32))
    sx = _pad_scores(s_x.astype(jnp.float32))
    bounds = jnp.asarray(
        [[1.0 / (2.0 * sigma ** 2), 0.25, 4.0]], jnp.float32
    )
    out = pl.pallas_call(
        functools.partial(_kernel_means_kernel, batch=batch),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8), memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(bounds, sg, sx)
    return out[0, :6]


# ---------------------------------------------------------------------------
# analytic backward (plain JAX; fused by XLA into the step)
# ---------------------------------------------------------------------------

def _means_reference(s_gen, s_x, sigma):
    """Same six means in plain JAX — used for the custom_vjp backward."""
    from mmdgan_tpu.ops.distance import get_squared_dist
    from mmdgan_tpu.ops.kernels import matrix_mean_wo_diagonal

    b = s_gen.shape[0]
    d_gg, d_gx, d_xx = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    t = 2.0 * sigma ** 2
    m = float(b)
    e = lambda k: matrix_mean_wo_diagonal(k, m)
    return jnp.stack([
        e(jnp.exp(-d_gg / t)),
        e(jnp.exp(-d_gx / t)),
        e(jnp.exp(-d_xx / t)),
        e(jnp.exp(-jnp.maximum(d_gg, 0.25) / t)),
        e(jnp.exp(-d_gx / t)),
        e(jnp.exp(-jnp.minimum(d_xx, 4.0) / t)),
    ])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_kernel_means(s_gen: Array, s_x: Array, sigma: float) -> Array:
    return _kernel_means(s_gen, s_x, sigma)


def _fkm_fwd(s_gen, s_x, sigma):
    return _kernel_means(s_gen, s_x, sigma), (s_gen, s_x)


def _fkm_bwd(sigma, res, ct):
    s_gen, s_x = res
    _, vjp = jax.vjp(lambda a, b: _means_reference(a, b, sigma), s_gen, s_x)
    return vjp(ct)


fused_kernel_means.defvjp(_fkm_fwd, _fkm_bwd)


# ---------------------------------------------------------------------------
# public losses
# ---------------------------------------------------------------------------

def repulsive_mmd_g_pallas(
    s_gen: Array,
    s_x: Array,
    sigma: float = 1.0,
    repulsive_weights: Tuple[float, float] = (0.0, -1.0),
) -> Tuple[Array, Array]:
    """'rep' loss pair from the fused kernel (math_func.py:1336-1343):
    loss_gen = e_kxx + e_kyy - 2 e_kxy;
    loss_dis = w0 e_kxy - e_kxx - w1 e_kyy (k_yy = real data)."""
    w0, w1 = repulsive_weights
    assert w0 - w1 == 1.0, "w[0]-w[1] must be 1"
    e = fused_kernel_means(s_gen, s_x, sigma)
    e_kxx, e_kxy, e_kyy = e[0], e[1], e[2]
    loss_gen = e_kxx + e_kyy - 2.0 * e_kxy
    loss_dis = w0 * e_kxy - e_kxx - w1 * e_kyy
    return loss_gen, loss_dis


def repulsive_mmd_g_bounded_pallas(
    s_gen: Array,
    s_x: Array,
    sigma: float = 1.0,
    lower_bound: float = 0.25,
    upper_bound: float = 4.0,
    repulsive_weights: Tuple[float, float] = (0.0, -1.0),
) -> Tuple[Array, Array]:
    """'rmb' loss pair from the fused kernel (math_func.py:1356-1431).

    Note: bounds are baked at (0.25, 4.0) in the kernel — the values the
    dispatcher uses (math_func.py:2539); assert to avoid silent drift.
    """
    assert (lower_bound, upper_bound) == (0.25, 4.0), (
        "fused rmb kernel is specialized for bounds (0.25, 4.0)")
    w0, w1 = repulsive_weights
    assert w0 - w1 == 1.0, "w[0]-w[1] must be 1"
    assert w0 <= 0 and w1 <= 0, (
        "fused rmb kernel implements the repulsive direction (w0<=0, w1<=0)")
    e = fused_kernel_means(s_gen, s_x, sigma)
    e_kxx, e_kxy, e_kyy = e[0], e[1], e[2]
    e_kxx_b, e_kxy_b, e_kyy_b = e[3], e[4], e[5]
    loss_gen = e_kxx + e_kyy - 2.0 * e_kxy
    loss_dis = w0 * e_kxy_b - e_kxx_b - w1 * e_kyy_b
    return loss_gen, loss_dis
