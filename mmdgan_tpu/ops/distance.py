"""Pairwise squared-distance engine.

Functional JAX rebuild of the reference distance utilities
(``GeneralTools/math_func.py:767-1023``). The Gram-matrix trick
``d(x,y) = |x|^2 - 2 x.y + |y|^2`` is a single fused matmul + broadcast on
TPU; every distance is clamped at zero exactly like the reference
(math_func.py:805) to guard against negative values from cancellation.

The score matrices here are tiny (B x d, e.g. 64 x 16), so we force
float32 accumulation at highest matmul precision — on TPU the default
bf16 MXU passes would visibly perturb the loss for near-duplicate rows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Highest precision for the small Gram matrices; negligible cost at B<=1024.
_PREC = jax.lax.Precision.HIGHEST


def _gram(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, y.T, precision=_PREC)


def _dist_from_parts(dx: jnp.ndarray, xyt: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(dx[:, None] - 2.0 * xyt + dy[None, :], 0.0)


def get_squared_dist(
    x: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    z_score: bool = False,
    mode: str = "xxxyyy",
):
    """Pairwise squared euclidean distances between rows of x and y.

    Mirrors ``get_squared_dist`` (math_func.py:767-858).

    :param x: [m, d] matrix
    :param y: [n, d] matrix or None (then mode='xx')
    :param scale: optional [d] precision vector; d(x,y) uses x*scale . y
    :param z_score: subtract the mean of concat(x, y) first
    :param mode: 'xx' -> dist_xx; 'xy' -> dist_xy;
        'xxxy' -> (dist_xx, dist_xy); 'xxxyyy' -> (dist_xx, dist_xy, dist_yy)
    """
    if x.ndim != 2:
        raise ValueError("get_squared_dist: input must be a matrix.")
    if y is None:
        mode = "xx"
    if z_score:
        if y is None:
            x = x - jnp.mean(x, axis=0, keepdims=True)
        else:
            mu = jnp.mean(jnp.concatenate([x, y], axis=0), axis=0, keepdims=True)
            x = x - mu
            y = y - mu

    xs = x if scale is None else x * scale

    if mode in ("xx", "xxxy", "xxxyyy"):
        xxt = _gram(xs, x)
        dx = jnp.diagonal(xxt)
        dist_xx = _dist_from_parts(dx, xxt, dx)
        if mode == "xx":
            return dist_xx
        xyt = _gram(xs, y)
        if mode == "xxxy":
            # estimate dy without forming yyt (math_func.py:812-824)
            ys = y if scale is None else y * scale
            dy = jnp.sum(ys * y, axis=1)
            dist_xy = _dist_from_parts(dx, xyt, dy)
            return dist_xx, dist_xy
        # 'xxxyyy'
        ys = y if scale is None else y * scale
        yyt = _gram(ys, y)
        dy = jnp.diagonal(yyt)
        dist_xy = _dist_from_parts(dx, xyt, dy)
        dist_yy = _dist_from_parts(dy, yyt, dy)
        return dist_xx, dist_xy, dist_yy
    elif mode == "xy":
        xs2 = x if scale is None else x * scale
        ys2 = y if scale is None else y * scale
        dx = jnp.sum(xs2 * x, axis=1)
        dy = jnp.sum(ys2 * y, axis=1)
        xyt = _gram(xs2, y)
        return _dist_from_parts(dx, xyt, dy)
    else:
        raise ValueError(f"Mode {mode} not supported")


def get_squared_dist_ref(x: jnp.ndarray, y: Optional[jnp.ndarray] = None):
    """Exact-but-slow O(m*d*n) distance; numerical cross-check fixture.

    Mirrors ``get_squared_dist_ref`` (math_func.py:861-888).
    """
    if x.ndim != 2:
        raise ValueError("get_squared_dist_ref: input must be a matrix.")
    diff_xx = x[:, None, :] - x[None, :, :]
    dist_xx = jnp.sum(diff_xx * diff_xx, axis=-1)
    if y is None:
        return dist_xx
    diff_xy = x[:, None, :] - y[None, :, :]
    dist_xy = jnp.sum(diff_xy * diff_xy, axis=-1)
    diff_yy = y[:, None, :] - y[None, :, :]
    dist_yy = jnp.sum(diff_yy * diff_yy, axis=-1)
    return dist_xx, dist_xy, dist_yy


def squared_dist_triplet(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
    """All pairwise distance matrices among three batches.

    Mirrors ``squared_dist_triplet`` (math_func.py:892-931). Returns
    (d_xx, d_yy, d_zz, d_xy, d_xz, d_yz).
    """
    x_x, y_y, z_z = _gram(x, x), _gram(y, y), _gram(z, z)
    x_y, y_z, x_z = _gram(x, y), _gram(y, z), _gram(x, z)
    d_x, d_y, d_z = jnp.diagonal(x_x), jnp.diagonal(y_y), jnp.diagonal(z_z)
    return (
        _dist_from_parts(d_x, x_x, d_x),
        _dist_from_parts(d_y, y_y, d_y),
        _dist_from_parts(d_z, z_z, d_z),
        _dist_from_parts(d_x, x_y, d_y),
        _dist_from_parts(d_x, x_z, d_z),
        _dist_from_parts(d_y, y_z, d_z),
    )


def get_batch_squared_dist(
    x_batch: jnp.ndarray,
    y_batch: Optional[jnp.ndarray] = None,
    axis: int = 1,
    mode: str = "xx",
):
    """Batched pairwise squared distances (used by non-local 'dist' blocks).

    Mirrors ``get_batch_squared_dist`` (math_func.py:954-1023).

    :param x_batch: [batch, a, b]
    :param y_batch: [batch, c, d]
    :param axis: which axis holds the features (1 or 2)
    """
    assert axis in (1, 2), "axis has to be 1 or 2."
    if y_batch is not None and mode == "xx":
        mode = "xy"

    def bmm(u, v):  # [N,p,f] x [N,q,f] -> [N,p,q] along feature axis
        return jnp.einsum("npf,nqf->npq", u, v, precision=_PREC)

    # arrange so features are last
    def feat_last(t):
        return jnp.swapaxes(t, 1, 2) if axis == 1 else t

    xb = feat_last(x_batch)
    if mode in ("xx", "xxxy", "xxxyyy"):
        xxt = bmm(xb, xb)
        dx = jnp.diagonal(xxt, axis1=1, axis2=2)
        dist_xx = jnp.maximum(dx[:, :, None] - 2.0 * xxt + dx[:, None, :], 0.0)
        if mode == "xx":
            return dist_xx
        yb = feat_last(y_batch)
        xyt = bmm(xb, yb)
        dy = jnp.sum(yb * yb, axis=2)
        dist_xy = jnp.maximum(dx[:, :, None] - 2.0 * xyt + dy[:, None, :], 0.0)
        if mode == "xxxy":
            return dist_xx, dist_xy
        yyt = bmm(yb, yb)
        dist_yy = jnp.maximum(dy[:, :, None] - 2.0 * yyt + dy[:, None, :], 0.0)
        return dist_xx, dist_xy, dist_yy
    elif mode == "xy":
        yb = feat_last(y_batch)
        dx = jnp.sum(xb * xb, axis=2)
        dy = jnp.sum(yb * yb, axis=2)
        xyt = bmm(xb, yb)
        return jnp.maximum(dx[:, :, None] - 2.0 * xyt + dy[:, None, :], 0.0)
    else:
        raise ValueError(f"Mode {mode} not supported")


def mat_slice(mat: jnp.ndarray, row_mask: jnp.ndarray, col_mask: Optional[jnp.ndarray] = None):
    """Gather a square sub-matrix of ``mat`` by boolean masks.

    JAX needs static shapes, so instead of boolean_mask (math_func.py
    ``mat_slice``) we use argsort-based index selection: the first
    ``k = mat.shape[0]//2`` indices where the mask is True. Masks produced by
    :func:`slice_pairwise_distance` always have exactly half the entries
    True, keeping shapes static.
    """
    n = mat.shape[0]
    k = n // 2
    row_idx = jnp.argsort(~row_mask, stable=True)[:k]
    col_idx = row_idx if col_mask is None else jnp.argsort(~col_mask, stable=True)[:k]
    return mat[jnp.ix_(row_idx, col_idx)]


def slice_pairwise_distance(
    pair_dist: jnp.ndarray,
    batch_size: Optional[int] = None,
    indices: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slice a 2B x 2B pairwise-distance matrix into (g1, g1g2, g2) blocks.

    Mirrors ``slice_pairwise_distance`` (math_func.py:2030-2058). When
    ``indices`` (a [B] boolean vector) is given, rows/cols of the two groups
    are mixed: group1 takes x_i where indices[i] else y_i.
    """
    if indices is None:
        b = batch_size
        return (
            pair_dist[:b, :b],
            pair_dist[:b, b:],
            pair_dist[b:, b:],
        )
    mix_group_1 = jnp.concatenate([indices, ~indices], axis=0)
    mix_group_2 = jnp.concatenate([~indices, indices], axis=0)
    return (
        mat_slice(pair_dist, mix_group_1),
        mat_slice(pair_dist, mix_group_1, mix_group_2),
        mat_slice(pair_dist, mix_group_2),
    )


def get_dist_np(x, y):
    """Numpy pairwise euclidean distance (math_func.py:935-950); note the
    reference returns the sqrt'ed distance here."""
    import numpy as _np

    x = _np.array(x, dtype=_np.float32)
    y = _np.array(y, dtype=_np.float32)
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return _np.sqrt(d2, dtype=_np.float32)
