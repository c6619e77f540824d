"""MMD kernel family: Gaussian, bounded-Gaussian (rmb), t-kernel, Cramér,
witness functions, closed-form MMD against a reference normal, and the
adaptive-bandwidth (Newton root-finding) ``rand_*`` family.

Functional JAX rebuild of ``GeneralTools/math_func.py:1027-1967``. Instead
of TF summaries, every kernel accepts ``with_aux=True`` and then returns a
trailing dict of scalar diagnostics — the kernel means e_kxx/e_kxy/e_kyy
(math_func.py:1329-1333), their bounded variants, and the Newton-solved
bandwidth ``beta`` for the rand_* family. The values are reused from the
loss computation, so requesting them adds no FLOPs; ``GANLoss.apply``
threads them into the train-step metrics and the metric writer.

Semantics preserved from the reference (cited per function):
- off-diagonal means over kernel matrices (math_func.py:1048-1069);
- the repulsive loss pair ``(mmd1, mmd2)`` with ``custom_weights``
  (math_func.py:1336-1343) where ``k_yy`` belongs to the *real* data;
- bounded kernels saturating attraction/repulsion (math_func.py:1386-1394);
- Newton iteration on the kernel bandwidth beta (math_func.py:1606-1967)
  implemented with ``lax.fori_loop`` — static trip count, jit-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

EPSI = 1e-10  # FLAGS.EPSI (misc_fun.py:29)


# ---------------------------------------------------------------------------
# means excluding the diagonal
# ---------------------------------------------------------------------------

def matrix_mean_wo_diagonal(matrix: jnp.ndarray, num_row: float, num_col: Optional[float] = None):
    """Mean of matrix entries off the diagonal (math_func.py:1048-1069)."""
    diag_sum = jnp.sum(jnp.diagonal(matrix))
    if num_col is None:
        return (jnp.sum(matrix) - diag_sum) / (num_row * (num_row - 1.0))
    return (jnp.sum(matrix) - diag_sum) / (num_row * num_col - min(num_col, num_row))


def row_mean_wo_diagonal(matrix: jnp.ndarray, num_col: float):
    """Per-row mean excluding the diagonal (math_func.py:1073-1083)."""
    return (jnp.sum(matrix, axis=1) - jnp.diagonal(matrix)) / (num_col - 1.0)


# ---------------------------------------------------------------------------
# Gaussian-kernel MMD (plain / repulsive / bounded)
# ---------------------------------------------------------------------------

def mmd_g(
    dist_xx: jnp.ndarray,
    dist_xy: jnp.ndarray,
    dist_yy: jnp.ndarray,
    batch_size: int,
    sigma: float = 1.0,
    var_target: Optional[float] = None,
    upper_bound: Optional[float] = None,
    lower_bound: Optional[float] = None,
    custom_weights: Optional[Sequence[float]] = None,
    with_aux: bool = False,
):
    """Gaussian-kernel MMD (math_func.py:1288-1352).

    With ``custom_weights=[w0, w1]`` (w0 - w1 == 1) returns the repulsive
    pair ``(mmd1, mmd2)`` = (generator loss, discriminator loss
    ``w0*e_kxy - e_kxx - w1*e_kyy``); note k_yy is the *real* data kernel.
    With ``var_target`` returns ``(mmd, loss_sigma)`` for trainable sigma.
    With ``with_aux`` the tuple gains a trailing dict of the kernel-mean
    diagnostics the reference writes as TB scalars
    (math_func.py:1329-1333) — these reuse already-computed values, so
    requesting them is free.
    """
    two_sigma2 = 2.0 * sigma ** 2
    if lower_bound is None:
        k_xx = jnp.exp(-dist_xx / two_sigma2)
        k_yy = jnp.exp(-dist_yy / two_sigma2)
    else:
        k_xx = jnp.exp(-jnp.maximum(dist_xx, lower_bound) / two_sigma2)
        k_yy = jnp.exp(-jnp.maximum(dist_yy, lower_bound) / two_sigma2)
    if upper_bound is None:
        k_xy = jnp.exp(-dist_xy / two_sigma2)
    else:
        k_xy = jnp.exp(-jnp.minimum(dist_xy, upper_bound) / two_sigma2)

    m = float(batch_size)
    e_kxx = matrix_mean_wo_diagonal(k_xx, m)
    e_kxy = matrix_mean_wo_diagonal(k_xy, m)
    e_kyy = matrix_mean_wo_diagonal(k_yy, m)
    aux = {"e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy}

    if var_target is None:
        if custom_weights is None:
            return (e_kxx + e_kyy - 2.0 * e_kxy, aux) if with_aux else (
                e_kxx + e_kyy - 2.0 * e_kxy)
        assert custom_weights[0] - custom_weights[1] == 1.0, "w[0]-w[1] must be 1"
        mmd1 = e_kxx + e_kyy - 2.0 * e_kxy
        mmd2 = custom_weights[0] * e_kxy - e_kxx - custom_weights[1] * e_kyy
        return (mmd1, mmd2, aux) if with_aux else (mmd1, mmd2)
    mmd = e_kxx + e_kyy - 2.0 * e_kxy
    var = e_kxx + e_kyy + 2.0 * e_kxy
    loss_sigma = jnp.square(var - var_target)
    return (mmd, loss_sigma, aux) if with_aux else (mmd, loss_sigma)


def mmd_g_bounded(
    dist_xx: jnp.ndarray,
    dist_xy: jnp.ndarray,
    dist_yy: jnp.ndarray,
    batch_size: int,
    sigma: float = 1.0,
    var_target: Optional[float] = None,
    upper_bound: float = 4.0,
    lower_bound: float = 0.25,
    custom_weights: Optional[Sequence[float]] = None,
    with_aux: bool = False,
):
    """Repulsive loss with the saturation-avoiding bounded kernel ('rmb').

    Mirrors ``mmd_g_bounded`` (math_func.py:1356-1431): the generator loss
    uses unbounded kernels; the discriminator loss substitutes
    ``k_xx_b = exp(-max(d_xx, lb)/2s^2)`` and, for the repulsive case
    (w1 <= 0), ``k_yy_b = exp(-min(d_yy, ub)/2s^2)`` (:1386-1394).
    """
    two_sigma2 = 2.0 * sigma ** 2
    k_xx = jnp.exp(-dist_xx / two_sigma2)
    k_yy = jnp.exp(-dist_yy / two_sigma2)
    k_xy = jnp.exp(-dist_xy / two_sigma2)

    assert custom_weights is not None, "mmd_g_bounded requires custom_weights"
    k_xx_b = jnp.exp(-jnp.maximum(dist_xx, lower_bound) / two_sigma2)
    if custom_weights[0] > 0:
        k_xy_b = jnp.exp(-jnp.minimum(dist_xy, upper_bound) / two_sigma2)
    else:  # no lower bound: k_xy may be zero at equilibrium (:1390)
        k_xy_b = k_xy
    if custom_weights[1] > 0:  # original mmd-g direction
        k_yy_b = jnp.exp(-jnp.maximum(dist_yy, lower_bound) / two_sigma2)
    else:  # repulsive direction
        k_yy_b = jnp.exp(-jnp.minimum(dist_yy, upper_bound) / two_sigma2)

    m = float(batch_size)
    e_kxx = matrix_mean_wo_diagonal(k_xx, m)
    e_kxy = matrix_mean_wo_diagonal(k_xy, m)
    e_kyy = matrix_mean_wo_diagonal(k_yy, m)
    e_kxx_b = matrix_mean_wo_diagonal(k_xx_b, m)
    e_kyy_b = matrix_mean_wo_diagonal(k_yy_b, m)
    e_kxy_b = matrix_mean_wo_diagonal(k_xy_b, m) if custom_weights[0] < 0 else e_kxy
    aux = {"e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy,
           "e_kxx_b": e_kxx_b, "e_kxy_b": e_kxy_b, "e_kyy_b": e_kyy_b}

    if var_target is None:
        assert custom_weights[0] - custom_weights[1] == 1.0, "w[0]-w[1] must be 1"
        mmd1 = e_kxx + e_kyy - 2.0 * e_kxy
        mmd2 = custom_weights[0] * e_kxy_b - e_kxx_b - custom_weights[1] * e_kyy_b
        return (mmd1, mmd2, aux) if with_aux else (mmd1, mmd2)
    mmd = e_kxx + e_kyy - 2.0 * e_kxy
    var = e_kxx + e_kyy + 2.0 * e_kxy
    loss_sigma = jnp.square(var - var_target)
    return (mmd, loss_sigma, aux) if with_aux else (mmd, loss_sigma)


def mixture_mmd_g(
    dist_xx, dist_xy, dist_yy, batch_size, sigma: Sequence[float],
    var_targets: Optional[Sequence[float]] = None,
    with_aux: bool = False,
):
    """Sum of Gaussian-kernel MMDs over a sigma list (math_func.py:1435-1473).

    ``with_aux`` returns ``(mmd, aux)`` with per-sigma kernel means keyed
    ``sigma_{i}/e_k**`` — mirroring the reference's per-sigma name-scoped
    TB scalars (math_func.py:1456 name scope around :1329-1333)."""
    if var_targets is None:
        if with_aux:
            total, aux = 0.0, {}
            for i, s in enumerate(sigma):
                m_i, a_i = mmd_g(
                    dist_xx, dist_xy, dist_yy, batch_size, sigma=s, with_aux=True)
                total = total + m_i
                aux.update({f"sigma_{i}/{k}": v for k, v in a_i.items()})
            return total, aux
        return sum(
            mmd_g(dist_xx, dist_xy, dist_yy, batch_size, sigma=s) for s in sigma
        )
    mmd, loss_sigma, aux = 0.0, 0.0, {}
    for i, (s, vt) in enumerate(zip(sigma, var_targets)):
        out = mmd_g(dist_xx, dist_xy, dist_yy, batch_size, sigma=s,
                    var_target=vt, with_aux=with_aux)
        if with_aux:
            m_i, l_i, a_i = out
            aux.update({f"sigma_{i}/{k}": v for k, v in a_i.items()})
        else:
            m_i, l_i = out
        mmd, loss_sigma = mmd + m_i, loss_sigma + l_i
    return (mmd, loss_sigma, aux) if with_aux else (mmd, loss_sigma)


# ---------------------------------------------------------------------------
# t-kernel MMD and Cramér (energy) distance
# ---------------------------------------------------------------------------

def mmd_t(
    dist_xx, dist_xy, dist_yy, batch_size, alpha: float = 1.0, beta: float = 2.0,
    var_target: Optional[float] = None,
    with_aux: bool = False,
):
    """MMD with the inverse-multiquadratic (t-distribution) kernel.

    Mirrors ``mmd_t`` (math_func.py:1087-1141); log-form for conditioning.
    """
    log_k_xx = jnp.log(dist_xx / (beta * alpha) + 1.0)
    log_k_xy = jnp.log(dist_xy / (beta * alpha) + 1.0)
    log_k_yy = jnp.log(dist_yy / (beta * alpha) + 1.0)
    k_xx = jnp.exp(-alpha * log_k_xx)
    k_xy = jnp.exp(-alpha * log_k_xy)
    k_yy = jnp.exp(-alpha * log_k_yy)
    m = float(batch_size)
    e_kxx = matrix_mean_wo_diagonal(k_xx, m)
    e_kxy = matrix_mean_wo_diagonal(k_xy, m)
    e_kyy = matrix_mean_wo_diagonal(k_yy, m)
    aux = {"e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy}
    mmd = e_kxx + e_kyy - 2.0 * e_kxy
    if var_target is None:
        return (mmd, aux) if with_aux else mmd
    var = e_kxx + e_kyy + 2.0 * e_kxy
    loss_alpha = jnp.square(var - var_target)
    return (mmd, loss_alpha, aux) if with_aux else (mmd, loss_alpha)


def mixture_mmd_t(
    dist_xx, dist_xy, dist_yy, batch_size, alpha: Sequence[float], beta: float = 2.0,
    var_targets: Optional[Sequence[float]] = None,
    with_aux: bool = False,
):
    """Sum of t-kernel MMDs over an alpha list (math_func.py:1145-1184).

    ``with_aux`` returns ``(mmd, aux)`` with per-alpha kernel means keyed
    ``alpha_{i}/e_k**`` (reference name-scoped scalars)."""
    if var_targets is None:
        if with_aux:
            total, aux = 0.0, {}
            for i, a in enumerate(alpha):
                m_i, a_i = mmd_t(
                    dist_xx, dist_xy, dist_yy, batch_size, alpha=a, beta=beta,
                    with_aux=True)
                total = total + m_i
                aux.update({f"alpha_{i}/{k}": v for k, v in a_i.items()})
            return total, aux
        return sum(
            mmd_t(dist_xx, dist_xy, dist_yy, batch_size, alpha=a, beta=beta)
            for a in alpha
        )
    mmd, loss_alpha, aux = 0.0, 0.0, {}
    for i, (a, vt) in enumerate(zip(alpha, var_targets)):
        out = mmd_t(dist_xx, dist_xy, dist_yy, batch_size, alpha=a, beta=beta,
                    var_target=vt, with_aux=with_aux)
        if with_aux:
            m_i, l_i, a_i = out
            aux.update({f"alpha_{i}/{k}": v for k, v in a_i.items()})
        else:
            m_i, l_i = out
        mmd, loss_alpha = mmd + m_i, loss_alpha + l_i
    return (mmd, loss_alpha, aux) if with_aux else (mmd, loss_alpha)


def cramer(dist_xx, dist_xy, dist_yy, batch_size, epsi: float = 1e-16,
           with_aux: bool = False):
    """Energy distance without independent sample pairs (math_func.py:1249-1284)."""
    k_xx = -jnp.sqrt(dist_xx + epsi)
    k_xy = -jnp.sqrt(dist_xy + epsi)
    k_yy = -jnp.sqrt(dist_yy + epsi)
    m = float(batch_size)
    e_kxx = matrix_mean_wo_diagonal(k_xx, m)
    e_kxy = matrix_mean_wo_diagonal(k_xy, m)
    e_kyy = matrix_mean_wo_diagonal(k_yy, m)
    mmd = e_kxx + e_kyy - 2.0 * e_kxy
    if with_aux:
        return mmd, {"e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy}
    return mmd


# ---------------------------------------------------------------------------
# witness functions (for MMD gradient penalties)
# ---------------------------------------------------------------------------

def witness_g(dist_zx, dist_zy, sigma: float = 2.0):
    """Gaussian witness f(z) = E k(x,z) - E k(y,z) (math_func.py:1477-1506).

    Note the reference divides by ``2*sigma`` (not 2*sigma^2) here — we
    deliberately preserve that behaviour for parity.
    """
    k_zx = jnp.exp(-dist_zx / (2.0 * sigma))
    k_zy = jnp.exp(-dist_zy / (2.0 * sigma))
    return jnp.mean(k_zx, axis=1) - jnp.mean(k_zy, axis=1)


def witness_mix_g(dist_zx, dist_zy, sigma: Sequence[float]):
    """Sum of Gaussian witnesses over sigma list (math_func.py:1510-1529)."""
    return sum(witness_g(dist_zx, dist_zy, sigma=s) for s in sigma)


def witness_t(dist_zx, dist_zy, alpha: float = 1.0, beta: float = 2.0):
    """t-kernel witness function (math_func.py:1188-1221)."""
    k_zx = jnp.exp(-alpha * jnp.log(dist_zx / (beta * alpha) + 1.0))
    k_zy = jnp.exp(-alpha * jnp.log(dist_zy / (beta * alpha) + 1.0))
    return jnp.mean(k_zx, axis=1) - jnp.mean(k_zy, axis=1)


def witness_mix_t(dist_zx, dist_zy, alpha: Sequence[float], beta: float = 2.0):
    """Sum of t-kernel witnesses over alpha list (math_func.py:1225-1245)."""
    return sum(witness_t(dist_zx, dist_zy, alpha=a, beta=beta) for a in alpha)


# ---------------------------------------------------------------------------
# closed-form MMD against a reference normal
# ---------------------------------------------------------------------------

def mmd_g_xn(
    batch_size: int, d: int, sigma: float, x: jnp.ndarray,
    dist_xx: Optional[jnp.ndarray] = None, y_mu: float = 0.0, y_var: float = 1.0,
):
    """MMD between x and N(y_mu, y_var I) in closed form (math_func.py:1532-1575).

    Note: the reference uses ``exp(-d/(2*sigma))`` here (sigma not squared);
    preserved for parity.
    """
    if dist_xx is None:
        from mmdgan_tpu.ops.distance import get_squared_dist
        dist_xx = get_squared_dist(x, mode="xx")
    dist_xy = jnp.sum(jnp.square(x - y_mu), axis=1)
    k_xx = jnp.exp(-dist_xx / (2.0 * sigma))
    k_xy = jnp.exp(-dist_xy / (2.0 * (sigma + y_var))) * jnp.power(
        sigma / (sigma + y_var), d / 2.0
    )
    e_kxx = matrix_mean_wo_diagonal(k_xx, float(batch_size))
    e_kxy = jnp.mean(k_xy)
    e_kyy = jnp.power(sigma / (sigma + 2.0 * y_var), d / 2.0)
    return e_kxx + e_kyy - 2.0 * e_kxy


def mixture_g_xn(batch_size, d, sigma: Sequence[float], x, dist_xx=None, y_mu=0.0, y_var=1.0):
    """Mixture version of :func:`mmd_g_xn` (math_func.py:1578-1602)."""
    return sum(
        mmd_g_xn(batch_size, d, s, x, dist_xx=dist_xx, y_mu=y_mu, y_var=y_var)
        for s in sigma
    )


# ---------------------------------------------------------------------------
# adaptive-bandwidth rand_* family (Newton's method on beta)
# ---------------------------------------------------------------------------

def _newton_iters(beta0, f_df, max_iter: int):
    """Run ``max_iter`` Newton updates b <- b - f(b)/f'(b) (math_func.py:1027-1044)."""
    if max_iter <= 0:
        return beta0

    def body(_, b):
        fx, gx = f_df(b)
        return b - fx / (gx + EPSI)

    return jax.lax.fori_loop(0, max_iter, body, beta0)


def rand_mmd_g(dist_all, batch_size: int, omega: float = 0.5, max_iter: int = 0):
    """Global-sigma MMD on a combined 2B x 2B distance matrix
    (math_func.py:1606-1664): beta solved so the mean kernel value matches
    omega; init at -log(omega)/mean-distance; Newton refinement.
    """
    m = float(batch_size)

    def f_df(b):
        k = jnp.exp(-dist_all * b)
        e_k = matrix_mean_wo_diagonal(k, 2 * m)
        e_kd = matrix_mean_wo_diagonal(-k * dist_all, 2 * m)
        return e_k - omega, e_kd

    dist_mean = matrix_mean_wo_diagonal(dist_all, 2 * m)
    beta = -jnp.log(omega) / (dist_mean + EPSI)
    beta = _newton_iters(beta, f_df, max_iter)

    k_all = jnp.exp(-dist_all * beta)
    b = batch_size
    k_xx = k_all[:b, :b]
    k_xy_0 = k_all[:b, b:]
    k_xy_1 = k_all[b:, :b]
    k_yy = k_all[b:, b:]
    e_kxx = matrix_mean_wo_diagonal(k_xx, m)
    e_kxy_0 = matrix_mean_wo_diagonal(k_xy_0, m)
    e_kxy_1 = matrix_mean_wo_diagonal(k_xy_1, m)
    e_kyy = matrix_mean_wo_diagonal(k_yy, m)
    return e_kxx + e_kyy - e_kxy_0 - e_kxy_1


def _mean_maybe_wo_diag(k, batch_size):
    if batch_size is None:
        return jnp.mean(k)
    return matrix_mean_wo_diagonal(k, float(batch_size))


def rand_mmd_g_xy(
    dist_xx, dist_xy, dist_yy, batch_size: Optional[int] = None,
    dist_yx=None, omega: float = 0.5, max_iter: int = 3,
    with_aux: bool = False,
):
    """Adaptive-sigma Gaussian MMD (math_func.py:1667-1770).

    ``with_aux`` returns ``(mmd, aux)`` with the Newton-solved bandwidth
    ``beta`` and the kernel means (the reference writes beta as a TB
    scalar, math_func.py:1764-1768)."""
    if dist_yx is None:
        def f_df(b):
            k = jnp.exp(-dist_xy * b)
            return jnp.mean(k) - omega, jnp.mean(-k * dist_xy)
        beta = -jnp.log(omega) / jnp.mean(dist_xy + EPSI)
        beta = _newton_iters(beta, f_df, max_iter)
    else:
        def f_df(b):
            k0 = jnp.exp(-dist_xy * b)
            k1 = jnp.exp(-dist_yx * b)
            fx = jnp.mean(k0) + jnp.mean(k1) - 2.0 * omega
            gx = jnp.mean(-k0 * dist_xy) + jnp.mean(-k1 * dist_yx)
            return fx, gx
        beta = -2.0 * jnp.log(omega) / (jnp.mean(dist_xy) + jnp.mean(dist_yx) + EPSI)
        beta = _newton_iters(beta, f_df, max_iter)

    k_xx = jnp.exp(-dist_xx * beta)
    k_xy = jnp.exp(-dist_xy * beta)
    k_yy = jnp.exp(-dist_yy * beta)
    e_kxx = _mean_maybe_wo_diag(k_xx, batch_size)
    e_kxy = _mean_maybe_wo_diag(k_xy, batch_size)
    e_kyy = _mean_maybe_wo_diag(k_yy, batch_size)
    aux = {"beta": beta, "e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy}
    if dist_yx is None:
        mmd = e_kxx + e_kyy - 2.0 * e_kxy
        return (mmd, aux) if with_aux else mmd
    k_yx = jnp.exp(-dist_yx * beta)
    e_kyx = _mean_maybe_wo_diag(k_yx, batch_size)
    aux["e_kyx"] = e_kyx
    mmd = e_kxx + e_kyy - e_kxy - e_kyx
    return (mmd, aux) if with_aux else mmd


def rand_mmd_g_xy_bounded(
    dist_xx, dist_xy, dist_yy, batch_size: Optional[int] = None,
    dist_yx=None, omega: float = 0.5, max_iter: int = 3,
    beta_lb: float = 0.125, beta_ub: float = 2.0,
    with_aux: bool = False,
):
    """Adaptive-sigma MMD with clipped beta and bounded kernels ('rgb').

    Mirrors ``rand_mmd_g_xy_bounded`` (math_func.py:1773-1897); bounds at
    d_lb = 0.125/beta and d_ub = 2.0/beta (:1846-1848).
    Returns (mmd, bounded_loss) when dist_yx is None.
    """
    if dist_yx is None:
        def f_df(b):
            k = jnp.exp(-dist_xy * b)
            return jnp.mean(k) - omega, jnp.mean(-k * dist_xy)
        beta = -jnp.log(omega) / jnp.mean(dist_xy + EPSI)
        beta = _newton_iters(beta, f_df, max_iter)
    else:
        def f_df(b):
            k0 = jnp.exp(-dist_xy * b)
            k1 = jnp.exp(-dist_yx * b)
            fx = jnp.mean(k0) + jnp.mean(k1) - 2.0 * omega
            gx = jnp.mean(-k0 * dist_xy) + jnp.mean(-k1 * dist_yx)
            return fx, gx
        beta = -2.0 * jnp.log(omega) / (jnp.mean(dist_xy) + jnp.mean(dist_yx) + EPSI)
        beta = _newton_iters(beta, f_df, max_iter)

    beta = jnp.clip(beta, beta_lb, beta_ub)
    k_xx = jnp.exp(-dist_xx * beta)
    k_xy = jnp.exp(-dist_xy * beta)
    k_yy = jnp.exp(-dist_yy * beta)
    k_xx_b = jnp.exp(-jnp.maximum(dist_xx, 0.125 / beta) * beta)
    k_xy_b = jnp.exp(-jnp.minimum(dist_xy, 2.0 / beta) * beta)
    k_yy_b = jnp.exp(-jnp.maximum(dist_yy, 0.125 / beta) * beta)

    e_kxx = _mean_maybe_wo_diag(k_xx, batch_size)
    e_kxy = _mean_maybe_wo_diag(k_xy, batch_size)
    e_kyy = _mean_maybe_wo_diag(k_yy, batch_size)
    e_kxx_b = _mean_maybe_wo_diag(k_xx_b, batch_size)
    e_kxy_b = _mean_maybe_wo_diag(k_xy_b, batch_size)
    e_kyy_b = _mean_maybe_wo_diag(k_yy_b, batch_size)
    aux = {"beta": beta, "e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy,
           "e_kxx_b": e_kxx_b, "e_kxy_b": e_kxy_b, "e_kyy_b": e_kyy_b}

    if dist_yx is None:
        out = (e_kxx + e_kyy - 2.0 * e_kxy, e_kxx_b - 2.0 * e_kyy_b + e_kxy_b)
        return out + (aux,) if with_aux else out
    k_yx = jnp.exp(-dist_yx * beta)
    e_kyx = _mean_maybe_wo_diag(k_yx, batch_size)
    aux["e_kyx"] = e_kyx
    mmd = e_kxx + e_kyy - e_kxy - e_kyx
    return (mmd, aux) if with_aux else mmd


def rand_mmd_g_xn(
    x: jnp.ndarray, y_rho: float, batch_size: int, d: int, y_mu: float = 0.0,
    dist_xx: Optional[jnp.ndarray] = None, omega: float = 0.5, max_iter: int = 0,
    with_aux: bool = False,
):
    """Adaptive-sigma MMD between x and a reference normal
    (math_func.py:1900-1967); the x-vs-normal expectation has a closed form.
    """
    if dist_xx is None:
        from mmdgan_tpu.ops.distance import get_squared_dist
        dist_xx = get_squared_dist(x, mode="xx")
    dist_xy = jnp.sum(jnp.square(x - y_mu), axis=1)

    def f_df(b):
        const_f = d / (d + b * y_rho)
        k = jnp.power(const_f, d / 2.0) * jnp.exp(-b * const_f * dist_xy)
        e_k = jnp.mean(k)
        # reference gradient formula (math_func.py:1939-1942)
        kd = -y_rho * const_f / 2.0 * e_k - jnp.mean(jnp.power(const_f, 2) * dist_xy * k)
        return e_k - omega, jnp.mean(kd)

    beta = -jnp.log(omega) / (jnp.mean(dist_xy) + y_rho / 2.0)
    beta = _newton_iters(beta, f_df, max_iter)

    const_0 = d / (d + beta * y_rho)
    k_xx = jnp.exp(-dist_xx * beta)
    k_xy = jnp.power(const_0, d / 2.0) * jnp.exp(-beta * const_0 * dist_xy)
    e_kxx = matrix_mean_wo_diagonal(k_xx, float(batch_size))
    e_kxy = jnp.mean(k_xy)
    e_kyy = jnp.power(d / (d + 2.0 * beta * y_rho), d / 2.0)
    mmd = e_kxx + e_kyy - 2.0 * e_kxy
    if with_aux:
        return mmd, {"beta": beta, "e_kxx": e_kxx, "e_kxy": e_kxy, "e_kyy": e_kyy}
    return mmd
