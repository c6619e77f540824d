"""Unit tests for the MMD kernel family against tiny numpy re-implementations
and closed-form values (the test pyramid the reference lacks, SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mmdgan_tpu.ops.distance import get_squared_dist
from mmdgan_tpu.ops.kernels import (
    cramer,
    matrix_mean_wo_diagonal,
    mixture_mmd_g,
    mixture_mmd_t,
    mmd_g,
    mmd_g_bounded,
    mmd_g_xn,
    mmd_t,
    rand_mmd_g,
    rand_mmd_g_xy,
    rand_mmd_g_xy_bounded,
    rand_mmd_g_xn,
    row_mean_wo_diagonal,
    witness_g,
    witness_t,
)


def np_pairwise(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def np_offdiag_mean(m):
    n = m.shape[0]
    return (m.sum() - np.trace(m)) / (n * (n - 1))


def make_dists(rng, b=8, d=4):
    x = rng.randn(b, d).astype(np.float32)
    y = rng.randn(b, d).astype(np.float32)
    return (
        jnp.asarray(np_pairwise(x, x)),
        jnp.asarray(np_pairwise(x, y)),
        jnp.asarray(np_pairwise(y, y)),
        x,
        y,
    )


def test_matrix_mean_wo_diagonal(rng):
    m = rng.randn(6, 6).astype(np.float32)
    got = matrix_mean_wo_diagonal(jnp.asarray(m), 6.0)
    np.testing.assert_allclose(float(got), np_offdiag_mean(m), rtol=1e-5)


def test_row_mean_wo_diagonal(rng):
    m = rng.randn(5, 5).astype(np.float32)
    got = np.asarray(row_mean_wo_diagonal(jnp.asarray(m), 5.0))
    expect = (m.sum(1) - np.diag(m)) / 4.0
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_mmd_g_identical_samples_zero(rng):
    """MMD(x, x) with matched pairs is exactly 0."""
    x = rng.randn(8, 4).astype(np.float32)
    dxx = jnp.asarray(np_pairwise(x, x))
    out = mmd_g(dxx, dxx, dxx, 8, sigma=1.0)
    np.testing.assert_allclose(float(out), 0.0, atol=1e-6)


def test_mmd_g_numpy_parity(rng):
    dxx, dxy, dyy, _, _ = make_dists(rng)
    got = float(mmd_g(dxx, dxy, dyy, 8, sigma=1.5))
    kxx = np.exp(-np.asarray(dxx) / 4.5)
    kxy = np.exp(-np.asarray(dxy) / 4.5)
    kyy = np.exp(-np.asarray(dyy) / 4.5)
    expect = np_offdiag_mean(kxx) + np_offdiag_mean(kyy) - 2 * np_offdiag_mean(kxy)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_repulsive_pair_relation(rng):
    """mmd2 = w0*e_kxy - e_kxx - w1*e_kyy with w=[0,-1] (paper's rep loss)."""
    dxx, dxy, dyy, _, _ = make_dists(rng)
    mmd1, mmd2 = mmd_g(dxx, dxy, dyy, 8, sigma=1.0, custom_weights=[0.0, -1.0])
    kxx = np.exp(-np.asarray(dxx) / 2.0)
    kxy = np.exp(-np.asarray(dxy) / 2.0)
    kyy = np.exp(-np.asarray(dyy) / 2.0)
    e_kxx, e_kxy, e_kyy = (np_offdiag_mean(k) for k in (kxx, kxy, kyy))
    np.testing.assert_allclose(float(mmd1), e_kxx + e_kyy - 2 * e_kxy, rtol=1e-5)
    np.testing.assert_allclose(float(mmd2), -e_kxx + e_kyy, rtol=1e-5)


def test_mmd_g_bounded_matches_reference_formula(rng):
    """rmb discriminator loss uses bounded kernels (math_func.py:1386-1394)."""
    dxx, dxy, dyy, _, _ = make_dists(rng)
    w = [0.0, -1.0]
    mmd1, mmd2 = mmd_g_bounded(
        dxx, dxy, dyy, 8, sigma=1.0, lower_bound=0.25, upper_bound=4.0, custom_weights=w
    )
    kxx = np.exp(-np.asarray(dxx) / 2.0)
    kxy = np.exp(-np.asarray(dxy) / 2.0)
    kyy = np.exp(-np.asarray(dyy) / 2.0)
    kxx_b = np.exp(-np.maximum(np.asarray(dxx), 0.25) / 2.0)
    kyy_b = np.exp(-np.minimum(np.asarray(dyy), 4.0) / 2.0)  # w1 <= 0
    e = np_offdiag_mean
    np.testing.assert_allclose(float(mmd1), e(kxx) + e(kyy) - 2 * e(kxy), rtol=1e-5)
    # w0=0 -> k_xy_b = k_xy; loss = 0*e_kxy_b - e_kxx_b + e_kyy_b
    np.testing.assert_allclose(float(mmd2), -e(kxx_b) + e(kyy_b), rtol=1e-5)


def test_mixture_is_sum(rng):
    dxx, dxy, dyy, _, _ = make_dists(rng)
    sigmas = [1.0, 2.0]
    got = float(mixture_mmd_g(dxx, dxy, dyy, 8, sigma=sigmas))
    expect = sum(float(mmd_g(dxx, dxy, dyy, 8, sigma=s)) for s in sigmas)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_mmd_t_numpy_parity(rng):
    dxx, dxy, dyy, _, _ = make_dists(rng)
    a, b = 0.5, 2.0
    got = float(mmd_t(dxx, dxy, dyy, 8, alpha=a, beta=b))
    def k(d):
        return (np.asarray(d) / (a * b) + 1.0) ** (-a)
    expect = np_offdiag_mean(k(dxx)) + np_offdiag_mean(k(dyy)) - 2 * np_offdiag_mean(k(dxy))
    np.testing.assert_allclose(got, expect, rtol=1e-3)


def test_mixture_mmd_t_var_target(rng):
    dxx, dxy, dyy, _, _ = make_dists(rng)
    mmd, loss_a = mixture_mmd_t(dxx, dxy, dyy, 8, alpha=[0.5, 1.0], var_targets=[0.1, 0.2])
    assert np.isfinite(float(mmd)) and float(loss_a) >= 0


def test_cramer_zero_on_identical(rng):
    x = rng.randn(8, 4).astype(np.float32)
    dxx = jnp.asarray(np_pairwise(x, x))
    got = float(cramer(dxx, dxx, dxx, 8))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_witness_g_reference_scaling(rng):
    """witness_g uses exp(-d/(2*sigma)) — sigma NOT squared (math_func.py:1493)."""
    dzx = jnp.asarray(np_pairwise(rng.randn(5, 3), rng.randn(6, 3)).astype(np.float32))
    dzy = jnp.asarray(np_pairwise(rng.randn(5, 3), rng.randn(6, 3)).astype(np.float32))
    got = np.asarray(witness_g(dzx, dzy, sigma=2.0))
    expect = np.exp(-np.asarray(dzx) / 4.0).mean(1) - np.exp(-np.asarray(dzy) / 4.0).mean(1)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_witness_t(rng):
    dzx = jnp.asarray(np_pairwise(rng.randn(5, 3), rng.randn(6, 3)).astype(np.float32))
    dzy = jnp.asarray(np_pairwise(rng.randn(5, 3), rng.randn(6, 3)).astype(np.float32))
    got = np.asarray(witness_t(dzx, dzy, alpha=1.0, beta=2.0))
    kzx = (np.asarray(dzx) / 2.0 + 1.0) ** -1.0
    kzy = (np.asarray(dzy) / 2.0 + 1.0) ** -1.0
    np.testing.assert_allclose(got, kzx.mean(1) - kzy.mean(1), rtol=1e-3, atol=1e-5)


def test_mmd_g_xn_closed_form_normal():
    """For x ~ N(0, I_d), mmd_g_xn(x, y_var=1) should be near zero for large B."""
    rs = np.random.RandomState(0)
    d, b = 2, 2048
    x = rs.randn(b, d).astype(np.float32)
    got = float(mmd_g_xn(b, d, sigma=1.0, x=jnp.asarray(x)))
    assert abs(got) < 5e-2, got


def test_rand_mmd_g_newton_hits_omega(rng):
    """After Newton iterations the mean kernel value matches omega."""
    x = rng.randn(16, 8).astype(np.float32)
    y = rng.randn(16, 8).astype(np.float32) * 2.0
    dxx, dxy, dyy = get_squared_dist(jnp.asarray(x), jnp.asarray(y), mode="xxxyyy")
    omega = 0.5
    # re-derive beta via the same iteration and verify convergence
    beta = -np.log(omega) / (np.asarray(dxy).mean() + 1e-10)
    for _ in range(8):
        k = np.exp(-np.asarray(dxy) * beta)
        f = k.mean() - omega
        g = (-k * np.asarray(dxy)).mean()
        beta = beta - f / (g + 1e-10)
    k = np.exp(-np.asarray(dxy) * beta)
    np.testing.assert_allclose(k.mean(), omega, rtol=1e-3)
    # and the jax loss is finite + differentiable
    loss = rand_mmd_g_xy(dxx, dxy, dyy, 16, omega=omega, max_iter=3)
    assert np.isfinite(float(loss))


def test_rand_mmd_g_combined(rng):
    s = rng.randn(12, 4).astype(np.float32)
    t = rng.randn(12, 4).astype(np.float32)
    dist_all = get_squared_dist(jnp.concatenate([jnp.asarray(s), jnp.asarray(t)]), mode="xx")
    loss = rand_mmd_g(dist_all, 12, omega=0.5, max_iter=3)
    assert np.isfinite(float(loss))


def test_rand_mmd_g_xy_bounded_returns_pair(rng):
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 4).astype(np.float32)
    dxx, dxy, dyy = get_squared_dist(jnp.asarray(x), jnp.asarray(y), mode="xxxyyy")
    mmd, mmd_b = rand_mmd_g_xy_bounded(dxx, dxy, dyy, 8, omega=0.5, max_iter=3)
    assert np.isfinite(float(mmd)) and np.isfinite(float(mmd_b))


def test_rand_mmd_g_xn_finite(rng):
    x = rng.randn(8, 4).astype(np.float32)
    out = rand_mmd_g_xn(jnp.asarray(x), 1.0, 8, 4, omega=0.5, max_iter=3)
    assert np.isfinite(float(out))


def test_losses_are_differentiable(rng):
    """grad flows through the full rep loss including Newton iterations."""
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 4).astype(np.float32))

    def loss_fn(x):
        dxx, dxy, dyy = get_squared_dist(x, y, mode="xxxyyy")
        m1, m2 = mmd_g(dxx, dxy, dyy, 8, sigma=1.0, custom_weights=[0.0, -1.0])
        return m1 + m2

    g = jax.grad(loss_fn)(x)
    assert np.isfinite(np.asarray(g)).all()

    def loss_fn2(x):
        dxx, dxy, dyy = get_squared_dist(x, y, mode="xxxyyy")
        return rand_mmd_g_xy(dxx, dxy, dyy, 8, omega=0.5, max_iter=3)

    g2 = jax.grad(loss_fn2)(x)
    assert np.isfinite(np.asarray(g2)).all()


def test_mixture_with_aux_var_targets():
    """with_aux must be honored on the var_targets path too (the trailing
    aux dict joins the (mmd, loss_sigma) pair)."""
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.rand(8, 8) + 0.1)
    m0, ls0 = mixture_mmd_g(s, s, s, 8, sigma=[1.0, 2.0],
                            var_targets=[0.1, 0.2])
    m1, ls1, aux = mixture_mmd_g(s, s, s, 8, sigma=[1.0, 2.0],
                                 var_targets=[0.1, 0.2], with_aux=True)
    np.testing.assert_allclose(float(m0), float(m1))
    np.testing.assert_allclose(float(ls0), float(ls1))
    assert "sigma_0/e_kxx" in aux and "sigma_1/e_kyy" in aux
    from mmdgan_tpu.ops.kernels import mixture_mmd_t as _mmt
    m0, la0 = _mmt(s, s, s, 8, alpha=[0.5, 1.0], var_targets=[0.1, 0.2])
    m1, la1, aux = _mmt(s, s, s, 8, alpha=[0.5, 1.0],
                        var_targets=[0.1, 0.2], with_aux=True)
    np.testing.assert_allclose(float(m0), float(m1))
    assert "alpha_1/e_kxy" in aux
