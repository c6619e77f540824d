"""Golden-value tests: each dispatcher loss vs an independent float64
numpy implementation of the reference formulas (math_func.py citations in
each case)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmdgan_tpu.ops.losses import GANLoss, LossState, gan_loss

B, D = 8, 4


def np_pd(x, y):
    return np.maximum(
        (x * x).sum(1)[:, None] - 2 * x @ y.T + (y * y).sum(1)[None, :], 0.0)


def np_offdiag(m):
    n = m.shape[0]
    return (m.sum() - np.trace(m)) / (n * (n - 1))


def np_mmd_g(dxx, dxy, dyy, sigma, lb=None, ub=None):
    t = 2 * sigma ** 2
    kxx = np.exp(-(np.maximum(dxx, lb) if lb is not None else dxx) / t)
    kyy = np.exp(-(np.maximum(dyy, lb) if lb is not None else dyy) / t)
    kxy = np.exp(-(np.minimum(dxy, ub) if ub is not None else dxy) / t)
    return np_offdiag(kxx) + np_offdiag(kyy) - 2 * np_offdiag(kxy)


def scores(rng):
    s_gen = rng.randn(B, D).astype(np.float64)
    s_x = rng.randn(B, D).astype(np.float64)
    return s_gen, s_x


def test_mgb_golden(rng):
    """'mgb' (math_func.py:2175-2193): gen = plain mmd_g(sigma=1); dis =
    -mmd with dxx/dyy lower-bounded 0.25 and dxy upper-bounded 4."""
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(jnp.asarray(s_gen, jnp.float32),
                         jnp.asarray(s_x, jnp.float32), "mgb", batch_size=B)
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)
    np.testing.assert_allclose(float(lg), np_mmd_g(dgg, dgx, dxx, 1.0), rtol=1e-4)
    np.testing.assert_allclose(
        float(ld), -np_mmd_g(dgg, dgx, dxx, 1.0, lb=0.25, ub=4.0), rtol=1e-4)


def test_mmd_g_dispatcher_golden(rng):
    """'mmd_g' uses the sigma mixture (math_func.py:2108, 2160-2173)."""
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(jnp.asarray(s_gen, jnp.float32),
                         jnp.asarray(s_x, jnp.float32), "mmd_g", batch_size=B)
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)
    sigmas = [1.0, np.sqrt(2.0), 2.0, np.sqrt(8.0), 4.0]
    expect = sum(np_mmd_g(dgg, dgx, dxx, s) for s in sigmas)
    np.testing.assert_allclose(float(lg), expect, rtol=1e-4)
    np.testing.assert_allclose(float(ld), -expect, rtol=1e-4)


def test_mmd_t_dispatcher_golden(rng):
    """'mmd_t' alpha mixture (math_func.py:2110, 1087-1141)."""
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(jnp.asarray(s_gen, jnp.float32),
                         jnp.asarray(s_x, jnp.float32), "mmd_t", batch_size=B)
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)

    def t_mmd(a, beta=2.0):
        k = lambda d: (d / (beta * a) + 1.0) ** (-a)
        return np_offdiag(k(dgg)) + np_offdiag(k(dxx)) - 2 * np_offdiag(k(dgx))

    expect = sum(t_mmd(a) for a in (0.2, 0.5, 1.0, 2.0, 5.0))
    np.testing.assert_allclose(float(lg), expect, rtol=1e-3)


def test_cramer_golden(rng):
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(jnp.asarray(s_gen, jnp.float32),
                         jnp.asarray(s_x, jnp.float32), "cramer", batch_size=B)
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)
    k = lambda d: -np.sqrt(d + 1e-16)
    expect = np_offdiag(k(dgg)) + np_offdiag(k(dxx)) - 2 * np_offdiag(k(dgx))
    np.testing.assert_allclose(float(lg), expect, rtol=1e-4)
    np.testing.assert_allclose(float(ld), -expect, rtol=1e-4)


def test_rand_g_pinned_omega_golden(rng):
    """'rand_g' with a fixed omega (tuple collapses to a scalar draw range
    of zero width): beta via 3 Newton iterations from the geometric-mean
    init (math_func.py:1714-1722), then plain mmd (:1734-1759)."""
    s_gen, s_x = scores(rng)
    omega = 0.4
    loss = GANLoss(omega_range=(omega, omega))
    lg, ld, _, _ = loss.apply(jnp.asarray(s_gen, jnp.float32),
                           jnp.asarray(s_x, jnp.float32), "rand_g",
                           batch_size=B, d=D, rng=jax.random.PRNGKey(0))
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)
    beta = -np.log(omega) / np.mean(dgx + 1e-10)
    for _ in range(3):
        k = np.exp(-dgx * beta)
        f = k.mean() - omega
        df = (-k * dgx).mean()
        beta = beta - f / (df + 1e-10)
    k = lambda d: np.exp(-d * beta)
    loss_gr = (np_offdiag(k(dgg)) + np_offdiag(k(dxx)) - 2 * np_offdiag(k(dgx)))
    np.testing.assert_allclose(float(lg), loss_gr, rtol=1e-3)


def test_sym_rg_structure(rng, key):
    """'sym_rg' (math_func.py:2434-2458): loss_dis = 0.5(rn+gn) - gr with
    shifted reference normals — verify loss_gen == the gr term computed at
    the same omega."""
    s_gen, s_x = scores(rng)
    omega = 0.3
    loss = GANLoss(omega_range=(omega, omega))
    lg, ld, _, _ = loss.apply(jnp.asarray(s_gen, jnp.float32),
                           jnp.asarray(s_x, jnp.float32), "sym_rg",
                           batch_size=B, d=D, rng=key)
    from mmdgan_tpu.ops.distance import get_squared_dist
    from mmdgan_tpu.ops.kernels import rand_mmd_g_xy

    d_gg, d_gx, d_xx = get_squared_dist(
        jnp.asarray(s_gen, jnp.float32), jnp.asarray(s_x, jnp.float32),
        mode="xxxyyy")
    gr = rand_mmd_g_xy(d_gg, d_gx, d_xx, B, omega=omega, max_iter=3)
    np.testing.assert_allclose(float(lg), float(gr), rtol=1e-5)


def test_mix_loss_gen_term(rng, key):
    """'mmd_g_mix' loss_gen equals the unmixed sigma-mixture MMD
    (math_func.py:2208-2210); the dis side uses mixed groups."""
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(jnp.asarray(s_gen, jnp.float32),
                         jnp.asarray(s_x, jnp.float32), "mmd_g_mix",
                         batch_size=B, rng=key, state=LossState.init())
    dgg, dgx, dxx = np_pd(s_gen, s_gen), np_pd(s_gen, s_x), np_pd(s_x, s_x)
    sigmas = [1.0, np.sqrt(2.0), 2.0, np.sqrt(8.0), 4.0]
    expect = sum(np_mmd_g(dgg, dgx, dxx, s) for s in sigmas)
    np.testing.assert_allclose(float(lg), expect, rtol=1e-4)
    # initial state has mix_prob = 0 -> no mixing -> loss_dis = -loss_gen
    np.testing.assert_allclose(float(ld), -expect, rtol=1e-4)
