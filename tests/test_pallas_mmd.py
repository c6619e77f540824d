"""Fused Pallas MMD kernel vs the reference JAX implementation
(interpreter mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmdgan_tpu.ops.distance import get_squared_dist
from mmdgan_tpu.ops.kernels import mmd_g, mmd_g_bounded
from mmdgan_tpu.ops.pallas_mmd import (
    fused_kernel_means,
    repulsive_mmd_g_bounded_pallas,
    repulsive_mmd_g_pallas,
)

B, D = 64, 16


def scores(rng):
    return (
        jnp.asarray(rng.randn(B, D).astype(np.float32)),
        jnp.asarray(rng.randn(B, D).astype(np.float32)),
    )


def test_rep_matches_reference(rng):
    s_gen, s_x = scores(rng)
    lg_p, ld_p = repulsive_mmd_g_pallas(s_gen, s_x, sigma=1.0)
    d_gg, d_gx, d_xx = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    lg_r, ld_r = mmd_g(d_gg, d_gx, d_xx, B, sigma=1.0, custom_weights=[0.0, -1.0])
    np.testing.assert_allclose(float(lg_p), float(lg_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ld_p), float(ld_r), rtol=1e-5, atol=1e-6)


def test_rmb_matches_reference(rng):
    s_gen, s_x = scores(rng)
    lg_p, ld_p = repulsive_mmd_g_bounded_pallas(s_gen, s_x, sigma=1.0)
    d_gg, d_gx, d_xx = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    lg_r, ld_r = mmd_g_bounded(
        d_gg, d_gx, d_xx, B, sigma=1.0, lower_bound=0.25, upper_bound=4.0,
        custom_weights=[0.0, -1.0])
    np.testing.assert_allclose(float(lg_p), float(lg_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ld_p), float(ld_r), rtol=1e-5, atol=1e-6)


def test_nonaligned_batch_and_dim(rng):
    """Odd shapes exercise the padding/masking path."""
    s_gen = jnp.asarray(rng.randn(23, 5).astype(np.float32))
    s_x = jnp.asarray(rng.randn(23, 5).astype(np.float32))
    lg_p, ld_p = repulsive_mmd_g_pallas(s_gen, s_x, sigma=1.0)
    d_gg, d_gx, d_xx = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    lg_r, ld_r = mmd_g(d_gg, d_gx, d_xx, 23, sigma=1.0, custom_weights=[0.0, -1.0])
    np.testing.assert_allclose(float(lg_p), float(lg_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ld_p), float(ld_r), rtol=1e-5, atol=1e-6)


def test_gradients_match_reference(rng):
    s_gen, s_x = scores(rng)

    def f_pallas(a, b):
        lg, ld = repulsive_mmd_g_pallas(a, b, sigma=1.0)
        return lg + 0.5 * ld

    def f_ref(a, b):
        d_gg, d_gx, d_xx = get_squared_dist(a, b, mode="xxxyyy")
        lg, ld = mmd_g(d_gg, d_gx, d_xx, B, sigma=1.0, custom_weights=[0.0, -1.0])
        return lg + 0.5 * ld

    g_p = jax.grad(f_pallas, argnums=(0, 1))(s_gen, s_x)
    g_r = jax.grad(f_ref, argnums=(0, 1))(s_gen, s_x)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_loss_dispatcher_pallas_flag(rng):
    """GANLoss(use_pallas=True) routes rep/rmb through the fused kernel
    and matches the plain path."""
    from mmdgan_tpu.ops.losses import gan_loss

    s_gen, s_x = scores(rng)
    for loss_type in ("rep", "rmb"):
        lg_p, ld_p, _, _ = gan_loss(s_gen, s_x, loss_type, batch_size=B, use_pallas=True)
        lg_r, ld_r, _, _ = gan_loss(s_gen, s_x, loss_type, batch_size=B)
        np.testing.assert_allclose(float(lg_p), float(lg_r), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(ld_p), float(ld_r), rtol=1e-5, atol=1e-6)


def test_means_vector(rng):
    s_gen, s_x = scores(rng)
    e = fused_kernel_means(s_gen, s_x, 1.0)
    assert e.shape == (6,)
    # e_kxy_b == e_kxy in the repulsive direction
    np.testing.assert_allclose(float(e[1]), float(e[4]), rtol=1e-6)
