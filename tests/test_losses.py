"""Tests for the GANLoss dispatcher: every loss type runs, is finite,
differentiable, and the simple losses match hand computations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmdgan_tpu.ops.losses import GANLoss, LossState, gan_loss

B, D = 8, 4

ALL_LOSSES = [
    "logistic", "hinge", "wasserstein",
    "mmd_g", "fixed_g", "mgb", "mmd_t", "fixed_t", "cramer",
    "mmd_g_mix", "fixed_g_mix", "sgm",
    "rand_g", "rgb", "rand_g_mix", "sym_rg_mix", "sym_rg",
    "instance_noise",
    "rep", "rep_gp", "rep_ds", "rmb", "rmb_gp", "rmb_ds",
    "test",
]


def scores(rng):
    return (
        jnp.asarray(rng.randn(B, D).astype(np.float32)),
        jnp.asarray(rng.randn(B, D).astype(np.float32)),
    )


@pytest.mark.parametrize("loss_type", ALL_LOSSES)
def test_all_losses_run_and_finite(rng, key, loss_type):
    s_gen, s_x = scores(rng)
    kwargs = dict(batch_size=B, d=D, rng=key, state=LossState.init())
    if loss_type in {"wasserstein", "rep_gp", "rmb_gp"}:
        kwargs["dis_penalty"] = jnp.asarray(0.1)
    if loss_type in {"rep_ds", "rmb_ds"}:
        kwargs["dis_scale"] = jnp.asarray(0.5)
    lg, ld, state = gan_loss(s_gen, s_x, loss_type, **kwargs)
    assert np.isfinite(float(lg)), loss_type
    assert np.isfinite(float(ld)), loss_type


@pytest.mark.parametrize("loss_type", ["logistic", "hinge", "rep", "rmb", "rand_g"])
def test_losses_differentiable(rng, key, loss_type):
    s_gen, s_x = scores(rng)

    def f(s):
        lg, ld, _ = gan_loss(s, s_x, loss_type, batch_size=B, d=D, rng=key)
        return lg + ld

    g = jax.grad(f)(s_gen)
    assert np.isfinite(np.asarray(g)).all(), loss_type


def test_logistic_formula(rng):
    s_gen, s_x = scores(rng)
    lg, ld, _ = gan_loss(s_gen, s_x, "logistic")
    sp = lambda v: np.log1p(np.exp(np.asarray(v)))
    np.testing.assert_allclose(
        float(ld), (sp(s_gen) + sp(-s_x)).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(float(lg), sp(-s_gen).mean(), rtol=1e-5)


def test_hinge_formula(rng):
    s_gen, s_x = scores(rng)
    lg, ld, _ = gan_loss(s_gen, s_x, "hinge")
    np.testing.assert_allclose(
        float(ld),
        np.maximum(1 + np.asarray(s_gen), 0).mean() + np.maximum(1 - np.asarray(s_x), 0).mean(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(float(lg), -np.asarray(s_gen).mean(), rtol=1e-5)


def test_wasserstein_formula(rng):
    s_gen, s_x = scores(rng)
    pen = jnp.asarray(0.3)
    lg, ld, _ = gan_loss(s_gen, s_x, "wasserstein", dis_penalty=pen)
    expect_gen = np.asarray(s_x).mean() - np.asarray(s_gen).mean()
    np.testing.assert_allclose(float(lg), expect_gen, rtol=1e-5)
    np.testing.assert_allclose(float(ld), -expect_gen + 0.3, rtol=1e-5)


def test_rep_is_mmd_g_with_custom_weights(rng):
    """'rep' == mmd_g(sigma=1, custom_weights=rep_weights)."""
    from mmdgan_tpu.ops.distance import get_squared_dist
    from mmdgan_tpu.ops.kernels import mmd_g

    s_gen, s_x = scores(rng)
    lg, ld, _ = gan_loss(s_gen, s_x, "rep", batch_size=B)
    d_gg, d_gd, d_dd = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    m1, m2 = mmd_g(d_gg, d_gd, d_dd, B, sigma=1.0, custom_weights=[0.0, -1.0])
    np.testing.assert_allclose(float(lg), float(m1), rtol=1e-6)
    np.testing.assert_allclose(float(ld), float(m2), rtol=1e-6)


def test_rep_ds_scaling(rng):
    s_gen, s_x = scores(rng)
    lg0, ld0, _ = gan_loss(s_gen, s_x, "rep", batch_size=B)
    lg1, ld1, _ = gan_loss(s_gen, s_x, "rep_ds", batch_size=B, dis_scale=jnp.asarray(2.0))
    # rep_ds: loss_dis = (loss_dis - 1) * scale (math_func.py:2524-2525)
    np.testing.assert_allclose(float(ld1), (float(ld0) - 1.0) * 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(lg1), float(lg0), rtol=1e-6)


def test_mix_coin_state_updates(rng, key):
    s_gen, s_x = scores(rng)
    state0 = LossState.init()
    lg, ld, state1 = gan_loss(
        s_gen, s_x, "mmd_g_mix", batch_size=B, rng=key, state=state0, mix_threshold=0.2
    )
    # moving average moved toward the loss
    assert float(state1.loss_average) != 0.0
    # prob stays within [0, 0.5]
    assert 0.0 <= float(state1.mix_prob) <= 0.5


def test_instance_noise_state(rng, key):
    s_gen, s_x = scores(rng)
    lg, ld, state = gan_loss(
        s_gen, s_x, "instance_noise", batch_size=B, d=D, rng=key, state=LossState.init()
    )
    assert np.isfinite(float(lg))
    assert float(state.ins_sigma) >= 0.0


def test_losses_jit_compatible(rng, key):
    s_gen, s_x = scores(rng)

    @jax.jit
    def step(s_gen, s_x, key, state):
        return gan_loss(s_gen, s_x, "rmb", batch_size=B, rng=key, state=state)

    lg, ld, state = step(s_gen, s_x, key, LossState.init())
    assert np.isfinite(float(lg)) and np.isfinite(float(ld))


def test_unknown_loss_raises(rng):
    s_gen, s_x = scores(rng)
    with pytest.raises(NotImplementedError):
        gan_loss(s_gen, s_x, "nope", batch_size=B)
