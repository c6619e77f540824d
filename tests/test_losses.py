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
    lg, ld, state, _ = gan_loss(s_gen, s_x, loss_type, **kwargs)
    assert np.isfinite(float(lg)), loss_type
    assert np.isfinite(float(ld)), loss_type


@pytest.mark.parametrize("loss_type", ["logistic", "hinge", "rep", "rmb", "rand_g"])
def test_losses_differentiable(rng, key, loss_type):
    s_gen, s_x = scores(rng)

    def f(s):
        lg, ld, _, _ = gan_loss(s, s_x, loss_type, batch_size=B, d=D, rng=key)
        return lg + ld

    g = jax.grad(f)(s_gen)
    assert np.isfinite(np.asarray(g)).all(), loss_type


def test_logistic_formula(rng):
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(s_gen, s_x, "logistic")
    sp = lambda v: np.log1p(np.exp(np.asarray(v)))
    np.testing.assert_allclose(
        float(ld), (sp(s_gen) + sp(-s_x)).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(float(lg), sp(-s_gen).mean(), rtol=1e-5)


def test_hinge_formula(rng):
    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(s_gen, s_x, "hinge")
    np.testing.assert_allclose(
        float(ld),
        np.maximum(1 + np.asarray(s_gen), 0).mean() + np.maximum(1 - np.asarray(s_x), 0).mean(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(float(lg), -np.asarray(s_gen).mean(), rtol=1e-5)


def test_wasserstein_formula(rng):
    s_gen, s_x = scores(rng)
    pen = jnp.asarray(0.3)
    lg, ld, _, _ = gan_loss(s_gen, s_x, "wasserstein", dis_penalty=pen)
    expect_gen = np.asarray(s_x).mean() - np.asarray(s_gen).mean()
    np.testing.assert_allclose(float(lg), expect_gen, rtol=1e-5)
    np.testing.assert_allclose(float(ld), -expect_gen + 0.3, rtol=1e-5)


def test_rep_is_mmd_g_with_custom_weights(rng):
    """'rep' == mmd_g(sigma=1, custom_weights=rep_weights)."""
    from mmdgan_tpu.ops.distance import get_squared_dist
    from mmdgan_tpu.ops.kernels import mmd_g

    s_gen, s_x = scores(rng)
    lg, ld, _, _ = gan_loss(s_gen, s_x, "rep", batch_size=B)
    d_gg, d_gd, d_dd = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    m1, m2 = mmd_g(d_gg, d_gd, d_dd, B, sigma=1.0, custom_weights=[0.0, -1.0])
    np.testing.assert_allclose(float(lg), float(m1), rtol=1e-6)
    np.testing.assert_allclose(float(ld), float(m2), rtol=1e-6)


def test_rep_ds_scaling(rng):
    s_gen, s_x = scores(rng)
    lg0, ld0, _, _ = gan_loss(s_gen, s_x, "rep", batch_size=B)
    lg1, ld1, _, _ = gan_loss(s_gen, s_x, "rep_ds", batch_size=B, dis_scale=jnp.asarray(2.0))
    # rep_ds: loss_dis = (loss_dis - 1) * scale (math_func.py:2524-2525)
    np.testing.assert_allclose(float(ld1), (float(ld0) - 1.0) * 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(lg1), float(lg0), rtol=1e-6)


def test_mix_coin_state_updates(rng, key):
    s_gen, s_x = scores(rng)
    state0 = LossState.init()
    lg, ld, state1, _ = gan_loss(
        s_gen, s_x, "mmd_g_mix", batch_size=B, rng=key, state=state0, mix_threshold=0.2
    )
    # moving average moved toward the loss
    assert float(state1.loss_average) != 0.0
    # prob stays within [0, 0.5]
    assert 0.0 <= float(state1.mix_prob) <= 0.5


def test_instance_noise_state(rng, key):
    s_gen, s_x = scores(rng)
    lg, ld, state, _ = gan_loss(
        s_gen, s_x, "instance_noise", batch_size=B, d=D, rng=key, state=LossState.init()
    )
    assert np.isfinite(float(lg))
    assert float(state.ins_sigma) >= 0.0


def test_losses_jit_compatible(rng, key):
    s_gen, s_x = scores(rng)

    @jax.jit
    def step(s_gen, s_x, key, state):
        return gan_loss(s_gen, s_x, "rmb", batch_size=B, rng=key, state=state)

    lg, ld, state, aux = step(s_gen, s_x, key, LossState.init())
    assert np.isfinite(float(lg)) and np.isfinite(float(ld))
    assert np.isfinite(float(aux["e_kxx"]))


def test_unknown_loss_raises(rng):
    s_gen, s_x = scores(rng)
    with pytest.raises(NotImplementedError):
        gan_loss(s_gen, s_x, "nope", batch_size=B)


# ---------------------------------------------------------------------------
# loss-internals observability (the reference's per-loss TB summaries,
# math_func.py:1329-1333, :806-838)
# ---------------------------------------------------------------------------

def test_rep_aux_kernel_means_exact(rng, key):
    """aux e_kxx/e_kxy/e_kyy match direct off-diagonal kernel means, and
    loss_dis reconstructs from them (w0*e_kxy - e_kxx - w1*e_kyy)."""
    s_gen, s_x = scores(rng)
    lg, ld, _, aux = gan_loss(s_gen, s_x, "rep", batch_size=B, rng=key)

    def offdiag(m):
        m = np.asarray(m)
        return (m.sum() - np.trace(m)) / (B * (B - 1))

    def pd(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)

    e_kxx = offdiag(np.exp(-pd(s_gen, s_gen) / 2.0))
    e_kxy = offdiag(np.exp(-pd(s_gen, s_x) / 2.0))
    e_kyy = offdiag(np.exp(-pd(s_x, s_x) / 2.0))
    np.testing.assert_allclose(float(aux["e_kxx"]), e_kxx, rtol=1e-5)
    np.testing.assert_allclose(float(aux["e_kxy"]), e_kxy, rtol=1e-5)
    np.testing.assert_allclose(float(aux["e_kyy"]), e_kyy, rtol=1e-5)
    # repulsive dis loss: w0*e_kxy - e_kxx - w1*e_kyy with w=(0,-1)
    np.testing.assert_allclose(
        float(ld), -e_kxx + e_kyy, rtol=1e-5)


def test_aux_diagnoses_saturation(key):
    """The rep-saturation mode (generator collapse): identical generated
    scores drive e_kxx -> 1 and loss_gen -> ~1 — exactly the signature
    the aux scalars must make visible (VERDICT r2 item 1)."""
    s_gen = jnp.zeros((B, D), jnp.float32)  # collapsed generator
    s_x = jnp.asarray(np.random.RandomState(0).randn(B, D) * 3, jnp.float32)
    lg, ld, _, aux = gan_loss(s_gen, s_x, "rep", batch_size=B, rng=key)
    assert float(aux["e_kxx"]) == pytest.approx(1.0, abs=1e-6)
    assert float(aux["e_kxy"]) < 0.5


def test_histogram_aux_counts(rng, key):
    """hist/* fixed-bin counts are present when summary_histograms and
    sum to the number of histogrammed elements."""
    s_gen, s_x = scores(rng)
    hp = GANLoss(summary_histograms=True)
    lg, ld, _, aux = hp.apply(s_gen, s_x, "rmb", batch_size=B, rng=key)
    for k, n in [("hist/d_xx", B * B), ("hist/d_xy", B * B),
                 ("hist/d_yy", B * B), ("hist/score_gen", B * D),
                 ("hist/score_x", B * D)]:
        assert k in aux, k
        assert aux[k].shape == (64,)
        assert float(jnp.sum(aux[k])) == n, k
    # off by default
    _, _, _, aux0 = GANLoss().apply(s_gen, s_x, "rmb", batch_size=B, rng=key)
    assert not any(k.startswith("hist/") for k in aux0)


def test_stateful_aux_tracks_state(rng, key):
    """Stateful losses surface the evolving coin state in aux; values
    equal the returned LossState fields."""
    s_gen, s_x = scores(rng)
    lg, ld, state, aux = gan_loss(
        s_gen, s_x, "mmd_g_mix", batch_size=B, rng=key, state=LossState.init())
    assert float(aux["state/loss_average"]) == float(state.loss_average)
    assert float(aux["state/mix_prob"]) == float(state.mix_prob)


def test_penalty_and_beta_aux(rng, key):
    s_gen, s_x = scores(rng)
    _, _, _, aux = gan_loss(
        s_gen, s_x, "rmb_gp", batch_size=B, rng=key,
        dis_penalty=jnp.asarray(0.37))
    assert float(aux["dis_penalty"]) == pytest.approx(0.37)
    _, _, _, aux = gan_loss(s_gen, s_x, "rand_g", batch_size=B, d=D, rng=key)
    assert float(aux["beta"]) > 0.0 and "omega" in aux and "rn/beta" in aux
