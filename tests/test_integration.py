"""Distribution-matching integration test (SURVEY.md §4): a small dense
GAN trained with the repulsive loss on a SimData toy distribution must
reduce the MMD between generated samples and the target."""

import numpy as np
import jax
import jax.numpy as jnp

from mmdgan_tpu.data import SimData
from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config
from mmdgan_tpu.ops.distance import get_squared_dist
from mmdgan_tpu.ops.kernels import mixture_mmd_g

# 2-D data presented as 1x1 "images" with 2 channels so the standard conv
# stack is bypassed via dense ops.
ARCH = {
    "input": [(2, 1, 1)],
    "code": [(8, "linear")],
    "generator": [
        {"name": "l1", "out": 32, "op": "d", "act": "relu", "act_nm": None,
         "in_reshape": [8]},
        {"name": "l2", "out": 32, "op": "d", "act": "relu"},
        {"name": "l3", "out": 2, "op": "d", "act": "linear",
         "out_reshape": [2, 1, 1]},
    ],
    "discriminator": [
        # act_k compensates the SN norm loss per layer (the paper's trick,
        # my_test_cifar.py:10) — without it scores collapse to ~1e-2 and
        # the MMD gradient vanishes
        {"name": "l1", "out": 32, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 2.0, "in_reshape": [2]},
        {"name": "l2", "out": 32, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 2.0},
        {"name": "l3", "out": 8, "op": "d", "w_nm": "s", "act_k": 2.0},
    ],
}


def _mmd_to_target(samples, target):
    d_gg, d_gt, d_tt = get_squared_dist(samples, target, mode="xxxyyy")
    return float(mixture_mmd_g(d_gg, d_gt, d_tt, samples.shape[0],
                               sigma=[0.1, 0.5, 1.0]))


def test_rep_gan_fits_gaussian(key):
    """An 800-step run is enough to fit a single Gaussian; the 8-mode
    'shell' needs tens of thousands of adversarial steps (the reference
    protocol runs 100k) and is out of scope for CI."""
    sim = SimData("normal", mu=[0.5, -0.3], std_or_cov=[0.4, 0.2],
                  batch_size=128, seed=1)
    model = SNGan(ARCH, loss_type="rep")
    opt_d, opt_g = multi_opt_config([2e-3, 1e-3], optimizer="adam")
    ts = init_train_state(model, key, opt_d, opt_g)
    step = jax.jit(build_train_step(model, opt_d, opt_g))
    t = jnp.asarray(True)

    def gen_samples(ts, n=256):
        host = jax.device_get(ts)
        x = model.generate(host.params, host.net_state,
                           rng=jax.random.PRNGKey(123), batch_size=n, clip=False)
        return jnp.asarray(np.asarray(x).reshape(n, 2))

    target = jnp.asarray(sim(512))
    mmd_before = _mmd_to_target(gen_samples(ts), target)
    for i in range(800):
        batch = {"x": sim(128).reshape(128, 1, 1, 2), "y": None}
        ts, m = step(ts, batch, t, t)
    samples = gen_samples(ts)
    mmd_after = _mmd_to_target(samples, target)
    assert np.isfinite(mmd_after)
    # the generator distribution must move substantially toward the target
    assert mmd_after < 0.7 * mmd_before, (mmd_before, mmd_after)
    gen_mean = np.asarray(samples).mean(0)
    np.testing.assert_allclose(gen_mean, [0.5, -0.3], atol=0.25)
