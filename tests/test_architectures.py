"""Every shipped dataset architecture builds, initializes, and takes one
train step (the reference my_test_* architecture dicts, experiments/
architectures.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experiments.architectures import (
    celeba_architecture,
    cifar_architecture,
    lsun_architecture,
    stl_architecture,
)
from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config

CASES = {
    "cifar": (cifar_architecture, (3, 32, 32), 128),
    "stl": (stl_architecture, (3, 48, 48), 128),
    "celeba": (celeba_architecture, (3, 64, 64), 128),
    "lsun": (lsun_architecture, (3, 64, 64), 128),
}


@pytest.mark.parametrize("name", list(CASES))
def test_architecture_one_step(name, key):
    fn, chw, code = CASES[name]
    arch_d = fn()
    arch = {"input": [chw], "code": [(code, "linear")],
            "generator": arch_d["generator"],
            "discriminator": arch_d["discriminator"]}
    model = SNGan(arch, num_class=0, loss_type="rep",
                  compute_dtype=jnp.float32)
    opt_d, opt_g = multi_opt_config([1e-3, 5e-4])
    ts = init_train_state(model, key, opt_d, opt_g)
    step = jax.jit(build_train_step(model, opt_d, opt_g))
    c, h, w = chw
    batch = {"x": jnp.asarray(
        np.random.RandomState(0).randn(4, h, w, c), jnp.float32), "y": None}
    t = jnp.ones(())
    ts, m = step(ts, batch, t, t)
    assert int(ts.step) == 1
    assert np.isfinite(float(m["loss_gen"])), name
    img = model.generate(ts.params, ts.net_state, key, batch_size=2)
    assert img.shape == (2, h, w, c)
