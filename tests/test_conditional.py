"""Class-conditional training: cbn generator, projection discriminator,
same-class batching — the reference's conditional capability surface
(layer_func.py conditional ops; my_sngan.py sample_same_class)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmdgan_tpu.data import synthetic_image_batches
from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config

NUM_CLASS = 4

COND_ARCH = {
    "input": [(1, 8, 8)],
    "code": [(16, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
         "act_nm": None, "out_reshape": [8, 4, 4]},
        {"name": "l2", "out": 4, "op": "tc", "act": "relu", "act_nm": "cbn",
         "kernel": 4, "strides": 2},
        {"name": "l3", "out": 1, "act": "tanh"},
    ],
    "discriminator": [
        {"name": "l1", "out": 8, "act": "lrelu", "act_k": 1.3, "w_nm": "s",
         "kernel": 3, "strides": 2, "out_reshape": [4 * 4 * 8]},
        {"name": "l2", "out": 1, "op": "d", "w_nm": "s", "type": "project"},
    ],
}

DCD_ARCH = {
    "input": [(1, 8, 8)],
    "code": [(16, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 4 * 4, "op": "dcd", "act": "linear",
         "act_nm": None, "out_reshape": [8, 4, 4]},
        {"name": "l2", "out": 4, "op": "tc", "act": "relu", "act_nm": "bn",
         "kernel": 4, "strides": 2},
        {"name": "l3", "out": 1, "act": "tanh"},
    ],
    "discriminator": [
        {"name": "l1", "out": 8, "op": "cck", "act": "lrelu", "act_k": 1.3,
         "w_nm": "s", "kernel": 3, "strides": 2, "out_reshape": [4 * 4 * 8]},
        {"name": "l2", "out": 4, "op": "dck", "w_nm": "s"},
    ],
}


@pytest.mark.parametrize("arch,loss", [(COND_ARCH, "hinge"), (DCD_ARCH, "rep")])
def test_conditional_training_loop(key, arch, loss):
    model = SNGan(arch, num_class=NUM_CLASS, loss_type=loss)
    model.sample_same_class = True
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, key, opt_d, opt_g)
    step = jax.jit(build_train_step(model, opt_d, opt_g))
    data = synthetic_image_batches(8, 8, 8, 1, num_class=NUM_CLASS)
    t = jnp.asarray(True)
    for i in range(3):
        ts, m = step(ts, next(data), t, t)
    assert np.isfinite(float(m["loss_gen"]))
    assert int(ts.step) == 3


def test_conditional_generation_per_class(key):
    model = SNGan(COND_ARCH, num_class=NUM_CLASS, loss_type="hinge")
    params, state, _ = model.init(key)
    # fixed class generation (code_y as int, my_sngan.py:139-140)
    code = model.sample_codes(key, 6, code_y=2)
    imgs = model.generate(params, state, code_batch=code)
    assert imgs.shape == (6, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(code["y"]).ravel(), [2] * 6)


def test_conditional_scores_depend_on_label(key):
    """The projection discriminator must produce label-dependent scores."""
    model = SNGan(COND_ARCH, num_class=NUM_CLASS, loss_type="hinge")
    params, state, _ = model.init(key)
    x = jax.random.normal(key, (5, 8, 8, 1))
    s0 = model.discriminate(params, state, {"x": x, "y": jnp.zeros((5, 1), jnp.int32)})
    s1 = model.discriminate(params, state, {"x": x, "y": jnp.ones((5, 1), jnp.int32)})
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_generate_labels_kwarg(key):
    """generate(labels=...) convenience: int, [N] and [N,1] forms."""
    model = SNGan(COND_ARCH, num_class=NUM_CLASS, loss_type="hinge")
    params, state, _ = model.init(key)
    imgs = model.generate(params, state, key, batch_size=5, labels=3)
    assert imgs.shape == (5, 8, 8, 1)
    y = jnp.asarray([0, 1, 2, 3])
    a = model.generate(params, state, key, labels=y)  # batch from labels
    b = model.generate(params, state, key, labels=y[:, None], batch_size=4)
    assert a.shape == (4, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_discriminate_raw_array_with_labels(key):
    model = SNGan(COND_ARCH, num_class=NUM_CLASS, loss_type="hinge")
    params, state, _ = model.init(key)
    x = jax.random.normal(key, (5, 8, 8, 1))
    y = jnp.full((5,), 2, jnp.int32)
    s_raw = model.discriminate(params, state, x, labels=y)
    s_dict = model.discriminate(params, state, {"x": x, "y": y[:, None]})
    np.testing.assert_allclose(np.asarray(s_raw), np.asarray(s_dict))
