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


def test_bench_arch_lookup_covers_every_choice():
    """bench.py's arch/image-size lookup accepts every --arch choice —
    regression for the hd128 KeyError that crashed `--arch all` after
    the lsun line (the img dict had not been extended with the arch
    dict)."""
    import bench

    for name, img in (("cifar", 32), ("stl", 48), ("celeba", 64),
                      ("lsun", 64), ("hd128", 128), ("hd256", 256),
                      ("hd512", 512)):
        arch, got = bench._arch_and_img(name)
        assert got == img, name
        assert {"input", "code", "generator", "discriminator"} <= set(arch)
        assert name in bench.BASELINES, name


@pytest.mark.parametrize("size", [128, 256, 512])
def test_hd_architecture_builds_and_generates(size):
    """Beyond-reference 128/256 architectures: the builder's shape
    inference closes, the generator emits [B, size, size, 3], and the
    discriminator scores the concat batch."""
    import jax
    import jax.numpy as jnp

    from experiments.architectures import hd_architecture
    from mmdgan_tpu.models import SNGan

    model = SNGan(hd_architecture(size), num_class=0, loss_type="rmb",
                  compute_dtype=jnp.float32)
    params, state, _ = model.init(jax.random.PRNGKey(0))
    imgs = model.generate(params, state, rng=jax.random.PRNGKey(1),
                          batch_size=2)
    assert imgs.shape == (2, size, size, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    dis_out, _ = model.Dis.apply(params["dis"], state["dis"],
                                 {"x": imgs, "y": None}, train=False)
    assert dis_out["x"].shape == (2, 16)


def test_hd_architecture_conditional_builds_and_generates():
    """conditional x hd (VERDICT r4 item 5): the cbn/dck transform
    composes with the extrapolated family — generator BNs become cbn,
    the score head dck, and both nets run with labels."""
    import jax
    import jax.numpy as jnp

    from experiments.architectures import hd_architecture
    from mmdgan_tpu.models import SNGan

    arch = hd_architecture(128, conditional=True)
    assert all(l["act_nm"] == "cbn" for l in arch["generator"]
               if l.get("act_nm") in ("bn", "cbn"))
    assert arch["discriminator"][-1]["op"] == "dck"

    model = SNGan(arch, num_class=4, loss_type="rmb",
                  compute_dtype=jnp.float32)
    params, state, _ = model.init(jax.random.PRNGKey(0))
    labels = np.array([0, 3], np.int64)
    imgs = model.generate(params, state, rng=jax.random.PRNGKey(1),
                          labels=labels)
    assert imgs.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    dis_out, _ = model.Dis.apply(
        params["dis"], state["dis"],
        {"x": imgs, "y": labels.reshape(-1, 1)}, train=False)
    assert dis_out["x"].shape == (2, 16)
