"""Tests for auxiliary utilities: Fig plots, SWD, checkpoint inspection,
event/metric reading."""

import os

import numpy as np
import jax
import pytest


def test_fig_plots(tmp_path, rng):
    from mmdgan_tpu.utils.fig import Fig

    fig = Fig(fig_folder=str(tmp_path))
    p1 = fig.hist(rng.randn(500), filename="h")
    p2 = fig.hist2d(rng.randn(500, 2), filename="h2")
    p3 = fig.scatter(rng.randn(100, 2), labels=np.arange(100) % 3, filename="sc")
    p4 = fig.contour(lambda p: (p ** 2).sum(1), filename="ct")
    p5 = fig.text_scatter(rng.randn(10, 2), [str(i) for i in range(10)], filename="ts")
    for p in (p1, p2, p3, p4, p5):
        assert os.path.isfile(p)


def test_swd_sanity(rng, key):
    from mmdgan_tpu.metrics.swd import sliced_wasserstein_distance

    x = rng.rand(32, 32, 32, 3).astype(np.float32) * 2 - 1
    y_same = rng.rand(32, 32, 32, 3).astype(np.float32) * 2 - 1
    y_diff = np.clip(x + rng.randn(32, 32, 32, 3) * 0.8, -1, 1).astype(np.float32)
    s_similar = sliced_wasserstein_distance(x, y_same, num_levels=2,
                                            num_patches=512, key=key)
    s_noisy = sliced_wasserstein_distance(x, y_diff, num_levels=2,
                                          num_patches=512, key=key)
    assert all(np.isfinite(s_similar)) and all(np.isfinite(s_noisy))
    # identical distributions give near-zero-ish scores vs heavy noise
    s_self = sliced_wasserstein_distance(x, x, num_levels=2,
                                         num_patches=512, key=key)
    assert np.mean(s_self) < np.mean(s_noisy)


def test_checkpoint_utils(tmp_path, key):
    from mmdgan_tpu.train import Agent, init_train_state, multi_opt_config
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.utils.checkpoint import (
        get_ckpt,
        list_ckpt_steps,
        print_tensor_in_ckpt,
        rollback,
    )

    arch = {
        "input": [(1, 4, 4)], "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 16, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [1, 4, 4]},
        ],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "w_nm": "s",
             "in_reshape": [16]},
        ],
    }
    model = SNGan(arch, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, key, opt_d, opt_g)
    agent = Agent("t", "ck", output_dir=str(tmp_path), use_tensorboard=False)
    agent.save(ts, 7)
    folder = agent.ckpt_folder

    assert get_ckpt(folder) == 7
    assert list_ckpt_steps(folder) == [7]
    info = print_tensor_in_ckpt(folder)
    assert any("kernel" in k for k in info)

    restored, step = rollback(ts, folder)
    assert step == 7
    a = jax.tree.leaves(ts.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # fn evaluation on the restored state
    val, _ = rollback(ts, folder, fn=lambda s: int(s.step))
    assert val == 0


def test_read_metrics_jsonl(tmp_path):
    from mmdgan_tpu.utils.events import read_metrics_jsonl
    from mmdgan_tpu.utils.summary import MetricWriter

    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    for s in range(3):
        w.scalars(s, {"loss": 1.0 / (s + 1)})
    w.close()
    out = read_metrics_jsonl(str(tmp_path))
    np.testing.assert_array_equal(out["step"], [0, 1, 2])
    np.testing.assert_allclose(out["loss"], [1.0, 0.5, 1 / 3])


def test_read_event_file(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from mmdgan_tpu.utils.events import read_event_file

    w = tf.summary.create_file_writer(str(tmp_path))
    with w.as_default():
        for s in range(3):
            tf.summary.scalar("loss", 2.0 * s, step=s)
    w.close()
    out = read_event_file(str(tmp_path))
    assert "loss" in out
    np.testing.assert_allclose(out["loss"][:, 1], [0.0, 2.0, 4.0])


def test_export_generator_roundtrip(tmp_path, key):
    """jax.export serving artifact: serialize the generator, reload it
    without model code, outputs must match."""
    import jax.numpy as jnp
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.utils.export import export_generator, load_exported

    arch = {
        "input": [(1, 8, 8)], "code": [(16, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [8, 4, 4]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 1, "act": "tanh"},
        ],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "w_nm": "s",
             "in_reshape": [64]},
        ],
    }
    model = SNGan(arch, loss_type="rep")
    params, state, _ = model.init(key)
    path = export_generator(model, params, state, batch_size=3,
                            out_path=str(tmp_path / "gen.stablehlo"))
    fn = load_exported(path)
    z = jax.random.normal(key, (3, 16))
    out = fn(z)
    expect = model.generate(params, state, code_batch={"x": z, "y": None})
    # the deserialized artifact recompiles with its own fusion choices;
    # bf16 conv compute gives ~1e-3 level differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-2, atol=5e-3)


def test_export_generator_conditional_roundtrip(tmp_path, key):
    """Conditional models export a two-input (z, y) entry point; class
    conditioning survives the serialize/deserialize round-trip."""
    import jax.numpy as jnp
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.utils.export import export_generator, load_exported

    arch = {
        "input": [(1, 8, 8)], "code": [(16, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [8, 4, 4]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu",
             "act_nm": "cbn", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 1, "act": "tanh"},
        ],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "w_nm": "s",
             "in_reshape": [64]},
        ],
    }
    model = SNGan(arch, num_class=4, loss_type="rep")
    params, state, _ = model.init(key)
    path = export_generator(model, params, state, batch_size=3,
                            out_path=str(tmp_path / "cgen.stablehlo"))
    fn = load_exported(path)
    z = jax.random.normal(key, (3, 16))
    y = jnp.asarray([[0], [2], [3]], jnp.int32)
    out = fn(z, y)
    expect = model.generate(params, state, code_batch={"x": z, "y": y})
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-2, atol=5e-3)
    # the labels matter: a different class column changes the output
    out2 = fn(z, jnp.asarray([[1], [1], [1]], jnp.int32))
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_compilation_cache_persists_and_hits(tmp_path):
    """enable_compilation_cache: entries land on disk and a FRESH process
    compiling the same function loads from the cache (observed via jax's
    cache-hit logging) instead of recompiling."""
    import subprocess
    import sys as _sys

    code = """
import sys, logging
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
from mmdgan_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache(%r, min_compile_seconds=0.0)
logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
import jax.numpy as jnp
import numpy as np

def f(x):
    return (jnp.sin(x) @ x.T).sum()

out = jax.jit(f)(jnp.arange(64.0).reshape(8, 8))
assert np.isfinite(float(out))
print("OK", float(out))
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "jaxcache")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}

    r1 = subprocess.run([_sys.executable, "-c", code % (repo, cache)],
                        capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    entries = [f for _, _, fs in os.walk(cache) for f in fs]
    assert entries, "no cache entries written"

    r2 = subprocess.run([_sys.executable, "-c", code % (repo, cache)],
                        capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r1.stdout.strip() == r2.stdout.strip()
    assert "cache hit" in (r2.stderr + r2.stdout).lower(), (
        "second process did not report a compilation-cache hit:\n"
        + r2.stderr[-2000:])


def test_export_generator_sharded_mesh(tmp_path, key):
    """Pod-slice serving artifact: export with mesh= bakes batch-sharded
    in/out shardings — the deserialized artifact runs a data-parallel
    generation bitwise-equal to the sharded in-process jit, with the
    output still sharded over the data axis."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.utils.export import export_generator, load_exported

    arch = {
        "input": [(1, 8, 8)], "code": [(16, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [8, 4, 4]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 1, "act": "tanh"},
        ],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "w_nm": "s",
             "in_reshape": [64]},
        ],
    }
    model = SNGan(arch, loss_type="rep")
    params, state, _ = model.init(key)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    path = export_generator(model, params, state, batch_size=16,
                            out_path=str(tmp_path / "gen_dp.stablehlo"),
                            mesh=mesh)
    fn = load_exported(path)
    z = jax.device_put(
        np.random.RandomState(0).randn(16, 16).astype(np.float32), sh)
    out = fn(z)
    assert out.sharding.is_equivalent_to(sh, out.ndim), out.sharding

    host = jax.device_get((params, state))
    hp = jax.tree.map(jnp.asarray, host[0])
    hs = jax.tree.map(jnp.asarray, host[1])

    def generate(zz):
        gen_out, _ = model.Gen.apply(hp["gen"], hs["gen"],
                                     {"x": zz, "y": None}, train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    ref = jax.jit(generate, in_shardings=sh, out_shardings=sh)(z)
    np.testing.assert_array_equal(np.asarray(jax.device_get(out)),
                                  np.asarray(jax.device_get(ref)))
