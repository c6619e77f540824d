"""Agent runtime tests: train loop, checkpoint save/restore/resume,
divergence guard, imbalanced schedules, metric logging."""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmdgan_tpu.data import synthetic_image_batches
from mmdgan_tpu.models import SNGan
from mmdgan_tpu.parallel import DataParallel
from mmdgan_tpu.train import (
    Agent,
    TrainState,
    build_train_step,
    init_train_state,
    multi_opt_config,
)

ARCH = {
    "input": [(1, 8, 8)],
    "code": [(16, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
         "act_nm": None, "out_reshape": [8, 4, 4]},
        {"name": "l2", "out": 4, "op": "tc", "act": "relu", "act_nm": "bn",
         "kernel": 4, "strides": 2},
        {"name": "l3", "out": 1, "act": "tanh"},
    ],
    "discriminator": [
        {"name": "l1", "out": 8, "act": "lrelu", "act_k": 1.3, "w_nm": "s",
         "kernel": 3, "strides": 2, "out_reshape": [4 * 4 * 8]},
        {"name": "l2", "out": 4, "op": "d", "w_nm": "s"},
    ],
}


def setup(key, loss="rep"):
    model = SNGan(ARCH, loss_type=loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, key, opt_d, opt_g)
    step_fn = build_train_step(model, opt_d, opt_g)
    return model, ts, step_fn


def test_agent_train_and_resume(tmp_path, key):
    model, ts, step_fn = setup(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("t", "run", load_ckpt=False, query_step=5, nan_check_step=5,
                  output_dir=str(tmp_path), use_tensorboard=False)
    dp = DataParallel()
    ts = agent.train(step_fn, ts, data, max_step=10, step_per_epoch=100, dp=dp)
    assert int(jax.device_get(ts.step)) == 10

    # metrics were logged
    jsonl = glob.glob(str(tmp_path / "t_log/run/metrics.jsonl"))[0]
    recs = [json.loads(l) for l in open(jsonl)]
    assert any(r["step"] == 10 for r in recs)

    # resume from checkpoint with a fresh state
    _, ts2, _ = setup(jax.random.PRNGKey(999))
    agent2 = Agent("t", "run", load_ckpt=True, query_step=5,
                   output_dir=str(tmp_path), use_tensorboard=False)
    ts2 = agent2.train(step_fn, ts2, data, max_step=5, step_per_epoch=100, dp=dp)
    assert int(jax.device_get(ts2.step)) == 15


def test_agent_divergence_guard(tmp_path, key):
    model, ts, step_fn = setup(key)

    def nan_step(ts, batch, do_dis, do_gen):
        new_ts, metrics = step_fn(ts, batch, do_dis, do_gen)
        metrics["loss_gen"] = metrics["loss_gen"] * jnp.nan
        return new_ts, metrics

    agent = Agent("t", "nan", load_ckpt=False, nan_check_step=1, do_save=False,
                  output_dir=str(tmp_path), use_tensorboard=False)
    data = synthetic_image_batches(16, 8, 8, 1)
    with pytest.raises(FloatingPointError):
        agent.train(nan_step, ts, data, max_step=3, step_per_epoch=10)


def test_agent_imbalanced_list(tmp_path, key):
    model, ts, step_fn = setup(key)
    agent = Agent("t", "imb", load_ckpt=False, do_save=False,
                  imbalanced_update=[1, 2], query_step=100,
                  output_dir=str(tmp_path), use_tensorboard=False)
    data = synthetic_image_batches(16, 8, 8, 1)
    ts2 = agent.train(step_fn, ts, data, max_step=4, step_per_epoch=10)
    assert int(jax.device_get(ts2.step)) == 4


def test_agent_dynamic_schedule(tmp_path, key):
    model, ts, step_fn = setup(key)
    agent = Agent("t", "dyn", load_ckpt=False, do_save=False,
                  imbalanced_update="dynamic", query_step=100,
                  output_dir=str(tmp_path), use_tensorboard=False)
    data = synthetic_image_batches(16, 8, 8, 1)
    ts2 = agent.train(step_fn, ts, data, max_step=4, step_per_epoch=10)
    assert int(jax.device_get(ts2.step)) == 4


def test_agent_debug_modes(tmp_path, key):
    model, ts, step_fn = setup(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    # debug_mode=None: print-only, state untouched
    agent = Agent("t", "dbg", debug_mode=None, do_save=False,
                  output_dir=str(tmp_path), use_tensorboard=False)
    ts2 = agent.train(step_fn, ts, data, max_step=100, step_per_epoch=10,
                      model_description="model layout")
    assert int(jax.device_get(ts2.step)) == 0
    # debug_mode=True: capped at debug_step
    agent = Agent("t", "dbg2", debug_mode=True, debug_step=3, do_save=False,
                  output_dir=str(tmp_path), use_tensorboard=False)
    ts3 = agent.train(step_fn, ts, data, max_step=100, step_per_epoch=10)
    assert int(jax.device_get(ts3.step)) == 3


def test_eval_sampling_outputs(tmp_path, key):
    model, ts, _ = setup(key)
    host = jax.device_get(ts)
    real = {"x": jnp.asarray(np.random.RandomState(0).randn(6, 8, 8, 1),
                             jnp.float32), "y": None}
    out = model.eval_sampling(
        host.params, host.net_state, "t", "ev", mesh_num=(2, 3),
        real_batch=real, do_sprite=True, do_embedding=True,
        output_dir=str(tmp_path), key=key)
    assert out["x_gen"].shape == (6, 8, 8, 1)
    assert os.path.isfile(out["sprite_gen"])
    assert os.path.isfile(out["embedding"])
    assert out["s_x"].shape == (6, 4)


def test_mdl_score_with_random_classifier(tmp_path, key, monkeypatch):
    model, ts, _ = setup(key)
    host = jax.device_get(ts)

    def real_batches():
        rng = np.random.RandomState(0)
        while True:
            yield {"x": rng.randn(8, 8, 8, 1).astype(np.float32), "y": None}

    scores = model.mdl_score(
        host.params, host.net_state, real_batches(), batch_size=8,
        num_batch=2, model="v1", key=key)
    assert len(scores) == 4
    assert all(np.isfinite(s) for s in scores)


def test_agent_multi_step_path(tmp_path, key):
    """steps_per_call>1 fuses K steps per launch and matches the step count
    of the single-step path."""
    model, ts, step_fn = setup(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("t", "ms", load_ckpt=False, query_step=8, nan_check_step=8,
                  do_save=False, output_dir=str(tmp_path), use_tensorboard=False)
    ts2 = agent.train(step_fn, ts, data, max_step=22, step_per_epoch=100,
                      steps_per_call=8)
    # 2 fused calls of 8 + 6 singles = 22
    assert int(jax.device_get(ts2.step)) == 22


def test_train_device_data(tmp_path, key):
    """HBM-resident dataset loop: upload once, sample on device; loop
    runs with guards/summaries/checkpointing like Agent.train."""
    import jax.numpy as jnp
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": None, "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]}],
    }
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, key, opt_d, opt_g)
    agent = Agent(filename="devdata", sub_folder="t", output_dir=str(tmp_path),
                  debug_mode=False, query_step=8, do_save=True)
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(256, 8, 8, 1), dtype=np.uint8), "y": None}
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=16, step_per_epoch=4,
        batch_size=16, steps_per_call=8)
    assert int(jax.device_get(ts.step)) == 16
    # non-divisible max_step runs the exact number of steps (remainder
    # scan) and a max_step below one window shrinks the window
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=11, step_per_epoch=4,
        batch_size=16, steps_per_call=8)
    assert int(jax.device_get(ts.step)) == 27
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=3, step_per_epoch=4,
        batch_size=16, steps_per_call=8)
    assert int(jax.device_get(ts.step)) == 30


def test_train_device_data_same_class_shuffled_resume(tmp_path, key):
    """same_class + sampling='shuffled_epochs' through the facade
    (VERDICT r3 item 5a): trains, and a save-at-8/restore/8-more run is
    bitwise equal to 16 straight steps — the class schedule and the
    per-class epoch streams both replay deterministically from
    (sampling_seed, checkpointed step) alone."""
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": "cbn", "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.3, "in_reshape": [8 * 8]},
            {"name": "l2", "out": 4, "op": "dck", "w_nm": "s",
             "act_k": 1.0}],
    }

    def mk():
        model = SNGan(arch, num_class=3, loss_type="rep")
        model.sample_same_class = True
        opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
        ts = init_train_state(model, key, opt_d, opt_g)
        return model, opt_d, opt_g, ts

    rs = np.random.RandomState(0)
    y = (np.arange(48) % 3).astype(np.int32).reshape(-1, 1)
    data = {"x": rs.randint(0, 256, size=(48, 8, 8, 1), dtype=np.uint8),
            "y": y}
    kw = dict(step_per_epoch=16, batch_size=8, steps_per_call=4,
              sample_same_class=True, sampling="shuffled_epochs",
              sampling_seed=13)

    model, opt_d, opt_g, ts0 = mk()
    a = Agent("straight", "sc", output_dir=str(tmp_path), query_step=100,
              do_save=False, use_tensorboard=False)
    ts_a = a.train_device_data(model, opt_d, opt_g, ts0, data,
                               max_step=16, **kw)

    model, opt_d, opt_g, ts0 = mk()
    b1 = Agent("resumed", "sc", output_dir=str(tmp_path), query_step=100,
               do_save=True, use_tensorboard=False)
    ts_b = b1.train_device_data(model, opt_d, opt_g, ts0, data,
                                max_step=8, **kw)
    _, _, _, ts_fresh = mk()
    b2 = Agent("resumed", "sc", output_dir=str(tmp_path), load_ckpt=True,
               query_step=100, do_save=False, use_tensorboard=False)
    ts_b2 = b2.train_device_data(model, opt_d, opt_g, ts_fresh, data,
                                 max_step=8, **kw)
    assert int(jax.device_get(ts_b2.step)) == 16
    for a_leaf, b_leaf in zip(jax.tree.leaves(jax.device_get(ts_a.params)),
                              jax.tree.leaves(jax.device_get(ts_b2.params))):
        np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(b_leaf))


def test_resume_is_bitwise_deterministic(tmp_path, key):
    """save at step 5 + restore + 5 more steps == 10 uninterrupted steps,
    parameter-for-parameter (validates the full TrainState round-trip
    through Orbax: params, net/loss state, BOTH optimizer states, rng)."""
    model, ts0, step_fn = setup(key)

    def fixed_batches():
        rng = np.random.RandomState(7)
        batches = [{"x": jnp.asarray(rng.randn(16, 8, 8, 1), jnp.float32),
                    "y": None} for _ in range(10)]
        return batches

    dp = DataParallel()
    # uninterrupted
    a1 = Agent("u", "run", query_step=100, nan_check_step=100, do_save=False,
               output_dir=str(tmp_path), use_tensorboard=False)
    ts_a = a1.train(step_fn, ts0, iter(fixed_batches()), max_step=10,
                    step_per_epoch=100, dp=dp)
    # interrupted at 5
    b1 = Agent("i", "run", query_step=100, nan_check_step=100,
               output_dir=str(tmp_path), use_tensorboard=False)
    ts_b = b1.train(step_fn, ts0, iter(fixed_batches()[:5]), max_step=5,
                    step_per_epoch=100, dp=dp)
    _, ts_fresh, _ = setup(jax.random.PRNGKey(4242))
    b2 = Agent("i", "run", load_ckpt=True, query_step=100, nan_check_step=100,
               do_save=False, output_dir=str(tmp_path), use_tensorboard=False)
    ts_b2 = b2.train(step_fn, ts_fresh, iter(fixed_batches()[5:]), max_step=5,
                     step_per_epoch=100, dp=dp)

    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(ts_a.params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(ts_b2.params)))
    for path, va in flat_a:
        np.testing.assert_array_equal(va, flat_b[path], err_msg=str(path))


def test_train_multi_with_remainder(tmp_path, key):
    """max_step not divisible by steps_per_call: the trailing steps must
    not race the prefetch producer thread on the host generator."""
    model, ts, step_fn = setup(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("rem", "run", query_step=100, nan_check_step=100,
                  do_save=False, output_dir=str(tmp_path),
                  use_tensorboard=False)
    ts = agent.train(step_fn, ts, data, max_step=11, step_per_epoch=100,
                     dp=DataParallel(), steps_per_call=4)
    assert int(jax.device_get(ts.step)) == 11


def test_imbalanced_list_fused_matches_single_step(tmp_path, key):
    """[a, b] schedules computed on device inside the scan produce the
    same parameters as the host-side single-step path."""
    model, ts0, step_fn = setup(key)

    def data():
        rng = np.random.RandomState(11)
        return iter([{"x": jnp.asarray(rng.randn(16, 8, 8, 1), jnp.float32),
                      "y": None} for _ in range(12)])

    outs = []
    for spc in (1, 4):
        agent = Agent("imb", f"run{spc}", query_step=100, nan_check_step=100,
                      do_save=False, output_dir=str(tmp_path),
                      use_tensorboard=False, imbalanced_update=[2, 1])
        ts = agent.train(step_fn, ts0, data(), max_step=12,
                         step_per_epoch=100, dp=DataParallel(),
                         steps_per_call=spc)
        outs.append(jax.device_get(ts.params))
    a = jax.tree_util.tree_leaves_with_path(outs[0])
    b = dict(jax.tree_util.tree_leaves_with_path(outs[1]))
    for path, va in a:
        # different executables (fused scan vs single steps) may differ
        # by float rounding; the schedule itself must match exactly
        np.testing.assert_allclose(va, b[path], rtol=1e-5, atol=1e-6,
                                   err_msg=str(path))


def test_imbalanced_dynamic_fused_runs(tmp_path, key):
    """'dynamic' schedule runs fully fused (device RNG + carried mmd
    average) and completes the exact step count."""
    model, ts, step_fn = setup(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("dyn", "run", query_step=100, nan_check_step=100,
                  do_save=False, output_dir=str(tmp_path),
                  use_tensorboard=False, imbalanced_update="dynamic")
    ts = agent.train(step_fn, ts, data, max_step=10, step_per_epoch=100,
                     dp=DataParallel(), steps_per_call=4)
    assert int(jax.device_get(ts.step)) == 10


def setup_hist(key, loss="rep"):
    """Like setup() but with the opt-in step histograms enabled."""
    model = SNGan(ARCH, loss_type=loss, summary_histograms=True)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, key, opt_d, opt_g)
    return model, ts, build_train_step(model, opt_d, opt_g)


def test_loss_observability_in_metrics_log(tmp_path, key):
    """VERDICT r2 item 1 'done' criterion: a saturation event must be
    diagnosable from the JSONL alone — the metrics log carries e_kxx/
    e_kxy/e_kyy scalars, grad norms, and hist/* histogram records."""
    model, ts, step_fn = setup_hist(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("obs", "run", query_step=4, nan_check_step=4,
                  output_dir=str(tmp_path), use_tensorboard=False,
                  param_hist_step=8)
    ts = agent.train(step_fn, ts, data, max_step=8, step_per_epoch=100,
                     dp=DataParallel())
    agent.writer.flush()
    jsonl = glob.glob(str(tmp_path / "obs_log/run/metrics.jsonl"))[0]
    recs = [json.loads(l) for l in open(jsonl)]
    scalar_recs = [r for r in recs if "hist" not in r]
    hist_recs = [r for r in recs if "hist" in r]
    assert any("e_kxx" in r and "e_kyy" in r for r in scalar_recs)
    assert any("grad_norm_dis" in r for r in scalar_recs)
    tags = {r["hist"] for r in hist_recs}
    assert {"hist/d_xx", "hist/d_xy", "hist/d_yy"} <= tags
    # param histograms (param_hist_step=8) wrote per-variable records
    assert any(t.startswith("params/") for t in tags)
    for r in hist_recs:
        assert len(r["counts"]) >= 1 and r["hi"] > r["lo"]


def test_loss_observability_multi_step_path(tmp_path, key):
    """Scan-fused loop writes the same observability records."""
    model, ts, step_fn = setup_hist(key)
    data = synthetic_image_batches(16, 8, 8, 1)
    agent = Agent("obsm", "run", query_step=4, nan_check_step=4,
                  output_dir=str(tmp_path), use_tensorboard=False)
    ts = agent.train(step_fn, ts, data, max_step=8, step_per_epoch=100,
                     dp=DataParallel(), steps_per_call=4)
    agent.writer.flush()
    jsonl = glob.glob(str(tmp_path / "obsm_log/run/metrics.jsonl"))[0]
    recs = [json.loads(l) for l in open(jsonl)]
    assert any("e_kxx" in r for r in recs if "hist" not in r)
    assert any(r.get("hist") == "hist/d_xy" for r in recs)


def test_train_device_data_mesh(tmp_path, key):
    """Agent.train_device_data over an 8-device mesh: dataset sharded
    over the mesh (trimmed to a divisible row count), local shard_map
    sampling, state replicated — the facade path for multi-chip
    HBM-resident training (incl. sharded same-class batching)."""
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": "cbn", "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]},
            {"name": "l2", "out": 4, "op": "dck", "w_nm": "s",
             "act_k": 1.0}],
    }
    model = SNGan(arch, num_class=4, loss_type="rep")
    model.sample_same_class = True
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, key, opt_d, opt_g)
    dp = DataParallel()
    assert dp.num_devices == 8
    agent = Agent(filename="devmesh", sub_folder="t",
                  output_dir=str(tmp_path), debug_mode=False, query_step=8,
                  do_save=False, use_tensorboard=False)
    rng = np.random.RandomState(0)
    # 131 rows: trims to 128 for the 8-device shard; cyclic labels so
    # every shard holds every class
    data = {"x": rng.randint(0, 256, size=(131, 8, 8, 1), dtype=np.uint8),
            "y": (np.arange(131) % 4).reshape(-1, 1).astype(np.int64)}
    with pytest.warns(UserWarning, match="trimming"):
        ts = agent.train_device_data(
            model, opt_d, opt_g, ts, data, max_step=16, step_per_epoch=4,
            batch_size=16, steps_per_call=8, dp=dp)
    assert int(jax.device_get(ts.step)) == 16
    # the state stays replicated and finite
    lg = float(jax.device_get(ts.loss_state.loss_average))
    assert np.isfinite(lg)


def test_train_device_data_cache_not_stale(tmp_path, key):
    """The jitted device-data step closes over the class tables; a second
    call with a DIFFERENT dataset must compile a new step, not reuse the
    first dataset's baked-in tables."""
    from mmdgan_tpu.train import init_train_state, multi_opt_config

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": "cbn", "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]},
            {"name": "l2", "out": 4, "op": "dck", "w_nm": "s",
             "act_k": 1.0}],
    }
    model = SNGan(arch, num_class=2, loss_type="rep")
    model.sample_same_class = True
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, key, opt_d, opt_g)
    agent = Agent(filename="cache", sub_folder="t", output_dir=str(tmp_path),
                  debug_mode=False, query_step=100, do_save=False,
                  use_tensorboard=False)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (32, 8, 8, 1), np.uint8)
    d1 = {"x": x, "y": (np.arange(32) % 2).reshape(-1, 1).astype(np.int64)}
    # second dataset: same shapes, labels swapped -> different tables
    d2 = {"x": x, "y": (1 - np.arange(32) % 2).reshape(-1, 1).astype(np.int64)}
    ts = agent.train_device_data(model, opt_d, opt_g, ts, d1, max_step=4,
                                 step_per_epoch=4, batch_size=8,
                                 steps_per_call=4, sample_same_class=True)
    n_compiled = len(agent._devdata_cache)
    ts = agent.train_device_data(model, opt_d, opt_g, ts, d2, max_step=4,
                                 step_per_epoch=4, batch_size=8,
                                 steps_per_call=4, sample_same_class=True)
    assert len(agent._devdata_cache) == n_compiled + 1, (
        "different class tables must not hit the same cached step")
    # identical dataset again -> cache hit, no growth
    agent.train_device_data(model, opt_d, opt_g, ts, d2, max_step=4,
                            step_per_epoch=4, batch_size=8, steps_per_call=4,
                            sample_same_class=True)
    assert len(agent._devdata_cache) == n_compiled + 1


def test_train_device_data_shuffled_epochs_resume_bitwise(tmp_path, key):
    """shuffled_epochs facade: epoch permutations derive from (seed,
    epoch) alone, so an interrupted run restored mid-protocol replays
    the exact batch sequence — 8+8 steps across three epoch-permutation
    boundaries equals 16 uninterrupted steps parameter-for-parameter."""
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": None, "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]}],
    }
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(64, 8, 8, 1), dtype=np.uint8), "y": None}
    kw = dict(step_per_epoch=4, batch_size=16, steps_per_call=4,
              sampling="shuffled_epochs")

    def mkts(k=0):
        return init_train_state(model, jax.random.PRNGKey(k), opt_d, opt_g)

    a = Agent("shufA", "t", output_dir=str(tmp_path), query_step=100,
              do_save=False, use_tensorboard=False)
    ts_a = a.train_device_data(model, opt_d, opt_g, mkts(), data,
                               max_step=16, **kw)
    assert int(jax.device_get(ts_a.step)) == 16

    b1 = Agent("shufB", "t", output_dir=str(tmp_path), query_step=100,
               do_save=True, use_tensorboard=False)
    b1.train_device_data(model, opt_d, opt_g, mkts(), data,
                         max_step=8, **kw)
    b2 = Agent("shufB", "t", output_dir=str(tmp_path), query_step=100,
               do_save=False, use_tensorboard=False, load_ckpt=True)
    ts_b = b2.train_device_data(model, opt_d, opt_g, mkts(99), data,
                                max_step=8, **kw)
    for va, vb in zip(jax.tree.leaves(jax.device_get(ts_a.params)),
                      jax.tree.leaves(jax.device_get(ts_b.params))):
        np.testing.assert_array_equal(va, vb)


def test_train_device_data_sampling_seed_fixed_across_chunks(tmp_path):
    """Chunked callers (experiments/runner.py) vary ``seed`` per chunk
    for distinct noise streams; ``sampling_seed`` pins the epoch
    permutation family so an epoch STRADDLING a chunk boundary keeps its
    without-replacement guarantee. 8+8 steps with seed=0 then seed=1
    (sampling_seed=0, boundary mid-epoch: 48 rows / batch 16 = 3
    batches/epoch) must equal 16 uninterrupted steps with seed=0."""
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": None, "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]}],
    }
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(48, 8, 8, 1), dtype=np.uint8), "y": None}
    kw = dict(step_per_epoch=3, batch_size=16, steps_per_call=4,
              sampling="shuffled_epochs")

    def mkts():
        return init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)

    a = Agent("chunkA", "t", output_dir=str(tmp_path), query_step=100,
              do_save=False, use_tensorboard=False)
    ts_a = a.train_device_data(model, opt_d, opt_g, mkts(), data,
                               max_step=16, seed=0, **kw)

    b = Agent("chunkB", "t", output_dir=str(tmp_path), query_step=100,
              do_save=False, use_tensorboard=False)
    ts_b = b.train_device_data(model, opt_d, opt_g, mkts(), data,
                               max_step=8, seed=0, sampling_seed=0, **kw)
    ts_b = b.train_device_data(model, opt_d, opt_g, ts_b, data,
                               max_step=8, seed=1, sampling_seed=0, **kw)
    for va, vb in zip(jax.tree.leaves(jax.device_get(ts_a.params)),
                      jax.tree.leaves(jax.device_get(ts_b.params))):
        np.testing.assert_array_equal(va, vb)


def test_sigterm_preemption_checkpoints(tmp_path):
    """SIGTERM during training = graceful stop: the loop finishes its
    step window, saves a checkpoint, and returns (TPU-eviction handling;
    the reference lost everything since the last 12.5k-step chunk save).
    A fresh Agent restores the preempted step and keeps training."""
    import signal
    import subprocess
    import sys as _sys
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "preempt_worker.py")
    import threading

    proc = subprocess.Popen(
        [_sys.executable, "-u", worker, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # watchdog: readline blocks if the worker never prints (backend
    # stall before the first query line) — kill rather than wedge
    watchdog = threading.Timer(300, proc.kill)
    watchdog.start()
    try:
        # wait until training is demonstrably under way
        for line in proc.stdout:
            if "global step" in line:
                break
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]
    assert "SIGTERM received" in out, out[-3000:]
    final = [l for l in out.splitlines() if l.startswith("FINAL")]
    assert final, out[-3000:]
    stopped_at = int(final[0].split()[1])
    assert 0 < stopped_at < 200000
    assert stopped_at % 8 == 0  # stopped on a step-window boundary

    # resume from the preemption checkpoint and keep going
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent
    from tests.preempt_worker import ARCH

    model = SNGan(ARCH, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(64, 8, 8, 1), dtype=np.uint8), "y": None}
    agent = Agent("preempt", "t", output_dir=str(tmp_path), query_step=64,
                  do_save=False, use_tensorboard=False, load_ckpt=True)
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=8, step_per_epoch=4,
        batch_size=16, steps_per_call=8, seed=0)
    assert int(jax.device_get(ts.step)) == stopped_at + 8
