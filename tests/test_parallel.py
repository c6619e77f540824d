"""Multi-chip paths on the virtual 8-device CPU mesh.

Mesh-equality battery (VERDICT r1 item 2): the train step has
*global-batch semantics*, so the same initial state + the same batches
must give the same losses/params whether the batch lives on 1, 2, or 8
devices. These are exactly the paths where SPMD partitioning can
silently diverge from single-device math: conditional label gathers,
second-order witness gradients (gp), Jacobian scales (ds), the
on-device dynamic schedule, and the sharded HBM-resident dataset.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmdgan_tpu.models import SNGan
from mmdgan_tpu.parallel.mesh import DataParallel, make_mesh
from mmdgan_tpu.train import (
    build_train_step,
    init_train_state,
    multi_opt_config,
)

COND_ARCH = {
    "input": [(1, 8, 8)],
    "code": [(8, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
         "act_nm": "cbn", "out_reshape": [1, 8, 8]}],
    "discriminator": [
        {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 1.3, "in_reshape": [8 * 8]},
        {"name": "l2", "out": 1, "op": "d", "type": "project",
         "w_nm": "s", "act_k": 1.0}],
}

PLAIN_ARCH = {
    "input": [(1, 8, 8)],
    "code": [(8, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
         "act_nm": None, "out_reshape": [1, 8, 8]}],
    "discriminator": [
        {"name": "l1", "out": 8, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 1.3, "in_reshape": [8 * 8]},
        {"name": "l2", "out": 4, "op": "d", "w_nm": "s"}],
}

B = 16


def _run_steps(model, mesh_size, batches, num_class=0, steps=2):
    """Run `steps` full train steps on a `mesh_size`-device mesh; returns
    (losses, params). SGD keeps roundoff at roundoff (Adam's normalizer
    amplifies zero-gradient noise into sign-arbitrary updates)."""
    opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
    ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
    dp = DataParallel(make_mesh(jax.devices()[:mesh_size]))
    ts = dp.replicate(ts)
    step = dp.compile_step(build_train_step(model, opt_d, opt_g))
    t = jnp.asarray(True)
    losses = []
    for i in range(steps):
        batch = dp.shard_batch(batches[i])
        ts, m = step(ts, batch, t, t)
        losses.append((float(m["loss_gen"]), float(m["loss_dis"])))
    return losses, jax.device_get(ts.params)


def _make_batches(steps=2, labels=None):
    rng = np.random.RandomState(0)
    out = []
    for _ in range(steps):
        b = {"x": rng.randn(B, 8, 8, 1).astype(np.float32), "y": None}
        if labels is not None:
            b["y"] = rng.randint(0, labels, size=(B, 1)).astype(np.int32)
        out.append(b)
    return out


def _assert_mesh_equal(model_fn, labels=None, steps=2,
                       loss_rtol=2e-4, param_rtol=2e-3):
    batches = _make_batches(steps, labels=labels)
    ref_losses, ref_params = _run_steps(model_fn(), 1, batches, steps=steps)
    for n in (2, 8):
        losses, params = _run_steps(model_fn(), n, batches, steps=steps)
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref_losses),
            rtol=loss_rtol, atol=1e-5, err_msg=f"mesh size {n} losses")
        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=param_rtol, atol=1e-6,
                err_msg=f"mesh size {n} params")


def test_mesh_equality_conditional():
    """cbn generator + projection discriminator: label gathers under a
    sharded batch (code labels tied to the data labels)."""
    def mk():
        m = SNGan(COND_ARCH, num_class=3, loss_type="rep",
                  compute_dtype=jnp.float32)
        m.sample_same_class = True
        return m
    _assert_mesh_equal(mk, labels=3)


def test_mesh_equality_rmb_gp():
    """Second-order witness gradients + interpolates under sharding."""
    _assert_mesh_equal(
        lambda: SNGan(PLAIN_ARCH, num_class=0, loss_type="rmb_gp",
                      compute_dtype=jnp.float32))


def test_mesh_equality_conditional_gp():
    """Conditional D + witness gradient penalty: the B-label path through
    the penalty (ADVICE r1 medium) must also hold on a mesh."""
    def mk():
        m = SNGan(COND_ARCH, num_class=3, loss_type="rmb_gp",
                  compute_dtype=jnp.float32)
        m.sample_same_class = True
        return m
    _assert_mesh_equal(mk, labels=3)


def test_mesh_equality_rmb_ds():
    """Scaled-MMD Jacobian discriminator scale under sharding."""
    _assert_mesh_equal(
        lambda: SNGan(PLAIN_ARCH, num_class=0, loss_type="rmb_ds",
                      compute_dtype=jnp.float32))


def test_mesh_equality_dynamic_imbalanced_scan():
    """The on-device dynamic schedule (coin flips from the carried rng)
    must be identical across mesh sizes, and so must the resulting
    params."""
    from mmdgan_tpu.train.step import build_imbalanced_multi_step

    K = 4
    rng = np.random.RandomState(0)
    stacked = {
        "x": rng.randn(K, B, 8, 8, 1).astype(np.float32),
        "y": None,
    }

    results = {}
    for n in (1, 2, 8):
        model = SNGan(PLAIN_ARCH, num_class=0, loss_type="rep",
                      compute_dtype=jnp.float32)
        opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        dp = DataParallel(make_mesh(jax.devices()[:n]))
        ts = dp.replicate(ts)
        fn = jax.jit(build_imbalanced_multi_step(
            model, opt_d, opt_g, num_steps=K, imbalanced="dynamic"))
        batches = dp.shard_multi_batch(stacked)
        ts, _, avg, metrics = fn(
            ts, batches, jax.random.PRNGKey(3), jnp.ones(()))
        results[n] = (np.asarray(metrics["do_dis"]),
                      np.asarray(metrics["loss_gen"]),
                      jax.device_get(ts.params))

    dd1, lg1, p1 = results[1]
    for n in (2, 8):
        ddn, lgn, pn = results[n]
        np.testing.assert_array_equal(ddn, dd1, err_msg=f"schedule n={n}")
        np.testing.assert_allclose(lgn, lg1, rtol=2e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-6)


def test_device_dataset_sharded_vs_replicated():
    """Sharded HBM-resident dataset vs the same data replicated: with a
    constant-row dataset (sampling composition neutralized) the sharded
    shard_map sampler + SPMD step must equal the single-device path."""
    from mmdgan_tpu.train.step import build_device_data_step

    model = SNGan(PLAIN_ARCH, num_class=0, loss_type="rep",
                  compute_dtype=jnp.float32)
    opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
    row = np.random.RandomState(0).randint(0, 256, (1, 8, 8, 1), np.uint8)
    data_np = np.broadcast_to(row, (64, 8, 8, 1)).copy()
    on = jnp.ones(())

    def run(mesh_size):
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        dp = DataParallel(make_mesh(jax.devices()[:mesh_size]))
        ts = dp.replicate(ts)
        builder = build_device_data_step(
            model, opt_d, opt_g, num_steps=3, batch_size=16)
        if mesh_size == 1:
            fn = jax.jit(builder)
            data = jnp.asarray(data_np)
        else:
            fn = jax.jit(builder.with_mesh(dp.mesh))
            data = jax.device_put(
                data_np, NamedSharding(dp.mesh, P("data")))
        ts, _, m = fn(ts, data, None, jax.random.PRNGKey(5), on, on)
        return np.asarray(m["loss_gen"]), jax.device_get(ts.params)

    lg1, p1 = run(1)
    for n in (2, 8):
        lgn, pn = run(n)
        np.testing.assert_allclose(lgn, lg1, rtol=2e-4, atol=1e-5,
                                   err_msg=f"mesh size {n}")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-6)


def test_device_dataset_sharded_sampling_8_devices(key):
    """HBM-resident dataset sharded over the mesh: each device samples
    its local rows (shard_map, per-device RNG); full train steps run."""
    from mmdgan_tpu.train.step import build_device_data_step

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
    dp = DataParallel()
    assert dp.num_devices == 8
    builder = build_device_data_step(model, opt_d, opt_g, num_steps=4,
                                     batch_size=32)
    fn = jax.jit(builder.with_mesh(dp.mesh))
    data = jax.device_put(
        np.random.RandomState(0).randint(0, 256, (128, 8, 8, 1), np.uint8),
        NamedSharding(dp.mesh, P("data")))
    ts = dp.replicate(init_train_state(model, key, opt_d, opt_g))
    rng = jax.random.PRNGKey(0)
    on = jnp.ones(())
    ts, rng, m = fn(ts, data, None, rng, on, on)
    ts, rng, m = fn(ts, data, None, rng, on, on)
    assert int(jax.device_get(ts.step)) == 8
    assert np.isfinite(float(np.asarray(m["loss_gen"])[-1]))


def test_shard_batch_process_local_construction():
    """The multi-host input construction
    (jax.make_array_from_process_local_data) must agree with the
    single-process device_put path when nproc == 1 — the guard that the
    process-local branch doesn't regress anything (docs/multihost.md)."""
    dp = DataParallel()
    x = np.random.RandomState(0).randn(16, 4, 4, 1).astype(np.float32)
    via_put = dp.shard_batch({"x": x, "y": None})
    assert dp.process_count == 1
    local = jax.make_array_from_process_local_data(
        dp.batch_sharding, x, x.shape)
    np.testing.assert_array_equal(np.asarray(local), np.asarray(via_put["x"]))
    assert local.sharding == via_put["x"].sharding

    # local_batch_size contract
    assert dp.local_batch_size(64) == 64


def test_pipeline_shard_partitions_records(tmp_path):
    """pipeline.shard(n, i): the n shards are disjoint and exhaustive
    (record-level round-robin when there are fewer files than shards)."""
    from mmdgan_tpu.data import ReadTFRecords, np_to_tfrecords

    n = 24
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, size=(n, 3, 4, 4), dtype=np.uint8)
    np_to_tfrecords(x, rng.randint(0, 4, size=n), str(tmp_path / "img"))

    def rows(num_shards, idx):
        pipe = ReadTFRecords(
            "img", num_labels=1, batch_size=1, file_folder=str(tmp_path),
            buffer_size=1, num_epoch=1, use_native=False,
        ).shape2image(3, 4, 4).shard(num_shards, idx)
        return [b["x"][0] for b in pipe.next_batch()]

    parts = [rows(4, i) for i in range(4)]
    assert sum(len(p) for p in parts) == n
    assert all(len(p) == n // 4 for p in parts)
    # disjoint + exhaustive: re-assembling the round-robin recovers the file order
    full = rows(1, 0)
    recombined = [parts[i % 4][i // 4] for i in range(n)]
    np.testing.assert_array_equal(np.stack(recombined), np.stack(full))


def test_prefetch_propagates_producer_failure():
    """A decode/transfer error in the background producer must surface in
    the consuming loop, not masquerade as clean end-of-data (VERDICT r1
    weak #2)."""
    dp = DataParallel()

    def bad_iter():
        yield {"x": np.zeros((8, 4, 4, 1), np.float32), "y": None}
        raise RuntimeError("decode exploded")

    it = dp.prefetch(bad_iter(), size=2)
    first = next(it)
    assert first["x"].shape == (8, 4, 4, 1)
    with pytest.raises(RuntimeError, match="decode exploded"):
        for _ in it:
            pass


def test_prefetch_consumer_abandon_releases_producer():
    """Closing the consumer generator mid-stream must not wedge on a full
    queue (and must not raise)."""
    dp = DataParallel()

    def many():
        for _ in range(100):
            yield {"x": np.zeros((8, 4, 4, 1), np.float32), "y": None}

    it = dp.prefetch(many(), size=2)
    next(it)
    it.close()


def test_mesh_equality_conditional_dck():
    """The conditionally-scaled dense score head ('dck' — what
    cifar_architecture(conditional=True) uses) under a sharded batch:
    per-class kernel scales gather by label on every shard."""
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
        m = SNGan(arch, num_class=3, loss_type="rmb",
                  compute_dtype=jnp.float32)
        m.sample_same_class = True
        return m

    _assert_mesh_equal(mk, labels=3)


def test_device_dataset_sharded_same_class_vs_replicated():
    """Same-class sampling over a SHARDED HBM dataset (VERDICT r2 item
    6): one global class draw per step + per-device local-row tables.
    With per-class-constant rows (sampling composition neutralized) the
    sharded path must equal the single-device same-class path exactly —
    including the class SEQUENCE, since the class key is not
    device-folded."""
    from mmdgan_tpu.train.step import (
        build_device_data_step, same_class_tables, sharded_same_class_tables)

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
    num_class = 4
    n = 64
    y = (np.arange(n) % num_class).astype(np.int64)  # every shard has all classes
    # rows of class c are identical -> batch content depends only on the
    # class sequence, which both paths draw from the same un-folded key
    data_np = np.stack([np.full((8, 8, 1), 40 + 50 * c, np.uint8) for c in y])
    on = jnp.ones(())

    def run(mesh_size):
        model = SNGan(arch, num_class=num_class, loss_type="rep",
                      compute_dtype=jnp.float32)
        model.sample_same_class = True
        opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        dp = DataParallel(make_mesh(jax.devices()[:mesh_size]))
        ts = dp.replicate(ts)
        if mesh_size == 1:
            table, counts = same_class_tables(y, num_class)
            builder = build_device_data_step(
                model, opt_d, opt_g, num_steps=3, batch_size=16,
                same_class=True, class_table=table, class_counts=counts)
            fn = jax.jit(builder)
            data = jnp.asarray(data_np)
            yd = jnp.asarray(y.reshape(-1, 1))
        else:
            table, counts = sharded_same_class_tables(y, num_class, mesh_size)
            builder = build_device_data_step(
                model, opt_d, opt_g, num_steps=3, batch_size=16,
                same_class=True, class_table=table, class_counts=counts)
            fn = jax.jit(builder.with_mesh(dp.mesh))
            data = jax.device_put(data_np, NamedSharding(dp.mesh, P("data")))
            yd = jax.device_put(y.reshape(-1, 1),
                                NamedSharding(dp.mesh, P("data")))
        ts, _, m = fn(ts, data, yd, jax.random.PRNGKey(5), on, on)
        return np.asarray(m["loss_gen"]), jax.device_get(ts.params)

    lg1, p1 = run(1)
    for nmesh in (2, 8):
        lgn, pn = run(nmesh)
        np.testing.assert_allclose(lgn, lg1, rtol=2e-4, atol=1e-5,
                                   err_msg=f"mesh size {nmesh}")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-6)


def test_sharded_same_class_tables_local_rows():
    """Per-device tables index LOCAL rows and cover each shard's classes."""
    from mmdgan_tpu.train.step import sharded_same_class_tables

    y = (np.arange(32) % 4).astype(np.int64)
    tables, counts = sharded_same_class_tables(y, 4, 8)
    assert tables.shape[0] == 8 and counts.shape == (8, 4)
    assert counts.min() == 1  # 4 rows per shard, one per class
    assert tables.max() < 4   # local row indices only
    for d in range(8):
        for c in range(4):
            local_rows = tables[d, c, :counts[d, c]]
            assert all(y[d * 4 + r] == c for r in local_rows)

    with pytest.raises(AssertionError):
        # class-sorted labels: some shard misses a class
        sharded_same_class_tables(np.repeat(np.arange(4), 8), 4, 8)


CONV_ARCH = {
    # conv-bearing tiny arch (tc + conv kernels have a real output-channel
    # dim for the model-axis sharding rule to split)
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


def test_mesh_equality_model_parallel_2d():
    """2-D (data x model) mesh: `shard_state` splits parameter/optimizer
    leaves over the model axis (weight-sharded training for models whose
    state outgrows one chip's HBM). The step keeps global semantics, so
    losses and post-step params must equal the single-device run on both
    (4,2) and (2,4) layouts — and the rule must actually shard leaves,
    otherwise this test would pass trivially."""
    from mmdgan_tpu.parallel.mesh import make_mesh_2d

    rng = np.random.RandomState(0)
    batches = [
        {"x": jnp.asarray(rng.randn(B, 8, 8, 1).astype(np.float32)),
         "y": None}
        for _ in range(2)
    ]

    def run(mesh):
        model = SNGan(CONV_ARCH, num_class=0, loss_type="rep",
                      compute_dtype=jnp.float32)
        opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        if mesh is None:
            step = jax.jit(build_train_step(model, opt_d, opt_g))
            dp = None
        else:
            dp = DataParallel(mesh)
            ts = dp.shard_state(ts, min_size=1)
            n_sharded = sum(
                any(ax is not None for ax in l.sharding.spec)
                for l in jax.tree.leaves(ts.params))
            assert n_sharded >= 5, "sharding rule left everything replicated"
            step = dp.compile_step(build_train_step(model, opt_d, opt_g))
        t = jnp.asarray(True)
        losses = []
        for b in batches:
            bb = dp.shard_batch(b) if dp else b
            ts, m = step(ts, bb, t, t)
            losses.append((float(m["loss_gen"]), float(m["loss_dis"])))
        return losses, jax.device_get(ts.params)

    ref_losses, ref_params = run(None)
    for shape in ((4, 2), (2, 4)):
        losses, params = run(make_mesh_2d(*shape))
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref_losses), rtol=2e-4,
            atol=1e-5, err_msg=f"mesh {shape} losses")
        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6,
                err_msg=f"mesh {shape} params")


def test_shard_state_1d_replicates_and_2d_guards():
    """On a 1-D mesh shard_state == replicate; a 2-D dp refuses the
    HBM-resident dataset facade (its shard_map sampler is 1-D only)."""
    from mmdgan_tpu.parallel.mesh import make_mesh_2d
    from mmdgan_tpu.train.trainer import Agent

    dp1 = DataParallel(make_mesh(jax.devices()[:2]))
    x = {"w": jnp.ones((4, 4))}
    out = dp1.shard_state(x)
    assert out["w"].sharding.is_fully_replicated

    dp2 = DataParallel(make_mesh_2d(2, 2))
    assert dp2.model_axis == "model" and dp2.data_size == 2
    agent = Agent("guard", "t", do_save=False, use_tensorboard=False,
                  output_dir="/tmp/mmdgan_2d_guard")
    with pytest.raises(AssertionError, match="data-parallel only"):
        agent.train_device_data(
            None, None, None, None,
            {"x": np.zeros((8, 8, 8, 1), np.float32), "y": None},
            max_step=1, step_per_epoch=1, batch_size=4, dp=dp2)


def test_shuffled_epochs_sampler_sharded_local_slices():
    """Sharded shuffled_epochs sampling: each device slices its LOCAL
    shard at the shared epoch offset — zero gather, zero collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmdgan_tpu.train.step import build_device_data_step

    model = SNGan(PLAIN_ARCH, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
    mesh = make_mesh(jax.devices()[:4])
    builder = build_device_data_step(
        model, opt_d, opt_g, num_steps=2, batch_size=8,
        sampling="shuffled_epochs")
    fn = builder.with_mesh(mesh)
    data = jax.device_put(
        np.arange(32, dtype=np.float32)[:, None, None, None]
        * np.ones((1, 8, 8, 1), np.float32),
        NamedSharding(mesh, P("data")))
    sample = fn.sampler(data, None)
    for s in range(5):  # includes one wrap (4 local batches per epoch)
        b = sample(jax.random.PRNGKey(0), jnp.asarray(s))
        got = np.asarray(b["x"])[:, 0, 0, 0].astype(int).tolist()
        off = (s % 4) * 2
        expect = [d * 8 + off + i for d in range(4) for i in range(2)]
        assert got == expect, (s, got, expect)


def test_train_device_data_shuffled_epochs_sharded(tmp_path):
    """Facade run over a 4-device mesh with shuffled_epochs: per-shard
    epoch re-permutation applies between launches; params stay finite."""
    from mmdgan_tpu.train import init_train_state
    from mmdgan_tpu.train.trainer import Agent

    model = SNGan(PLAIN_ARCH, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    dp = DataParallel(make_mesh(jax.devices()[:4]))
    agent = Agent("shuf_mesh", "t", output_dir=str(tmp_path),
                  query_step=100, do_save=False, use_tensorboard=False)
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(64, 8, 8, 1), dtype=np.uint8), "y": None}
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=12, step_per_epoch=4,
        batch_size=16, steps_per_call=4, dp=dp, sampling="shuffled_epochs")
    assert int(jax.device_get(ts.step)) == 12
    leaves = jax.tree.leaves(jax.device_get(ts.params))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_device_dataset_sharded_same_class_shuffled_vs_replicated():
    """same_class + shuffled_epochs over a SHARDED HBM dataset (VERDICT
    r3 item 5a, sharded): the global class schedule is shared (replicated
    [2] row into shard_map) and each device consumes without-replacement
    epoch streams over its LOCAL rows. With per-class-constant rows the
    sharded path must match the single-device path."""
    from mmdgan_tpu.train.step import (
        build_device_data_step, class_schedule, same_class_tables,
        sharded_same_class_tables)

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
    num_class = 4
    n = 128
    y = (np.arange(n) % num_class).astype(np.int64)
    data_np = np.stack(
        [np.full((8, 8, 1), 40 + 50 * c, np.uint8) for c in y])
    on = jnp.ones(())
    sched = class_schedule(num_class, 6, seed=11)

    def run(mesh_size):
        model = SNGan(arch, num_class=num_class, loss_type="rep",
                      compute_dtype=jnp.float32)
        model.sample_same_class = True
        opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        dp = DataParallel(make_mesh(jax.devices()[:mesh_size]))
        ts = dp.replicate(ts)
        if mesh_size == 1:
            table, counts = same_class_tables(y, num_class)
            builder = build_device_data_step(
                model, opt_d, opt_g, num_steps=6, batch_size=16,
                same_class=True, class_table=table, class_counts=counts,
                sampling="shuffled_epochs", sampler_seed=11)
            fn = jax.jit(builder)
            data = jnp.asarray(data_np)
            yd = jnp.asarray(y.reshape(-1, 1))
        else:
            table, counts = sharded_same_class_tables(y, num_class, mesh_size)
            builder = build_device_data_step(
                model, opt_d, opt_g, num_steps=6, batch_size=16,
                same_class=True, class_table=table, class_counts=counts,
                sampling="shuffled_epochs", sampler_seed=11)
            fn = jax.jit(builder.with_mesh(dp.mesh))
            data = jax.device_put(data_np, NamedSharding(dp.mesh, P("data")))
            yd = jax.device_put(y.reshape(-1, 1),
                                NamedSharding(dp.mesh, P("data")))
        ts, _, m = fn(ts, data, yd, jax.random.PRNGKey(5), on, on,
                      jnp.asarray(sched))
        return np.asarray(m["loss_gen"]), jax.device_get(ts.params)

    lg1, p1 = run(1)
    for nmesh in (2, 8):
        lgn, pn = run(nmesh)
        np.testing.assert_allclose(lgn, lg1, rtol=2e-4, atol=1e-5,
                                   err_msg=f"mesh size {nmesh}")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-6)


def test_mesh_equality_fsdp_data_axis():
    """fsdp=True on a 1-D data mesh: large state leaves shard over the
    DATA axis (ZeRO-3-style memory sharding; XLA all-gathers weights
    into the compute and reduce-scatters updates). Global step semantics
    are unchanged, so losses and post-step params must equal the
    single-device run — and the rule must actually shard leaves."""
    rng = np.random.RandomState(0)
    batches = [
        {"x": jnp.asarray(rng.randn(B, 8, 8, 1).astype(np.float32)),
         "y": None}
        for _ in range(2)
    ]

    def run(n_dev):
        model = SNGan(CONV_ARCH, num_class=0, loss_type="rep",
                      compute_dtype=jnp.float32)
        opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
        ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
        if n_dev is None:
            step = jax.jit(build_train_step(model, opt_d, opt_g))
            dp = None
        else:
            dp = DataParallel(make_mesh(jax.devices()[:n_dev]))
            ts = dp.shard_state(ts, min_size=1, fsdp=True)
            from jax.tree_util import tree_flatten_with_path, keystr
            _leaves, _ = tree_flatten_with_path(ts.params)
            _sharded = [keystr(p) for p, l in _leaves
                        if any(ax is not None for ax in l.sharding.spec)]
            # at 8 devices only the out=8 leaves divide; at 2, most do
            assert len(_sharded) >= 4, ("fsdp rule left everything "
                                        f"replicated: {_sharded}")
            # out_state_like engages compile_step's gather-to-replicated
            # propagation barriers (the production fsdp path) — equality
            # below proves the gather/reshard round-trip is exact
            step = dp.compile_step(build_train_step(model, opt_d, opt_g),
                                   out_state_like=ts)
        t = jnp.asarray(True)
        losses = []
        for b in batches:
            bb = dp.shard_batch(b) if dp else b
            ts, m = step(ts, bb, t, t)
            losses.append((float(m["loss_gen"]), float(m["loss_dis"])))
        return losses, jax.device_get(ts.params)

    ref_losses, ref_params = run(None)
    for n_dev in (2, 8):
        losses, params = run(n_dev)
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref_losses), rtol=2e-4,
            atol=1e-5, err_msg=f"fsdp {n_dev}-dev losses")
        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6,
                err_msg=f"fsdp {n_dev}-dev params")


def test_fsdp_guards_2d_mesh():
    from mmdgan_tpu.parallel.mesh import make_mesh_2d

    dp2 = DataParallel(make_mesh_2d(2, 2))
    with pytest.raises(AssertionError, match="fsdp shards over the data"):
        dp2.shard_state({"w": jnp.ones((4, 4))}, fsdp=True)


def test_agent_train_preserves_fsdp_sharding(tmp_path):
    """The Agent loops place state with ensure_placed, which must not
    re-replicate a deliberately fsdp-sharded state (that would undo the
    memory saving the feature exists for)."""
    from mmdgan_tpu.train.trainer import Agent

    model = SNGan(CONV_ARCH, num_class=0, loss_type="rep",
                  compute_dtype=jnp.float32)
    opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
    dp = DataParallel(make_mesh(jax.devices()[:2]))
    ts = dp.shard_state(
        init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g),
        min_size=1, fsdp=True)

    def n_sharded(tree):
        return sum(any(ax is not None for ax in l.sharding.spec)
                   for l in jax.tree.leaves(tree))

    before = n_sharded(ts.params)
    assert before >= 4

    rng = np.random.RandomState(0)

    def it():
        while True:
            yield {"x": rng.randn(B, 8, 8, 1).astype(np.float32), "y": None}

    agent = Agent("fsdp", "t", output_dir=str(tmp_path), do_save=False,
                  use_tensorboard=False, query_step=100)
    ts = agent.train(build_train_step(model, opt_d, opt_g), ts, it(),
                     max_step=4, step_per_epoch=4, dp=dp, steps_per_call=2)
    assert int(jax.device_get(ts.step)) == 4
    # XLA's inferred output shardings may shard MORE leaves than the
    # input placement; re-replication (fewer) is the failure mode
    assert n_sharded(ts.params) >= before, (
        "training loop re-replicated the fsdp-sharded state")
