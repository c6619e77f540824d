"""Shared logic + worker entrypoint for the REAL multi-process
``jax.distributed`` CPU tests (tests/test_multihost.py): 2 processes x 4
virtual devices, and 4 processes x 2 virtual devices (VERDICT r4 item 4
— rank-arithmetic bugs symmetric at nproc=2, e.g. shard-order mixups or
process_index-keyed table layouts, surface first at nproc=4).

Each worker process forces the CPU platform with its share of virtual
devices, joins the gloo cluster (8 global devices either way), builds
the global ``data`` mesh, and trains a tiny SNGAN through the *nproc>1*
branches:

- ``DataParallel.replicate`` / ``shard_batch`` via
  ``jax.make_array_from_process_local_data`` (parallel/mesh.py:100-134),
- ``ReadTFRecords.shard()`` per-process input sharding
  (data/pipeline.py, record-level round-robin branch),
- cross-process XLA collectives inside the jitted global-batch step.

The parent test runs the identical computation single-process on the
conftest 8-device mesh (assembling each global batch from both pipeline
shards) and asserts the per-step losses agree.

Run directly: ``python tests/multihost_worker.py <pid> <port> <data_dir>``
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

GLOBAL_BATCH = 16
NUM_RECORDS = 64

# 8x8 single-channel arch (test_trainer.py's tiny model)
TINY_ARCH = {
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


def make_dataset(data_dir: str, n: int = NUM_RECORDS, seed: int = 3):
    """One tfrecord file of n CHW uint8 images — a single file forces the
    record-level round-robin branch of ``ReadTFRecords.shard()``."""
    import numpy as np
    from mmdgan_tpu.data.converters import np_to_tfrecords

    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, (n, 1, 8, 8), np.uint8)
    np_to_tfrecords(x, None, os.path.join(data_dir, "mh"))


def shard_pipeline(data_dir: str, num_shards: int, idx: int,
                   local_batch: int):
    from mmdgan_tpu.data.pipeline import ReadTFRecords

    p = ReadTFRecords("mh", file_folder=data_dir, batch_size=local_batch,
                      buffer_size=1, seed=11, use_native=False)
    p.shape2image(1, 8, 8)
    p.shard(num_shards, idx)
    return p


def train_losses(dp, data_dir: str, steps: int = 4, n_shards: int = 2):
    """Train ``steps`` single steps; returns [[loss_gen, loss_dis], ...].

    Deterministic given the pipeline seed + PRNGKey(7), and identical
    between one 8-device process and nproc-process clusters: the step has
    global-batch semantics, SGD avoids Adam roundoff amplification
    (CLAUDE.md), and the loss is row-permutation invariant. ``n_shards``
    only affects the single-process ground truth: it assembles the global
    batch from that many pipeline shards (matching the cluster's
    round-robin record split, which depends on the process count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import (build_train_step, init_train_state,
                                  multi_opt_config)

    model = SNGan(TINY_ARCH, loss_type="rep", do_summary=False)
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3], optimizer="sgd")
    ts = init_train_state(model, jax.random.PRNGKey(7), opt_d, opt_g)
    step = dp.compile_step(build_train_step(model, opt_d, opt_g))
    ts = dp.replicate(ts)

    nproc = dp.process_count
    if nproc == 1:
        # ground truth: read ALL pipeline shards and assemble the global
        # batch in mesh-device order (shard 0 rows first)
        per_shard = GLOBAL_BATCH // n_shards
        its = [iter(shard_pipeline(data_dir, n_shards, i,
                                   per_shard).next_batch())
               for i in range(n_shards)]

        def batch_iter():
            while True:
                bs = [next(it) for it in its]
                yield {"x": np.concatenate([b["x"] for b in bs]), "y": None}
    else:
        local = dp.local_batch_size(GLOBAL_BATCH)
        assert local == GLOBAL_BATCH // nproc
        it = iter(shard_pipeline(data_dir, nproc, jax.process_index(),
                                 local).next_batch())

        def batch_iter():
            while True:
                yield next(it)  # local slice; shard_batch assembles global

    t = jnp.asarray(True)
    losses = []
    bi = batch_iter()
    for _ in range(steps):
        batch = dp.shard_batch(next(bi))
        ts, m = step(ts, batch, t, t)
        losses.append([float(jax.device_get(m["loss_gen"])),
                       float(jax.device_get(m["loss_dis"]))])
    return losses


def device_data_losses(dp, steps: int = 2, scan_k: int = 3):
    """HBM-resident sharded-dataset training across process boundaries:
    the global [N, ...] dataset is laid out with P('data') (each process
    contributes its local rows), and the shard_map sampler draws
    per-device. Identical global device order + per-device folded RNG
    streams make the sampled batches — and hence the losses — equal
    between one 8-device process and 2x4-device processes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_device_data_step

    model = SNGan(TINY_ARCH, loss_type="rep", do_summary=False)
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3], optimizer="sgd")
    ts = dp.replicate(init_train_state(model, jax.random.PRNGKey(9),
                                       opt_d, opt_g))
    builder = build_device_data_step(
        model, opt_d, opt_g, num_steps=scan_k, batch_size=GLOBAL_BATCH)
    fn = jax.jit(builder.with_mesh(dp.mesh, axis=dp.axis))

    n = 64
    data_np = np.random.RandomState(5).randint(0, 256, (n, 8, 8, 1),
                                               np.uint8)
    sharding = NamedSharding(dp.mesh, P(dp.axis))
    if dp.process_count == 1:
        data = jax.device_put(data_np, sharding)
    else:
        local_n = n // dp.process_count
        local = data_np[jax.process_index() * local_n:
                        (jax.process_index() + 1) * local_n]
        data = jax.make_array_from_process_local_data(
            sharding, local, data_np.shape)

    rng = jax.random.PRNGKey(17)
    on = jnp.ones(())
    losses = []
    for _ in range(steps):
        ts, rng, m = fn(ts, data, None, rng, on, on)
        losses.append(np.asarray(jax.device_get(m["loss_gen"])).tolist())
    return losses



def fsdp_losses(dp, steps: int = 3):
    """FSDP state sharding across process boundaries: every large state
    leaf is laid out P(..., 'data') over the GLOBAL mesh, each process
    contributing its addressable shards (make_array_from_callback from
    the shared-seed host value). The step keeps global semantics, so the
    losses equal the single-process run; out_state_like pins the layout
    through the steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import (build_train_step, init_train_state,
                                  multi_opt_config)

    model = SNGan(TINY_ARCH, loss_type="rep", do_summary=False)
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3], optimizer="sgd")
    ts = init_train_state(model, jax.random.PRNGKey(21), opt_d, opt_g)
    ts = dp.shard_state(ts, min_size=1, fsdp=True)
    n_sharded = sum(
        any(ax is not None for ax in l.sharding.spec)
        for l in jax.tree.leaves(ts.params))
    assert n_sharded >= 4, n_sharded
    step = dp.compile_step(build_train_step(model, opt_d, opt_g),
                           out_state_like=ts)
    rng = np.random.RandomState(13)
    t = jnp.asarray(True)
    losses = []
    for _ in range(steps):
        host = rng.randn(GLOBAL_BATCH, 8, 8, 1).astype(np.float32)
        if dp.process_count == 1:
            batch = dp.shard_batch({"x": host, "y": None})
        else:
            local = dp.local_batch_size(GLOBAL_BATCH)
            i = jax.process_index()
            batch = dp.shard_batch(
                {"x": host[i * local:(i + 1) * local], "y": None})
        ts, m = step(ts, batch, t, t)
        losses.append([float(jax.device_get(m["loss_gen"])),
                       float(jax.device_get(m["loss_dis"]))])
    return losses


COND_ARCH = {
    "input": [(1, 8, 8)],
    "code": [(8, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
         "act_nm": "cbn", "out_reshape": [1, 8, 8]}],
    "discriminator": [
        {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 1.3, "in_reshape": [8 * 8]},
        {"name": "l2", "out": 4, "op": "dck", "w_nm": "s", "act_k": 1.0}],
}


def same_class_facade_params(dp, out_dir: str, sampling: str):
    """sample_same_class over a multi-process mesh THROUGH THE FACADE
    (VERDICT r3 item 5b): each process passes its LOCAL rows+labels;
    ``Agent.train_device_data`` builds process-local class tables (width
    pinned to local_n) and assembles them globally. With per-class-
    constant rows the run must equal the single-process facade run for
    both the uniform gather and the shuffled_epochs class schedule.
    Returns the flattened final params."""
    import numpy as np
    import jax

    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.trainer import Agent

    num_class, n = 4, 64
    y = (np.arange(n) % num_class).astype(np.int32).reshape(-1, 1)
    x = np.stack([np.full((8, 8, 1), 40 + 50 * int(c), np.uint8)
                  for c in y[:, 0]])
    model = SNGan(COND_ARCH, num_class=num_class, loss_type="rep",
                  do_summary=False)
    model.sample_same_class = True
    opt_d, opt_g = multi_opt_config([1e-2, 1e-2], optimizer="sgd")
    ts = init_train_state(model, jax.random.PRNGKey(31), opt_d, opt_g)

    if dp.process_count == 1:
        data = {"x": x, "y": y}
    else:
        ln = n // dp.process_count
        i = jax.process_index()
        data = {"x": x[i * ln:(i + 1) * ln], "y": y[i * ln:(i + 1) * ln]}

    agent = Agent(f"sc_{sampling}", f"p{jax.process_index()}",
                  output_dir=out_dir, query_step=100, do_save=False,
                  use_tensorboard=False)
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=6, step_per_epoch=16,
        batch_size=16, steps_per_call=3, dp=dp, seed=0,
        sample_same_class=True, sampling=sampling, sampling_seed=23)
    return [np.asarray(l).ravel().tolist()
            for l in jax.tree.leaves(jax.device_get(ts.params))]


def worker_main():
    pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    local_devices = 8 // nproc
    # CPU with 8/nproc virtual devices per process; the env var is set by
    # the spawning test, the config knob beats any pre-imported platform
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == local_devices
    assert jax.device_count() == 8

    from mmdgan_tpu.parallel.mesh import DataParallel

    dp = DataParallel()
    assert dp.process_count == nproc
    losses = train_losses(dp, data_dir)
    print("RESULT " + json.dumps(losses), flush=True)
    dd_losses = device_data_losses(dp)
    print("RESULT_DD " + json.dumps(dd_losses), flush=True)
    f_losses = fsdp_losses(dp)
    print("RESULT_FSDP " + json.dumps(f_losses), flush=True)
    for sampling in ("uniform", "shuffled_epochs"):
        sc = same_class_facade_params(dp, data_dir, sampling)
        print(f"RESULT_SC_{sampling} " + json.dumps(sc), flush=True)


if __name__ == "__main__":
    worker_main()
