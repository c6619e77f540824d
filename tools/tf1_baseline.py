#!/usr/bin/env python
"""Measure the TF1 reference's train-step throughput on THIS host, and
ours on the identical configuration — the measured anchor for bench.py's
``vs_baseline`` ratios (VERDICT r4 item 2).

The reference publishes no wall-clock numbers (its duration logging,
graph_func.py:944-946, prints but nothing is recorded in the repo), and
its TF1.8-era GPU stack cannot run here — but its train-step machinery
DOES run under tf.compat.v1 on this host's CPU (the same machinery
tools/dump_reference_train_step.py executes for the cross-validation
tests). So measure the one apples-to-apples comparison this environment
offers: the full CIFAR-architecture SNGAN rep train step, batch 64,
single-device CPU, float32, synthetic in-graph data (no input pipeline
on either side), reference-vs-ours:

- REFERENCE: the reference's own Net/Routine/GANLoss/two-Adam graph
  (my_sngan.py:259-323 semantics: gen fwd, ONE dis pass on concat,
  rep loss, per-collection grads, both apply_gradients + UPDATE_OPS in
  one sess.run — the hot loop of graph_func.py:853-854).
- OURS: build_train_step (the same semantics as one fused JAX step),
  jitted on CPU, float32 compute, value-fetch fenced. ``--scan16``
  additionally times the scan-fused K=16 step — opt-in because dispatch
  amortization is noise against a ~36 s CPU step and the CPU scan
  compile alone takes ~1 h on this host.

Prints ONE JSON line. Caveats the number honestly: a 2026 CPU is not a
2018 GPU; the measured CPU-vs-CPU ratio anchors the *software stacks*,
and BASELINE.md chains it to the assumed TF1-GPU figure.

    python tools/tf1_baseline.py --steps 20 --warmup 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
CODE = 128


def reference_steps_per_sec(args):
    """Build the reference's CIFAR training graph (channels_last — TF's
    CPU conv path needs NHWC) and time the per-step sess.run."""
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, args.reference)
    if not hasattr(np, "int"):
        np.int = int

    # tf.layers.batch_normalization shim (same as
    # tools/dump_reference_train_step.py — tf.layers is gone in TF2's
    # compat; the shim emits the stock moments/batch_normalization ops
    # TF1 would have run)
    def _bn_shim(inputs, axis=-1, center=True, scale=True,
                 beta_initializer=None, gamma_initializer=None,
                 gamma_constraint=None, training=False, renorm=False,
                 fused=True, name="BN"):
        ch = inputs.shape.as_list()[axis]
        bshape = [1] * len(inputs.shape.as_list())
        bshape[axis] = ch
        momentum, eps = 0.99, 1e-3
        with tf.variable_scope(name):
            gamma = tf.get_variable(
                "gamma", [ch],
                initializer=gamma_initializer or tf.ones_initializer()) \
                if scale else None
            beta = tf.get_variable(
                "beta", [ch],
                initializer=beta_initializer or tf.zeros_initializer()) \
                if center else None
            mm = tf.get_variable("moving_mean", [ch],
                                 initializer=tf.zeros_initializer(),
                                 trainable=False)
            mv = tf.get_variable("moving_variance", [ch],
                                 initializer=tf.ones_initializer(),
                                 trainable=False)
            rs = lambda v: None if v is None else tf.reshape(v, bshape)
            if training:
                red = [i for i in range(len(inputs.shape.as_list()))
                       if i != (axis % len(inputs.shape.as_list()))]
                bmean, bvar = tf.nn.moments(inputs, axes=red)
                tf.add_to_collection(
                    tf.GraphKeys.UPDATE_OPS,
                    tf.assign(mm, momentum * mm + (1 - momentum) * bmean))
                tf.add_to_collection(
                    tf.GraphKeys.UPDATE_OPS,
                    tf.assign(mv, momentum * mv + (1 - momentum) * bvar))
                return tf.nn.batch_normalization(
                    inputs, rs(bmean), rs(bvar), rs(beta), rs(gamma), eps)
            return tf.nn.batch_normalization(
                inputs, rs(mm), rs(mv), rs(beta), rs(gamma), eps)

    import types

    tf.layers = types.SimpleNamespace(batch_normalization=_bn_shim)

    from GeneralTools.layer_func import Net, Routine  # noqa: E402
    from GeneralTools.math_func import GANLoss  # noqa: E402

    # my_test_cifar.py:12-38 architecture, channels_last layer specs
    # (the reference's dicts are NCHW-shaped only in out_reshape/input;
    # per-layer channel counts are identical)
    act_k = float(np.power(64.0, 0.125))
    gen_design = [
        {"name": "l1", "out": 512 * 4 * 4, "op": "d", "act": "linear",
         "act_nm": None, "out_reshape": [4, 4, 512]},
        {"name": "l2", "out": 256, "op": "tc", "act": "relu",
         "act_nm": "bn", "kernel": 4, "strides": 2},
        {"name": "l3", "out": 128, "op": "tc", "act": "relu",
         "act_nm": "bn", "kernel": 4, "strides": 2},
        {"name": "l4", "out": 64, "op": "tc", "act": "relu",
         "act_nm": "bn", "kernel": 4, "strides": 2},
        {"name": "l5", "out": 3, "op": "c", "act": "tanh"},
    ]
    dis_design = [
        {"name": "l1", "out": 64, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s"},
        {"name": "l2", "out": 128, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s", "kernel": 4, "strides": 2},
        {"name": "l3", "out": 128, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s"},
        {"name": "l4", "out": 256, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s", "kernel": 4, "strides": 2},
        {"name": "l5", "out": 256, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s"},
        {"name": "l6", "out": 512, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s", "kernel": 4, "strides": 2},
        {"name": "l7", "out": 512, "op": "c", "act": "lrelu",
         "act_k": act_k, "w_nm": "s", "out_reshape": [4 * 4 * 512]},
        {"name": "l8", "out": 16, "op": "d", "act_k": act_k,
         "bias": "b", "w_nm": "s"},
    ]

    rng = np.random.RandomState(0)
    z_np = rng.randn(BATCH, CODE).astype(np.float32)
    x_np = rng.rand(BATCH, 32, 32, 3).astype(np.float32) * 2 - 1

    graph = tf.Graph()
    with graph.as_default():
        g_net = Net(gen_design, net_name="gen",
                    data_format="channels_last")
        gen = Routine(g_net)
        gen.add_input_layers([BATCH, CODE], [0])
        gen.seq_links(list(range(g_net.num_layers)))
        gen.add_output_layers([g_net.num_layers - 1])
        d_net = Net(dis_design, net_name="dis",
                    data_format="channels_last")
        dis = Routine(d_net)
        dis.add_input_layers([2 * BATCH, 32, 32, 3], [0])
        dis.seq_links(list(range(d_net.num_layers)))
        dis.add_output_layers([d_net.num_layers - 1])

        z = tf.constant(z_np)
        x = tf.constant(x_np)
        gen_out = gen({"x": z}, is_training=True)["x"]
        dis_out = dis({"x": tf.concat([x, gen_out], axis=0)},
                      is_training=True)["x"]
        s_x, s_gen = tf.split(dis_out, 2, axis=0)
        loss_gen, loss_dis = GANLoss(do_summary=False).apply(
            s_gen, s_x, "rep", batch_size=BATCH, d=16)

        opt_dis = tf.train.AdamOptimizer(5e-4, beta1=0.5, beta2=0.999,
                                         epsilon=1e-8)
        opt_gen = tf.train.AdamOptimizer(2e-4, beta1=0.5, beta2=0.999,
                                         epsilon=1e-8)
        vars_dis = tf.get_collection(tf.GraphKeys.TRAINABLE_VARIABLES, "dis")
        vars_gen = tf.get_collection(tf.GraphKeys.TRAINABLE_VARIABLES, "gen")
        dis_op = opt_dis.apply_gradients(
            opt_dis.compute_gradients(loss_dis, var_list=vars_dis))
        gen_op = opt_gen.apply_gradients(
            opt_gen.compute_gradients(loss_gen, var_list=vars_gen))
        update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)
        step_fetches = [loss_gen, loss_dis, dis_op, gen_op] + update_ops

        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            print("[tf1] graph built + vars initialized", file=sys.stderr,
                  flush=True)
            for i in range(args.warmup):
                t0 = time.perf_counter()
                sess.run(step_fetches)
                print(f"[tf1] warmup step {i}: "
                      f"{time.perf_counter() - t0:.1f}s",
                      file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            for i in range(args.steps):
                vals = sess.run(step_fetches)
                if (i + 1) % 5 == 0:
                    print(f"[tf1] timed step {i + 1}/{args.steps} "
                          f"({(time.perf_counter() - t0) / (i + 1):.1f}"
                          f"s/step)", file=sys.stderr, flush=True)
            dur = time.perf_counter() - t0
    lg = float(vals[0])
    return args.steps / dur, lg


def ours_steps_per_sec(args):
    """Same configuration through our stack on CPU: f32 compute,
    single fused step AND the scan-fused K=16 step."""
    from mmdgan_tpu.utils.backend import force_platform

    force_platform("cpu")
    import jax
    import jax.numpy as jnp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import (build_train_step, init_train_state,
                                  multi_opt_config)
    from mmdgan_tpu.train.step import build_multi_step

    model = SNGan(cifar_architecture(), num_class=0, loss_type="rep",
                  compute_dtype=jnp.float32)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    rng = np.random.RandomState(0)
    x = rng.rand(BATCH, 32, 32, 3).astype(np.float32) * 2 - 1
    t = jnp.asarray(True)

    step1 = jax.jit(build_train_step(model, opt_d, opt_g))
    batch1 = {"x": jnp.asarray(x), "y": None}
    for i in range(args.warmup):
        t0 = time.perf_counter()
        ts1, m = step1(ts, batch1, t, t)
        float(jax.device_get(m["loss_gen"]))
        print(f"[ours] warmup step {i}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ts1 = ts
    for _ in range(args.steps):
        ts1, m = step1(ts1, batch1, t, t)
    lg = float(jax.device_get(m["loss_gen"]))
    single = args.steps / (time.perf_counter() - t0)
    print(f"[ours] single-step: {1.0 / single:.1f}s/step",
          file=sys.stderr, flush=True)

    fused = None
    if args.scan16:
        # scan-fused K=16 — the TPU configuration's dispatch
        # amortization. Pointless on CPU (dispatch is noise against a
        # ~36 s step and the CPU scan compile alone takes ~1 h on this
        # host), hence opt-in.
        k = 16
        stepk = jax.jit(build_multi_step(model, opt_d, opt_g, k))
        batchk = {"x": jnp.asarray(np.broadcast_to(x, (k,) + x.shape).copy()),
                  "y": None}
        tsk, m = stepk(ts, batchk, t, t)
        float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
        n_calls = max(args.steps // k, 1)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            tsk, m = stepk(tsk, batchk, t, t)
        float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
        fused = n_calls * k / (time.perf_counter() - t0)
    return single, fused, lg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--scan16", action="store_true",
                    help="also time the scan-fused K=16 step (adds ~1h "
                         "of CPU compile on this host; the single-step "
                         "number is the anchor)")
    args = ap.parse_args()

    out = {"metric": "tf1_reference_cpu_baseline", "unit": "steps/sec",
           "batch": BATCH, "arch": "cifar32_sngan_rep",
           "host": "single-core CPU (this environment)",
           "method": ("reference Net/Routine/GANLoss/2xAdam graph, one "
                      "sess.run([losses, both apply_gradients, "
                      "UPDATE_OPS]) per step (graph_func.py:853-854), "
                      "synthetic in-graph constants, channels_last, "
                      f"{args.warmup} warmup + {args.steps} timed steps; "
                      "ours: identical config via build_train_step, f32, "
                      "jitted on the same CPU, value-fetch fenced")}
    if not args.skip_reference:
        tf1_sps, tf1_loss = reference_steps_per_sec(args)
        out["tf1_steps_per_sec"] = round(tf1_sps, 4)
        out["tf1_loss_gen"] = round(tf1_loss, 4)
    if not args.skip_ours:
        single, fused, lg = ours_steps_per_sec(args)
        out["ours_cpu_steps_per_sec"] = round(single, 4)
        if fused is not None:
            out["ours_cpu_scan16_steps_per_sec"] = round(fused, 4)
        out["ours_loss_gen"] = round(lg, 4)
    if "tf1_steps_per_sec" in out and "ours_cpu_steps_per_sec" in out:
        out["cpu_ratio_single_step"] = round(
            out["ours_cpu_steps_per_sec"] / out["tf1_steps_per_sec"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
