#!/usr/bin/env python
"""Build a small model with the REFERENCE's own graph builder (read-only,
under tf.compat.v1) and dump its variables + input/output tensors to an
.npz — ground truth for the TF1 checkpoint importer cross-validation
(tests/test_tf1_crossval.py).

Run in a subprocess (it monkeypatches sys.modules['tensorflow'] to the v1
compat API and disables v2 behavior, which must not leak into the caller).

  python tools/dump_reference_model.py --mode nhwc_conv --out dump.npz
  python tools/dump_reference_model.py --mode nchw_dense --out dump.npz
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True, choices=["nhwc_conv", "nchw_dense", "cifar_nhwc", "cond_nhwc", "resnl_nhwc", "misc_nhwc"])
    p.add_argument("--out", required=True)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf  # reference code does `import tensorflow as tf`
    sys.path.insert(0, args.reference)
    # numpy>=1.24 removed the np.int alias the TF1-era reference uses
    if not hasattr(np, "int"):
        np.int = int

    # Keras 3 removed tf.layers.batch_normalization; shim the inference
    # path with identical variable naming ({scope}/BN/gamma etc.) and the
    # TF1 defaults (epsilon=1e-3).
    def _bn_shim(inputs, axis=-1, center=True, scale=True,
                 beta_initializer=None, gamma_initializer=None,
                 gamma_constraint=None, training=False, renorm=False,
                 fused=True, name="BN"):
        assert training is False, "dump tool shims inference-mode BN only"
        ch = inputs.shape.as_list()[axis]
        shape = [1] * len(inputs.shape.as_list())
        shape[axis] = ch
        with tf.variable_scope(name):
            gamma = tf.get_variable(
                "gamma", [ch],
                initializer=gamma_initializer or tf.ones_initializer()) \
                if scale else None
            beta = tf.get_variable(
                "beta", [ch],
                initializer=beta_initializer or tf.zeros_initializer()) \
                if center else None
            mm = tf.get_variable(
                "moving_mean", [ch], initializer=tf.zeros_initializer(),
                trainable=False)
            mv = tf.get_variable(
                "moving_variance", [ch], initializer=tf.ones_initializer(),
                trainable=False)
            rs = lambda v: None if v is None else tf.reshape(v, shape)
            return tf.nn.batch_normalization(
                inputs, rs(mm), rs(mv), rs(beta), rs(gamma), 1e-3)

    import types
    tf.layers = types.SimpleNamespace(batch_normalization=_bn_shim)

    from GeneralTools.layer_func import Net, Routine  # noqa: E402

    rng = np.random.RandomState(args.seed)
    if args.mode == "nhwc_conv":
        data_format = "channels_last"
        code_size, batch = 16, 4
        image_shape = [8, 8, 2]  # HWC
        gen_design = [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 8]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 2, "op": "c", "act": "tanh", "kernel": 3,
             "strides": 1},
        ]
        dis_design = [
            {"name": "l1", "out": 8, "op": "c", "act": "lrelu", "act_k": 1.3,
             "w_nm": "s", "kernel": 3, "strides": 2,
             "out_reshape": [4 * 4 * 8]},
            {"name": "l2", "out": 4, "op": "d", "w_nm": "s", "act_k": 1.0},
        ]
    elif args.mode == "misc_nhwc":
        # the remaining op catalogue: dcd, tcck, lrn, conditional biases
        # (cb/bcb), separable conv, sum-pool
        data_format = "channels_last"
        code_size, batch = 16, 6
        num_class = 3
        image_shape = [8, 8, 2]
        gen_design = [
            {"name": "l1", "op": "dcd", "out": 4 * 4 * 4, "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 4]},
            # NOTE: 'tcck' is in the reference's op catalogue but its
            # _get_shape_ never implements it (layer_func.py:685 raises)
            # — unusable there; we support it (tests/test_conditional).
            {"name": "l2", "op": "tc", "out": 4, "act": "relu",
             "act_nm": "lrn", "kernel": 4, "strides": 2, "bias": "bcb"},
            {"name": "l3", "op": "c", "out": 2, "act": "tanh", "kernel": 3,
             "strides": 1, "bias": "cb"},
        ]
        dis_design = [
            {"name": "l1", "op": "sc", "out": 8, "act": "lrelu",
             "act_k": 1.3, "kernel": 3, "strides": 2},
            {"name": "l2", "op": "sum", "out": 8, "kernel": 2, "strides": 2,
             "act": "linear", "act_nm": None, "out_reshape": [2 * 2 * 8]},
            {"name": "l3", "op": "d", "out": 4, "w_nm": "s", "act_k": 1.0},
        ]
    elif args.mode == "resnl_nhwc":
        # residual generator block + non-local (attention) discriminator
        data_format = "channels_last"
        code_size, batch = 16, 6
        image_shape = [8, 8, 2]
        gen_design = [
            {"name": "l1", "out": 4 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 4]},
            {"name": "l2", "type": "res", "out": 8, "act": "relu",
             "act_nm": "bn", "kernel": [3, 3, 1], "strides": 1,
             "scale": ["bil", 2]},
            {"name": "l3", "out": 2, "op": "c", "act": "tanh", "kernel": 3,
             "strides": 1},
        ]
        dis_design = [
            {"name": "l1", "out": 8, "op": "c", "act": "lrelu",
             "act_k": 1.3, "w_nm": "s", "kernel": 3, "strides": 2},
            {"name": "l2", "type": "nl_pool", "op": "c",
             "out": [2, 2, 8], "kernel": [1, 1, 1], "act": "linear",
             "w_nm": None, "act_nm": "bn", "out_reshape": [4 * 4 * 8]},
            {"name": "l3", "out": 4, "op": "d", "w_nm": "s", "act_k": 1.0},
        ]
    elif args.mode == "cond_nhwc":
        # conditional ops: cbn generator, cck/dck layers, projection D
        data_format = "channels_last"
        code_size, batch = 16, 6
        num_class = 3
        image_shape = [8, 8, 2]
        gen_design = [
            {"name": "l1", "out": 2 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 2]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu",
             "act_nm": "cbn", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 2, "op": "cck", "act": "tanh", "kernel": 3,
             "strides": 1},
        ]
        dis_design = [
            {"name": "l1", "out": 8, "op": "c", "act": "lrelu", "act_k": 1.3,
             "w_nm": "s", "kernel": 3, "strides": 2,
             "out_reshape": [4 * 4 * 8]},
            {"name": "l2", "out": 4, "op": "dck", "act": "lrelu",
             "w_nm": "s", "act_k": 1.0},
            {"name": "l3", "out": 1, "op": "d", "type": "project",
             "w_nm": "s", "act_k": 1.0},
        ]
    elif args.mode == "cifar_nhwc":
        # the FULL my_test_cifar.py architecture (channels_last reshapes)
        data_format = "channels_last"
        code_size, batch = 128, 4
        image_shape = [32, 32, 3]
        act_k = float(np.power(64.0, 0.125))
        gen_design = [
            {"name": "l1", "out": 512 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 512]},
            {"name": "l2_up", "out": 256, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l3_up", "out": 128, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l4_up", "out": 64, "op": "tc", "act": "relu",
             "act_nm": "bn", "kernel": 4, "strides": 2},
            {"name": "l5_t32", "out": 3, "act": "tanh"},
        ]
        dis_design = [
            {"name": "l1_f32", "out": 64, "act": "lrelu", "act_k": act_k, "w_nm": "s"},
            {"name": "l2_ds", "out": 128, "act": "lrelu", "act_k": act_k,
             "w_nm": "s", "kernel": 4, "strides": 2},
            {"name": "l3", "out": 128, "act": "lrelu", "act_k": act_k, "w_nm": "s"},
            {"name": "l4_ds", "out": 256, "act": "lrelu", "act_k": act_k,
             "w_nm": "s", "kernel": 4, "strides": 2},
            {"name": "l5", "out": 256, "act": "lrelu", "act_k": act_k, "w_nm": "s"},
            {"name": "l6_ds", "out": 512, "act": "lrelu", "act_k": act_k,
             "w_nm": "s", "kernel": 4, "strides": 2},
            {"name": "l7", "out": 512, "op": "c", "act": "lrelu", "act_k": act_k,
             "w_nm": "s", "out_reshape": [4 * 4 * 512]},
            {"name": "l8_s", "out": 16, "op": "d", "act_k": act_k, "bias": "b",
             "w_nm": "s"},
        ]
    else:  # nchw_dense: no convs (CPU cannot run NCHW convs)
        data_format = "channels_first"
        code_size, batch = 16, 4
        image_shape = [2, 4, 4]  # CHW
        gen_design = [
            {"name": "l1", "out": 32, "op": "d", "act": "relu", "act_nm": None},
            {"name": "l2", "out": 2 * 4 * 4, "op": "d", "act": "tanh",
             "out_reshape": [2, 4, 4]},
        ]
        dis_design = [
            {"name": "l1", "out": 8, "op": "d", "act": "lrelu", "w_nm": "s", "act_k": 1.0,
             "in_reshape": [2 * 4 * 4]},
            {"name": "l2", "out": 4, "op": "d", "w_nm": "s", "act_k": 1.0},
        ]

    num_class = locals().get("num_class", 0)
    y_np = (rng.randint(0, max(num_class, 1), size=(batch, 1)).astype(np.int32)
            if num_class >= 2 else None)

    graph = tf.Graph()
    with graph.as_default():
        g_net = Net(gen_design, net_name="gen", data_format=data_format,
                    num_class=num_class)
        gen = Routine(g_net)
        gen.add_input_layers([batch, code_size], [0])
        gen.seq_links(list(range(g_net.num_layers)))
        gen.add_output_layers([g_net.num_layers - 1])

        d_net = Net(dis_design, net_name="dis", data_format=data_format,
                    num_class=num_class)
        dis = Routine(d_net)
        dis.add_input_layers([batch] + image_shape, [0])
        dis.seq_links(list(range(d_net.num_layers)))
        dis.add_output_layers([d_net.num_layers - 1])

        z = tf.constant(rng.randn(batch, code_size).astype(np.float32))
        x = tf.constant(rng.randn(batch, *image_shape).astype(np.float32))
        gin = {"x": z}
        din = {"x": x}
        if y_np is not None:
            y = tf.constant(y_np)
            gin["y"] = y
            din["y"] = y
        gen_out = gen(gin, is_training=False)["x"]
        dis_out = dis(din, is_training=False)["x"]

        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            # randomize EVERY variable (zero-initialized conditional kernels
            # and BN statistics would otherwise test trivial paths)
            for v in tf.global_variables():
                shape = [int(s) for s in v.shape]
                val = np.asarray(rng.randn(*shape), np.float32) * 0.3
                if "moving_variance" in v.op.name:
                    val = np.abs(val) + 0.5
                if "scale" in v.op.name.split("/")[-1]:
                    val = 1.0 + val * 0.2
                sess.run(v.assign(val))
            variables = {v.op.name: sess.run(v) for v in tf.global_variables()}
            z_v, x_v, g_v, d_v = sess.run(
                [z, x, gen_out, dis_out])

    out = {"__z__": z_v, "__x__": x_v, "__gen_out__": g_v, "__dis_out__": d_v,
           "__mode__": np.asarray(args.mode)}
    if y_np is not None:
        out["__y__"] = y_np
    for name, val in variables.items():
        out["var:" + name] = val
    np.savez(args.out, **out)
    print(f"dumped {len(variables)} variables to {args.out}")
    for name in sorted(variables):
        print(" ", name, variables[name].shape)


if __name__ == "__main__":
    main()
