#!/usr/bin/env python
"""Execute ONE full training step with the REFERENCE machinery (Routine +
GANLoss + two Adam optimizers + UPDATE_OPS, under tf.compat.v1) on a small
model with fixed inputs, and dump variables before/after — ground truth
for tests/test_tf1_crossval.py::test_train_step_matches_reference.

This replicates the reference train step exactly (my_sngan.py:259-323 +
graph_func.py:853-854): gen fwd (BN train-mode), ONE dis pass on
concat(real, fake), rep loss, per-collection compute_gradients, both
apply_gradients, and UPDATE_OPS (SN power vectors + BN moving stats) in
the same run.
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr-dis", type=float, default=1e-3)
    p.add_argument("--lr-gen", type=float, default=5e-4)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--ds", action="store_true",
                   help="also dump the scaled-MMD Jacobian-Frobenius "
                        "discriminator scale (my_sngan.py:226-240) and "
                        "its gradients")
    p.add_argument("--gp", action="store_true",
                   help="also dump the MMD witness gradient penalty "
                        "(my_sngan.py:178-223 composition with a fixed "
                        "interpolation) and its discriminator gradients")
    p.add_argument("--conditional", action="store_true",
                   help="conditional model: cbn generator, cck/dck layers, "
                        "projection discriminator, 3 classes")
    args = p.parse_args()

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, args.reference)
    if not hasattr(np, "int"):
        np.int = int

    # tf.layers.batch_normalization shim with TRAINING support: batch-stat
    # normalization + UPDATE_OPS moving-average assigns (momentum 0.99,
    # eps 1e-3 — the TF1 defaults the reference relies on).
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
                red_axes = [i for i in range(len(inputs.shape.as_list()))
                            if i != (axis % len(inputs.shape.as_list()))]
                bmean, bvar = tf.nn.moments(inputs, axes=red_axes)
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

    rng = np.random.RandomState(args.seed)
    code_size, batch = 16, 8
    num_class = 3 if args.conditional else 0
    if args.conditional:
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
    else:
        gen_design = [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [4, 4, 8]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu", "act_nm": "bn",
             "kernel": 4, "strides": 2},
            {"name": "l3", "out": 2, "op": "c", "act": "tanh", "kernel": 3,
             "strides": 1},
        ]
        dis_design = [
            {"name": "l1", "out": 8, "op": "c", "act": "lrelu", "act_k": 1.3,
             "w_nm": "s", "kernel": 3, "strides": 2, "out_reshape": [4 * 4 * 8]},
            {"name": "l2", "out": 4, "op": "d", "w_nm": "s", "act_k": 1.0},
        ]

    z_np = rng.randn(batch, code_size).astype(np.float32)
    x_np = rng.randn(batch, 8, 8, 2).astype(np.float32)
    y_np = (rng.randint(0, num_class, size=(batch, 1)).astype(np.int32)
            if args.conditional else None)

    graph = tf.Graph()
    with graph.as_default():
        g_net = Net(gen_design, net_name="gen", data_format="channels_last",
                    num_class=num_class)
        gen = Routine(g_net)
        gen.add_input_layers([batch, code_size], [0])
        gen.seq_links([0, 1, 2])
        gen.add_output_layers([2])
        d_net = Net(dis_design, net_name="dis", data_format="channels_last",
                    num_class=num_class)
        dis = Routine(d_net)
        dis.add_input_layers([2 * batch, 8, 8, 2], [0])
        dis.seq_links(list(range(d_net.num_layers)))
        dis.add_output_layers([d_net.num_layers - 1])

        z = tf.constant(z_np)
        x = tf.constant(x_np)
        gin = {"x": z}
        if args.conditional:
            y = tf.constant(y_np)
            gin["y"] = y
        gen_out = gen(gin, is_training=True)["x"]
        dis_in = tf.concat([x, gen_out], axis=0)
        din = {"x": dis_in}
        if args.conditional:
            din["y"] = tf.concat([y, y], axis=0)
        dis_out = dis(din, is_training=True)["x"]
        s_x, s_gen = tf.split(dis_out, 2, axis=0)

        loss_gen, loss_dis = GANLoss(do_summary=False).apply(
            s_gen, s_x, "rep", batch_size=batch, d=4)

        gp_fetches = {}
        if args.gp:
            # the reference's mmd_gradient_penalty (my_sngan.py:178-223)
            # composed from its own building blocks with a FIXED uni
            # (__gpu_task__ never wires dis_penalty in the reference — a
            # latent bug — so the penalty is validated stand-alone here)
            from GeneralTools.math_func import get_squared_dist, witness_g
            uni_np = rng.uniform(size=(batch, 1, 1, 1)).astype(np.float32)
            uni = tf.constant(uni_np)
            x_hat = x * uni + gen_out * (1.0 - uni)
            s_hat = dis({"x": x_hat}, is_training=False)["x"]
            dist_zx = get_squared_dist(s_hat, s_x, mode="xy", do_summary=False)
            dist_zy = get_squared_dist(s_hat, s_gen, mode="xy", do_summary=False)
            witness = witness_g(dist_zx, dist_zy, sigma=1.0, do_summary=False)
            g_x_hat = tf.reshape(
                tf.gradients(witness, x_hat)[0], [batch, -1])
            penalty = tf.reduce_mean(
                tf.square(tf.norm(g_x_hat, ord=2, axis=1) - 1))
            loss_dis_gp = loss_dis + 10.0 * penalty
            vars_dis_all = tf.get_collection(
                tf.GraphKeys.TRAINABLE_VARIABLES, "dis")
            for g, v in zip(tf.gradients(loss_dis_gp, vars_dis_all),
                            vars_dis_all):
                if g is not None:
                    gp_fetches["gpgrad:" + v.op.name] = tf.convert_to_tensor(g)
            gp_fetches["__gp_uni__"] = uni
            gp_fetches["__gp_penalty__"] = penalty
        if args.ds:
            # scaled MMD: dis_scale = 1/(0.1*mean(jaco_sfn)+1)
            # (my_sngan.py:226-240; also never wired into training by
            # the reference -- validated stand-alone)
            from GeneralTools.math_func import jacobian_squared_frobenius_norm
            x_var = tf.identity(x)
            s_x_only = dis({"x": x_var}, is_training=False)["x"]
            jaco = jacobian_squared_frobenius_norm(s_x_only, x_var)
            dis_scale = 1.0 / (0.1 * tf.reduce_mean(jaco) + 1.0)
            # rep_ds semantics: (loss_dis - 1) * scale (math_func.py:2525)
            loss_dis_ds = (loss_dis - 1.0) * dis_scale
            vars_dis_all = tf.get_collection(
                tf.GraphKeys.TRAINABLE_VARIABLES, "dis")
            for g, v in zip(tf.gradients(loss_dis_ds, vars_dis_all),
                            vars_dis_all):
                if g is not None:
                    gp_fetches["dsgrad:" + v.op.name] = tf.convert_to_tensor(g)
            gp_fetches["__ds_scale__"] = dis_scale
            gp_fetches["__ds_jaco_mean__"] = tf.reduce_mean(jaco)

        opt_dis = tf.train.AdamOptimizer(
            args.lr_dis, beta1=0.5, beta2=0.999, epsilon=1e-8)
        opt_gen = tf.train.AdamOptimizer(
            args.lr_gen, beta1=0.5, beta2=0.999, epsilon=1e-8)
        vars_dis = tf.get_collection(tf.GraphKeys.TRAINABLE_VARIABLES, "dis")
        vars_gen = tf.get_collection(tf.GraphKeys.TRAINABLE_VARIABLES, "gen")
        grads_dis = opt_dis.compute_gradients(loss_dis, var_list=vars_dis)
        grads_gen = opt_gen.compute_gradients(loss_gen, var_list=vars_gen)
        dis_op = opt_dis.apply_gradients(grads_dis)
        gen_op = opt_gen.apply_gradients(grads_gen)
        update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)

        # raw gradients for diagnostics
        grad_fetches = {}
        for g, v in grads_dis + grads_gen:
            if g is not None:
                # tf.gather grads come back as IndexedSlices; densify
                grad_fetches["grad:" + v.op.name] = tf.convert_to_tensor(g)

        model_vars = [v for v in tf.global_variables()
                      if "Adam" not in v.op.name and "beta1_power" not in v.op.name
                      and "beta2_power" not in v.op.name]
        # Deterministic three-phase execution. The reference's actual
        # one-sess.run step (graph_func.py:853-854) has a data race: the
        # UPDATE_OPS assigns to SN in_rand run concurrently with the
        # sigma-path reads inside the gradient computation (non-resource
        # variables share buffers), so TF's own post-step values vary run
        # to run. Phase 1 fetches losses, gradients AND the values the
        # update ops would assign (computed from pre-step weights — the
        # intended semantics); phase 2 applies the optimizers only.
        update_values = {}
        for op in update_ops:
            # tf.assign op: inputs = (variable_ref, value)
            target = op.op.inputs[0].op.name if hasattr(op, "op") else op.inputs[0].op.name
            update_values[target] = op.op.inputs[1] if hasattr(op, "op") else op.inputs[1]

        # explicit feed-assigns so state updates can be applied from the
        # phase-1 values (deterministic multi-step loop)
        state_vars = {name: v for v in tf.global_variables()
                      for name in [v.op.name]
                      if name in {t for t in update_values}}
        feed_assigns = {}
        for name, var in state_vars.items():
            ph = tf.placeholder(tf.float32, var.shape)
            feed_assigns[name] = (tf.assign(var, ph), ph)

        losses_curve = []
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            before = {v.op.name: sess.run(v) for v in model_vars}
            if gp_fetches:
                gp_vals = sess.run(gp_fetches)
            for step_i in range(args.steps):
                lg, ld, grad_vals, upd_vals = sess.run(
                    [loss_gen, loss_dis, grad_fetches, update_values])
                losses_curve.append((lg, ld))
                sess.run([dis_op, gen_op])
                for name, val in upd_vals.items():
                    op, ph = feed_assigns[name]
                    sess.run(op, feed_dict={ph: val})
            after = {v.op.name: sess.run(v) for v in model_vars}

    out = {"__z__": z_np, "__x__": x_np,
           **({"__y__": y_np} if y_np is not None else {}),
           "__loss_gen__": np.asarray(lg), "__loss_dis__": np.asarray(ld),
           "__curve__": np.asarray(losses_curve)}
    for name, val in before.items():
        out["pre:" + name] = val
    for name, val in after.items():
        out["post:" + name] = val
    for name, val in grad_vals.items():
        out[name] = val
    if args.gp or args.ds:
        for name, val in gp_vals.items():
            out[name] = val
    np.savez(args.out, **out)
    print(f"dumped {len(before)} variables pre/post; "
          f"loss_gen={lg:.6f} loss_dis={ld:.6f}")


if __name__ == "__main__":
    main()
