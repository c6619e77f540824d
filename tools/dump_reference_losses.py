#!/usr/bin/env python
"""Evaluate the REFERENCE's loss functions (GANLoss + kernels, read-only
under tf.compat.v1) on fixed score matrices and dump the values — ground
truth for tests/test_tf1_crossval.py::test_losses_match_reference_code.

Covers the deterministic losses (the mix/instance-noise families need TF
variables + UPDATE_OPS and are validated against formulas instead).
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--seed", type=int, default=3)
    args = p.parse_args()

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, args.reference)
    if not hasattr(np, "int"):
        np.int = int

    from GeneralTools.math_func import (  # noqa: E402
        GANLoss,
        cramer,
        get_squared_dist,
        mmd_g,
        mmd_g_bounded,
        mmd_t,
        rand_mmd_g,
        rand_mmd_g_xy,
        rand_mmd_g_xy_bounded,
        rand_mmd_g_xn,
        witness_g,
        witness_t,
    )

    rng = np.random.RandomState(args.seed)
    b, d = args.batch, args.d
    s_gen = rng.randn(b, d).astype(np.float32)
    s_x = rng.randn(b, d).astype(np.float32)

    out = {"__s_gen__": s_gen, "__s_x__": s_x}
    graph = tf.Graph()
    with graph.as_default():
        tg = tf.constant(s_gen)
        tx = tf.constant(s_x)
        fetches = {}

        # dispatcher losses (fixed omega via kwargs to avoid RNG)
        gl = GANLoss(do_summary=False)
        for loss_type in ["logistic", "hinge", "rep", "rmb", "mmd_g", "mmd_t",
                          "mgb"]:
            lg, ld = gl.apply(tg, tx, loss_type, batch_size=b, d=d)
            fetches[f"loss:{loss_type}:gen"] = lg
            fetches[f"loss:{loss_type}:dis"] = ld
        for loss_type in ["rand_g", "rgb"]:
            lg, ld = gl.apply(tg, tx, loss_type, batch_size=b, d=d,
                              omega=0.45)  # scalar -> no RNG
            fetches[f"loss:{loss_type}:gen"] = lg
            fetches[f"loss:{loss_type}:dis"] = ld

        # kernel-level functions
        dxx, dxy, dyy = get_squared_dist(tg, tx, mode="xxxyyy")
        fetches["fn:mmd_g_s2"] = mmd_g(dxx, dxy, dyy, b, sigma=2.0)
        m1, m2 = mmd_g(dxx, dxy, dyy, b, sigma=1.0, custom_weights=[0.0, -1.0])
        fetches["fn:rep1"], fetches["fn:rep2"] = m1, m2
        b1, b2 = mmd_g_bounded(dxx, dxy, dyy, b, sigma=1.0, lower_bound=0.25,
                               upper_bound=4.0, custom_weights=[0.0, -1.0])
        fetches["fn:rmb1"], fetches["fn:rmb2"] = b1, b2
        fetches["fn:mmd_t"] = mmd_t(dxx, dxy, dyy, b, alpha=0.7, beta=2.0)
        fetches["fn:cramer"] = cramer(dxx, dxy, dyy, b)
        fetches["fn:witness_g"] = witness_g(dxy, dyy, sigma=1.5)
        fetches["fn:witness_t"] = witness_t(dxy, dyy, alpha=0.8, beta=2.0)
        fetches["fn:rand_xy"] = rand_mmd_g_xy(
            dxx, dxy, dyy, b, omega=0.4, max_iter=3)
        r1, r2 = rand_mmd_g_xy_bounded(dxx, dxy, dyy, b, omega=0.4, max_iter=3)
        fetches["fn:rand_xy_b1"], fetches["fn:rand_xy_b2"] = r1, r2
        fetches["fn:rand_xn"] = rand_mmd_g_xn(
            tg, 1.0, b, d, omega=0.4, max_iter=3)
        dall = get_squared_dist(tf.concat([tg, tx], axis=0), mode="xx")
        fetches["fn:rand_all"] = rand_mmd_g(dall, b, omega=0.4, max_iter=3)

        # gradients of the rep/rmb losses w.r.t. the scores — validates
        # gradient semantics (clamp subgradients, off-diagonal masks, the
        # bounded-kernel gradient gating)
        for loss_type in ["rep", "rmb", "mmd_g", "rand_g"]:
            kw = {"omega": 0.45} if loss_type == "rand_g" else {}
            lg, ld = gl.apply(tg, tx, loss_type, batch_size=b, d=d, **kw)
            total = lg + 0.5 * ld
            g_gen, g_x = tf.gradients(total, [tg, tx])
            fetches[f"grad:{loss_type}:gen"] = g_gen
            fetches[f"grad:{loss_type}:x"] = g_x

        with tf.Session() as sess:
            values = sess.run(fetches)

    for k, v in values.items():
        out[k] = np.asarray(v)
    np.savez(args.out, **out)
    print(f"dumped {len(values)} loss values")


if __name__ == "__main__":
    main()
