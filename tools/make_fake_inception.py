#!/usr/bin/env python
"""Synthesize a random-weight frozen graph with the
``inception_v1_2015_12_05`` TOPOLOGY SHAPE (VERDICT r3 item 6 / next #6).

The reference's published IS/FID numbers come from the frozen
``classify_image``-style graph (`/root/reference/Addon/inception_v1/
ReadMe.md`, graph_func.py:1616): images fed at tensor ``Mul:0``
([N, 299, 299, 3]), outputs ``logits:0`` ([N, 1008]) and ``pool_3:0``
([N, 1, 1, 2048]). The weights file itself cannot be obtained in this
zero-egress environment — but everything AROUND the weights can be
rehearsed: this tool emits a .pb with the same tensor contract and the
same legacy op set (Conv2D + BatchNormWithGlobalNormalization + Relu,
MaxPool/AvgPool, LRN, legacy ``Concat`` AND ``ConcatV2`` inception
towers, Reshape/MatMul/BiasAdd/Softmax), random-weight but deterministic
(fixed seed), so `tools/inception_rehearsal.py` can drive the complete
restore -> 781x64 batches -> IS/FID flow and cross-check the
GraphDef->JAX executor against TensorFlow's own execution of the
identical .pb. Channel widths are slimmed (the topology and op set are
what is under test, not the FLOPs) except the contract-bearing dims:
pool_3 is 2048-wide and logits 1008-wide like the real graph.

``BatchNormWithGlobalNormalization`` was removed at GraphDef version 9,
so — exactly like the real 2015 frozen graph — the .pb must carry an
old ``versions.producer``; TF 2.21 refuses to BUILD such a graph but
still EXECUTES one, so the GraphDef is assembled directly in proto form
(producer=8) rather than through the TF graph builder.

Usage: python tools/make_fake_inception.py --out /tmp/fake_inception.pb
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_graph_def(seed: int = 0):
    from tensorflow.core.framework import (attr_value_pb2, graph_pb2,
                                           types_pb2)
    from tensorflow.python.framework import tensor_util

    rng = np.random.RandomState(seed)
    gd = graph_pb2.GraphDef()
    gd.versions.producer = 8  # pre-dates BNWGN's removal (version 9)

    def node(name, op, inputs=(), **attrs):
        n = gd.node.add()
        n.name = name
        n.op = op
        n.input.extend(inputs)
        for k, v in attrs.items():
            a = attr_value_pb2.AttrValue()
            if isinstance(v, bool):
                a.b = v
            elif isinstance(v, int):
                a.i = v
            elif isinstance(v, float):
                a.f = v
            elif isinstance(v, str):
                a.s = v.encode()
            elif isinstance(v, (list, tuple)):
                a.list.i.extend(v)
            elif v == types_pb2.DT_FLOAT or v == types_pb2.DT_INT32:
                a.type = v
            else:
                raise TypeError((k, v))
            n.attr[k].CopyFrom(a)
        return name

    F = attr_value_pb2.AttrValue(type=types_pb2.DT_FLOAT)
    I32 = attr_value_pb2.AttrValue(type=types_pb2.DT_INT32)

    def typed(name):
        # set T after generic attrs (proto map assignment)
        for n in gd.node:
            if n.name == name and "T" not in n.attr:
                n.attr["T"].CopyFrom(F)
        return name

    cid = [0]

    def const(arr, name=None):
        arr = np.asarray(arr)
        name = name or f"const_{cid[0]}"
        cid[0] += 1
        n = gd.node.add()
        n.name = name
        n.op = "Const"
        n.attr["dtype"].CopyFrom(
            attr_value_pb2.AttrValue(
                type=types_pb2.DT_INT32 if arr.dtype == np.int32
                else types_pb2.DT_FLOAT))
        n.attr["value"].tensor.CopyFrom(tensor_util.make_tensor_proto(arr))
        return name

    def w(shape, scale=None):
        scale = scale or float(np.sqrt(2.0 / np.prod(shape[:-1])))
        return const(rng.randn(*shape).astype(np.float32) * scale)

    # feed point: the real graph's 'Mul' preprocessing node
    n = gd.node.add()
    n.name = "input_images"
    n.op = "Placeholder"
    n.attr["dtype"].CopyFrom(F)
    node("mul_one", "Const")
    gd.node[-1].attr["dtype"].CopyFrom(F)
    gd.node[-1].attr["value"].tensor.CopyFrom(
        tensor_util.make_tensor_proto(np.float32(1.0)))
    typed(node("Mul", "Mul", ["input_images", "mul_one"]))

    def conv_bn(x, cin, cout, k, s, padding="SAME"):
        c = typed(node(f"conv_{cid[0]}", "Conv2D", [x, w([k, k, cin, cout])],
                       strides=[1, s, s, 1], padding=padding))
        bn = typed(node(
            f"bn_{cid[0]}", "BatchNormWithGlobalNormalization",
            [c,
             const(rng.randn(cout).astype(np.float32) * 0.1),
             const((rng.rand(cout) * 0.5 + 0.5).astype(np.float32)),
             const(rng.randn(cout).astype(np.float32) * 0.1),
             const((1.0 + rng.randn(cout) * 0.1).astype(np.float32))],
            variance_epsilon=1e-3, scale_after_normalization=True))
        return typed(node(f"relu_{cid[0]}", "Relu", [bn]))

    def pool(x, op, k, s, padding, name=None):
        return typed(node(name or f"{op.lower()}_{cid[0]}", op, [x],
                          ksize=[1, k, k, 1], strides=[1, s, s, 1],
                          padding=padding))

    def tower(x, cin, c1, c3r, c3, cp, legacy):
        b1 = conv_bn(x, cin, c1, 1, 1)
        b2 = conv_bn(conv_bn(x, cin, c3r, 1, 1), c3r, c3, 3, 1)
        b3 = conv_bn(conv_bn(conv_bn(x, cin, c3r, 1, 1), c3r, c3, 3, 1),
                     c3, c3, 3, 1)
        bp = conv_bn(pool(x, "AvgPool", 3, 1, "SAME"), cin, cp, 1, 1)
        if legacy:  # pre-V2 Concat: dim is input 0
            cat = node(f"concat_{cid[0]}", "Concat",
                       [const(np.int32(3)), b1, b2, b3, bp], N=4)
        else:
            cat = node(f"concatv2_{cid[0]}", "ConcatV2",
                       [b1, b2, b3, bp, const(np.int32(3))], N=4)
            gd.node[-1].attr["Tidx"].CopyFrom(I32)
        typed(cat)
        return cat, c1 + c3 + c3 + cp

    # stem: 299 -> 149 -> 74 -> 36 -> 17, with GoogLeNet's LRN
    y = conv_bn("Mul", 3, 16, 3, 2, "VALID")
    y = conv_bn(y, 16, 24, 3, 2, "VALID")
    y = pool(y, "MaxPool", 3, 2, "VALID")
    y = typed(node("lrn", "LRN", [y], depth_radius=5, bias=1.0,
                   alpha=1e-4, beta=0.75))
    y = conv_bn(y, 24, 32, 1, 1)
    y = conv_bn(y, 32, 48, 3, 2, "VALID")

    y, ch = tower(y, 48, 24, 16, 24, 16, legacy=True)      # 17x17x88
    y = pool(y, "MaxPool", 3, 2, "VALID")                  # 8x8
    y, ch = tower(y, ch, 32, 24, 32, 24, legacy=False)     # 8x8x120
    y = conv_bn(y, ch, 2048, 1, 1)                         # 8x8x2048

    p3 = pool(y, "AvgPool", 8, 1, "VALID", name="pool_3")  # [N,1,1,2048]
    flat = typed(node("flatten", "Reshape",
                      [p3, const(np.asarray([-1, 2048], np.int32))]))
    gd.node[-1].attr["Tshape"].CopyFrom(I32)
    mm = typed(node("matmul", "MatMul", [flat, w([2048, 1008], 0.05)],
                    transpose_a=False, transpose_b=False))
    logits = typed(node("logits", "BiasAdd",
                        [mm, const(np.zeros(1008, np.float32))]))
    typed(node("softmax", "Softmax", [logits]))
    return gd


def debnwgn(gd):
    """Mechanically rewrite every BatchNormWithGlobalNormalization node
    into its defining primitives (y = (t - m) * (gamma / sqrt(v + eps))
    + beta) so MODERN TensorFlow can execute the twin graph — TF 2.x
    refuses the legacy op outright (removed at GraphDef version 9), even
    though it is exactly what the real 2015 frozen inception graph
    contains. The twin is a local rewrite of the SAME GraphDef, so
    TF(twin) == JAX-executor(original) validates the executor end to
    end, including its BNWGN math."""
    from tensorflow.core.framework import (attr_value_pb2, graph_pb2,
                                           types_pb2)
    from tensorflow.python.framework import tensor_util

    out = graph_pb2.GraphDef()
    out.versions.CopyFrom(gd.versions)
    F = attr_value_pb2.AttrValue(type=types_pb2.DT_FLOAT)

    def prim(name, op, inputs):
        n = out.node.add()
        n.name = name
        n.op = op
        n.input.extend(inputs)
        n.attr["T"].CopyFrom(F)
        return name

    for n in gd.node:
        if n.op != "BatchNormWithGlobalNormalization":
            out.node.add().CopyFrom(n)
            continue
        t, m, v, beta, gamma = n.input[:5]
        assert n.attr["scale_after_normalization"].b
        eps = out.node.add()
        eps.name = f"{n.name}/eps"
        eps.op = "Const"
        eps.attr["dtype"].CopyFrom(F)
        eps.attr["value"].tensor.CopyFrom(tensor_util.make_tensor_proto(
            np.float32(n.attr["variance_epsilon"].f)))
        veps = prim(f"{n.name}/veps", "Add", [v, eps.name])
        rstd = prim(f"{n.name}/rstd", "Rsqrt", [veps])
        scale = prim(f"{n.name}/scale", "Mul", [gamma, rstd])
        centered = prim(f"{n.name}/centered", "Sub", [t, m])
        scaled = prim(f"{n.name}/scaled", "Mul", [centered, scale])
        prim(n.name, "Add", [scaled, beta])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/fake_inception_v1.pb")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    gd = build_graph_def(args.seed)
    with open(args.out, "wb") as f:
        f.write(gd.SerializeToString())
    twin = os.path.splitext(args.out)[0] + "_tfexec.pb"
    with open(twin, "wb") as f:
        f.write(debnwgn(gd).SerializeToString())
    ops = sorted({n.op for n in gd.node})
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB), "
          f"{len(gd.node)} nodes, ops: {ops}")
    print(f"wrote TF-executable twin {twin} (BNWGN -> primitives)")


if __name__ == "__main__":
    main()
