"""GraphDef->JAX executor vs TensorFlow on a frozen CNN graph built to
exercise the inception-graph op set."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from mmdgan_tpu.metrics.tf_graph_jax import GraphDefModule  # noqa: E402


def build_frozen_cnn():
    """A small frozen graph using the ops the inception pb uses."""
    g = tf.Graph()
    rng = np.random.RandomState(0)
    with g.as_default():
        x = tf.compat.v1.placeholder(tf.float32, [None, 16, 16, 3], name="input")
        w1 = tf.constant(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2, name="w1")
        b1 = tf.constant(rng.randn(8).astype(np.float32) * 0.1, name="b1")
        conv = tf.nn.conv2d(x, w1, strides=[1, 2, 2, 1], padding="SAME")
        conv = tf.nn.bias_add(conv, b1)
        # old-style batch norm with global normalization
        # modern TF cannot emit the legacy BatchNormWithGlobalNormalization
        # node (removed at GraphDef version 9; the real inception pb still
        # carries it and the executor supports it — unit-tested separately
        # below). Use the primitive-op expansion here, which exercises
        # Rsqrt/Mul/Sub/Add.
        m = tf.constant(rng.randn(8).astype(np.float32) * 0.1, name="m")
        v = tf.constant(np.abs(rng.randn(8)).astype(np.float32) + 0.5, name="v")
        beta = tf.constant(rng.randn(8).astype(np.float32) * 0.1, name="beta")
        gamma = tf.constant(np.abs(rng.randn(8)).astype(np.float32), name="gamma")
        bn = tf.nn.batch_normalization(conv, m, v, beta, gamma, 1e-3)
        act = tf.nn.relu(bn)
        p1 = tf.nn.max_pool2d(act, ksize=3, strides=2, padding="SAME")
        p2 = tf.nn.avg_pool2d(act, ksize=3, strides=2, padding="SAME")
        cat = tf.concat([p1, p2], axis=3, name="mixed")
        mean = tf.reduce_mean(cat, axis=[1, 2], keepdims=False, name="pool_3")
        w2 = tf.constant(rng.randn(16, 5).astype(np.float32) * 0.3, name="w2")
        logits = tf.linalg.matmul(mean, w2, name="logits")
        probs = tf.nn.softmax(logits, name="probs")
    return g.as_graph_def()


def test_executor_matches_tf(rng):
    gd = build_frozen_cnn()
    x = rng.randn(4, 16, 16, 3).astype(np.float32)

    # TF reference execution
    with tf.Graph().as_default() as g:
        (logits_t, pool_t, probs_t) = tf.graph_util.import_graph_def(
            gd, input_map={}, return_elements=["logits:0", "pool_3:0", "probs:0"],
            name="")
        with tf.compat.v1.Session(graph=g) as sess:
            tf_out = sess.run(
                [logits_t, pool_t, probs_t], feed_dict={"input:0": x})

    mod = GraphDefModule(gd, ["input:0"], ["logits:0", "pool_3:0", "probs:0"])
    jax_out = jax.jit(mod)(x)

    for a, b in zip(tf_out, jax_out):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-4, atol=1e-5)


def test_executor_serialized_bytes_and_batch_poly(rng):
    gd = build_frozen_cnn()
    mod = GraphDefModule(gd.SerializeToString(), ["input:0"], ["logits:0"])
    out1 = mod(rng.randn(2, 16, 16, 3).astype(np.float32))
    out2 = mod(rng.randn(7, 16, 16, 3).astype(np.float32))
    assert out1[0].shape == (2, 5)
    assert out2[0].shape == (7, 5)


def test_unsupported_op_raises(rng):
    g = tf.Graph()
    with g.as_default():
        x = tf.compat.v1.placeholder(tf.float32, [None, 4], name="input")
        _ = tf.math.cumsum(x, name="out")  # op we don't support
    mod = GraphDefModule(g.as_graph_def(), ["input:0"], ["out:0"])
    with pytest.raises(NotImplementedError, match="Cumsum"):
        mod(rng.randn(2, 4).astype(np.float32))


def test_legacy_batchnorm_node(rng):
    """Hand-build the legacy BatchNormWithGlobalNormalization NodeDef and
    check the executor implements its math (the real inception pb uses
    it; modern TF refuses to create it)."""
    from tensorflow.core.framework import graph_pb2, node_def_pb2

    gd = graph_pb2.GraphDef()
    t = rng.randn(2, 4, 4, 3).astype(np.float32)
    m = rng.randn(3).astype(np.float32)
    v = (np.abs(rng.randn(3)) + 0.5).astype(np.float32)
    beta = rng.randn(3).astype(np.float32)
    gamma = (np.abs(rng.randn(3)) + 0.2).astype(np.float32)

    inp = gd.node.add()
    inp.name = "input"
    inp.op = "Placeholder"
    for name, val in [("m", m), ("v", v), ("beta", beta), ("gamma", gamma)]:
        c = gd.node.add()
        c.name = name
        c.op = "Const"
        c.attr["value"].tensor.CopyFrom(tf.make_tensor_proto(val))
    bn = gd.node.add()
    bn.name = "bn"
    bn.op = "BatchNormWithGlobalNormalization"
    bn.input.extend(["input", "m", "v", "beta", "gamma"])
    bn.attr["variance_epsilon"].f = 1e-3
    bn.attr["scale_after_normalization"].b = True

    mod = GraphDefModule(gd, ["input:0"], ["bn:0"])
    (out,) = mod(t)
    expect = (t - m) / np.sqrt(v + 1e-3) * gamma + beta
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_tf1_parity(rng):
    from mmdgan_tpu.metrics.inception import resize_bilinear_tf1

    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear_tf1(x, (37, 29)))
    theirs = tf.compat.v1.image.resize_bilinear(
        tf.constant(x), [37, 29]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_frozen_classifier_backends_agree(tmp_path, rng):
    """FrozenGraphClassifier backend='jax' vs backend='tf' on the same
    frozen graph produce identical activations."""
    from mmdgan_tpu.metrics.inception import FrozenGraphClassifier

    gd = build_frozen_cnn()
    pb = str(tmp_path / "net.pb")
    with open(pb, "wb") as f:
        f.write(gd.SerializeToString())
    imgs = rng.rand(5, 16, 16, 3).astype(np.float32) * 2 - 1

    import mmdgan_tpu.metrics.inception as inc
    # the tiny graph takes 16x16 directly; bypass the 299 resize
    orig = inc.IMAGE_SIZE
    inc.IMAGE_SIZE = 16
    try:
        clf_jax = FrozenGraphClassifier(
            pb, backend="jax", input_tensor="input:0",
            output_tensors=("logits:0", "pool_3:0"))
        clf_tf = FrozenGraphClassifier(
            pb, backend="tf", input_tensor="input:0",
            output_tensors=("logits:0", "pool_3:0"))
        lj, pj = clf_jax(imgs)
        lt, pt = clf_tf(imgs)
    finally:
        inc.IMAGE_SIZE = orig
    np.testing.assert_allclose(lj, lt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pj, pt, rtol=1e-4, atol=1e-5)
