"""Build the reference CIFAR architecture dict end-to-end and check shapes,
init, forward, SN state updates (parity with my_test_cifar.py:12-38)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmdgan_tpu.models import Layer, Net, Routine, SNGan, update_layer_design

ACT_K = float(np.power(64.0, 0.125))
W_NM = "s"

CIFAR_ARCH = {
    "input": [(3, 32, 32)],
    "code": [(128, "linear")],
    "generator": [
        {"name": "l1", "out": 512 * 4 * 4, "op": "d", "act": "linear",
         "act_nm": None, "out_reshape": [512, 4, 4]},
        {"name": "l2_up", "out": 256, "op": "tc", "act": "relu", "act_nm": "bn",
         "kernel": 4, "strides": 2},
        {"name": "l3_up", "out": 128, "op": "tc", "act": "relu", "act_nm": "bn",
         "kernel": 4, "strides": 2},
        {"name": "l4_up", "out": 64, "op": "tc", "act": "relu", "act_nm": "bn",
         "kernel": 4, "strides": 2},
        {"name": "l5_t32", "out": 3, "act": "tanh"},
    ],
    "discriminator": [
        {"name": "l1_f32", "out": 64, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM},
        {"name": "l2_ds", "out": 128, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM,
         "kernel": 4, "strides": 2},
        {"name": "l3", "out": 128, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM},
        {"name": "l4_ds", "out": 256, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM,
         "kernel": 4, "strides": 2},
        {"name": "l5", "out": 256, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM},
        {"name": "l6_ds", "out": 512, "act": "lrelu", "act_k": ACT_K, "w_nm": W_NM,
         "kernel": 4, "strides": 2},
        {"name": "l7", "out": 512, "op": "c", "act": "lrelu", "act_k": ACT_K,
         "w_nm": W_NM, "out_reshape": [4 * 4 * 512]},
        {"name": "l8_s", "out": 16, "op": "d", "act_k": ACT_K, "bias": "b",
         "w_nm": W_NM},
    ],
}


def test_update_layer_design_defaults():
    d = update_layer_design({"name": "l", "out": 64, "act": "relu", "act_nm": "bn"})
    assert d["op"] == "c" and d["kernel"] == 3 and d["strides"] == 1
    assert d["bias"] is None  # bn removes plain bias
    d2 = update_layer_design({"name": "l", "out": 64, "op": "tc", "scale": ["bil", 2]})
    assert d2["scale"] is None  # tc is itself the upsampler


def test_generator_shapes(key):
    net = Net(CIFAR_ARCH["generator"], net_name="gen")
    r = Routine(net)
    r.add_input_layers([128], [0])
    r.seq_links(list(range(net.num_layers)))
    r.add_output_layers([net.num_layers - 1])
    assert tuple(r.output_shape) == (32, 32, 3)
    params, state = r.init(key)
    z = jax.random.normal(key, (4, 128))
    out, new_state = r.apply(params, state, z, train=True)
    assert out["x"].shape == (4, 32, 32, 3)
    # tanh output range
    assert float(jnp.max(jnp.abs(out["x"]))) <= 1.0
    # BN layers must update state in train mode
    assert "gen/l2_up" in new_state and "BN" in new_state["gen/l2_up"]


def test_discriminator_shapes_and_sn(key):
    net = Net(CIFAR_ARCH["discriminator"], net_name="dis")
    r = Routine(net)
    r.add_input_layers([3, 32, 32], [0])  # reference CHW spec -> NHWC inside
    r.seq_links(list(range(net.num_layers)))
    r.add_output_layers([net.num_layers - 1])
    assert tuple(r.output_shape) == (16,)
    params, state = r.init(key)
    x = jax.random.normal(key, (4, 32, 32, 3))
    out, new_state = r.apply(params, state, x, train=True)
    assert out["x"].shape == (4, 16)
    # every SN layer updated its power vector
    for scope, s in state.items():
        for op_name, op_state in s.items():
            if "sn_x" in op_state:
                before = np.asarray(op_state["sn_x"])
                after = np.asarray(new_state[scope][op_name]["sn_x"])
                assert not np.allclose(before, after), (scope, op_name)


def test_sngan_end_to_end(key):
    mdl = SNGan(CIFAR_ARCH, num_class=0, loss_type="rep")
    params, state, loss_state = mdl.init(key)
    data = {"x": jax.random.normal(key, (8, 32, 32, 3)), "y": None}
    lg, ld, new_state, new_ls, aux = mdl.compute_losses(
        params, state, loss_state, key, data, train=True
    )
    assert np.isfinite(float(lg)) and np.isfinite(float(ld))
    assert "s_x_mean" in aux


def test_sngan_generate(key):
    mdl = SNGan(CIFAR_ARCH, num_class=0, loss_type="rep")
    params, state, _ = mdl.init(key)
    imgs = mdl.generate(params, state, rng=key, batch_size=5)
    assert imgs.shape == (5, 32, 32, 3)
    assert float(jnp.max(jnp.abs(imgs))) <= 1.0


def test_sngan_gradients_flow(key):
    """One fused vjp forward: dloss_gen/dG and dloss_dis/dD both nonzero."""
    mdl = SNGan(CIFAR_ARCH, num_class=0, loss_type="rep")
    params, state, loss_state = mdl.init(key)
    data = {"x": jax.random.normal(key, (8, 32, 32, 3)), "y": None}

    def f(pg, pd):
        lg, ld, *_ = mdl.compute_losses(
            {"gen": pg, "dis": pd}, state, loss_state, key, data, train=True)
        return lg, ld

    (lg, ld), vjp_fn = jax.vjp(f, params["gen"], params["dis"])
    g_gen, _ = vjp_fn((jnp.ones(()), jnp.zeros(())))
    _, g_dis = vjp_fn((jnp.zeros(()), jnp.ones(())))
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g_gen))
    dnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g_dis))
    assert gnorm > 0 and dnorm > 0


def test_res_block_layer(key):
    design = update_layer_design({
        "name": "res1", "type": "res", "out": 8, "act": "relu", "act_nm": "bn",
        "kernel": [3, 3, 1], "strides": 1, "scale": ["bil", 2],
    })
    layer = Layer(design, input_shape=(8, 8, 4), name_prefix="g/")
    layer.build()
    assert tuple(layer.output_shape) == (16, 16, 8)
    params, state = layer.init(key)
    x = jax.random.normal(key, (2, 8, 8, 4))
    out, _ = layer.apply(params, state, x, train=True)
    assert out["x"].shape == (2, 16, 16, 8)


def test_nonlocal_block_layer(key):
    design = update_layer_design({
        "name": "nl1", "type": "nl_pool", "op": "c",
        "out": [2, 2, 8], "kernel": [1, 1, 1], "act": "linear", "w_nm": None,
        "act_nm": None,
    })
    layer = Layer(design, input_shape=(8, 8, 8), name_prefix="g/")
    layer.build()
    assert tuple(layer.output_shape) == (8, 8, 8)
    params, state = layer.init(key)
    x = jax.random.normal(key, (2, 8, 8, 8))
    out, _ = layer.apply(params, state, x, train=True)
    assert out["x"].shape == (2, 8, 8, 8)
    # k_x initialized at 0 => output == input initially
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(x), atol=1e-5)


def test_conditional_generator(key):
    arch = {
        "input": [(1, 8, 8)],
        "code": [(16, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [8, 4, 4]},
            {"name": "l2", "out": 4, "op": "tc", "act": "relu", "act_nm": "cbn",
             "kernel": 4, "strides": 2},
            {"name": "l3", "out": 1, "act": "tanh"},
        ],
        "discriminator": [
            {"name": "l1", "out": 8, "act": "lrelu", "w_nm": "s", "kernel": 3,
             "strides": 2, "out_reshape": [4 * 4 * 8]},
            {"name": "l2", "out": 4, "op": "d", "w_nm": "s"},
        ],
    }
    mdl = SNGan(arch, num_class=3, loss_type="rep")
    params, state, loss_state = mdl.init(key)
    data = {"x": jax.random.normal(key, (6, 8, 8, 1)),
            "y": jnp.array([[0], [1], [2], [0], [1], [2]])}
    lg, ld, *_ = mdl.compute_losses(params, state, loss_state, key, data)
    assert np.isfinite(float(lg))


def test_split_concat_links(key):
    """Exercise the Routine fan-out/fan-in API (split + concat)."""
    net_design = [
        {"name": "in", "out": 8, "op": "d", "act": "relu"},
        {"name": "a", "out": 4, "op": "d", "act": "relu"},
        {"name": "b", "out": 4, "op": "d", "act": "relu"},
        {"name": "out", "out": 2, "op": "d", "act": "linear"},
    ]
    net = Net(net_design, net_name="t")
    r = Routine(net)
    r.add_input_layers([6], [0])
    r.link([0], [1, 2], input_fun="split")     # 8 -> two 4-dim halves
    r.link([1, 2], [3], input_fun="concat")    # 4+4 -> 8 -> dense(2)
    r.add_output_layers([3])
    params, state = r.init(key)
    out, _ = r.apply(params, state, jax.random.normal(key, (3, 6)))
    assert out["x"].shape == (3, 2)


def test_kernel_norms_observability(key):
    """Per-layer sigma readout (reference kernel_norm summaries)."""
    net = Net(CIFAR_ARCH["discriminator"], net_name="dis")
    r = Routine(net)
    r.add_input_layers([3, 32, 32], [0])
    r.seq_links(list(range(net.num_layers)))
    r.add_output_layers([net.num_layers - 1])
    params, state = r.init(key)
    # converge the power vectors a bit
    x = jax.random.normal(key, (2, 32, 32, 3))
    for _ in range(5):
        _, new_state = r.apply(params, state, x, train=True)
        state = jax.tree.map(lambda a, b: b, state, new_state)
    norms = r.kernel_norms(params, state)
    assert len(norms) == 8  # every SN'd conv/dense in the reference D
    for name, sigma in norms.items():
        assert np.isfinite(sigma) and sigma > 0, name


def test_align_corners_resize_matches_tf1():
    """'bil'/'bic' scaling uses TF1 align_corners=True semantics
    (layer_func.py:1142/1152), not half-pixel centers."""
    tf = pytest.importorskip("tensorflow").compat.v1
    from mmdgan_tpu.models.scaling import ImageScaling

    rng = np.random.RandomState(0)
    for method, tf_fn, factor, shape in (
            ("bil", tf.image.resize_bilinear, 2, (2, 5, 7, 3)),
            ("bil", tf.image.resize_bilinear, -2, (2, 8, 12, 3)),
            ("bic", tf.image.resize_bicubic, 2, (2, 5, 7, 3)),
            ("bic", tf.image.resize_bicubic, 3, (2, 4, 4, 2))):
        x = rng.randn(*shape).astype(np.float32)
        sc = ImageScaling({"method": method, "factor": factor}, shape[1:])
        ours = np.asarray(sc.apply(jnp.asarray(x)))
        with tf.Graph().as_default(), tf.Session() as s:
            ref = s.run(tf_fn(tf.constant(x), sc.output_shape[:2],
                              align_corners=True))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{method} factor={factor}")


def test_tc_ps3_lowering_exact():
    """The ps3 periodic-shuffle lowering that _conv_t selects for
    image-resolution tc (k=4/s2/SAME, H >= TC_PS3_MIN_SIZE,
    docs/conv_study.md) must equal lax.conv_transpose exactly — both
    the forward values and the (x, w) VJPs."""
    from mmdgan_tpu.models import ops as mops

    rng = np.random.RandomState(0)
    for h, cin, cout in ((64, 64, 32), (64, 8, 3)):
        x = jnp.asarray(rng.randn(2, h, h, cin), jnp.float32)
        w = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.1, jnp.float32)

        def direct(x, w):
            return jax.lax.conv_transpose(
                x, w, strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ref = direct(x, w)
        got = mops.ParametricOp._conv_t_ps3(x, w)
        assert got.shape == ref.shape == (2, 2 * h, 2 * h, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        ct = jax.random.normal(jax.random.PRNGKey(1), ref.shape)
        gx_r, gw_r = jax.vjp(direct, x, w)[1](ct)
        gx_p, gw_p = jax.vjp(mops.ParametricOp._conv_t_ps3, x, w)[1](ct)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   rtol=2e-4, atol=2e-4)


def test_tc_ps3_gate_selection():
    """_conv_t's ps3 path is gated by TC_PS3_MIN_SIZE (default inf =
    direct everywhere, the measured end-to-end decision in
    docs/conv_study.md); flipping the gate to 64 must route the same op
    through the ps3 lowering and agree with the direct emitter."""
    from mmdgan_tpu.models import ops as mops

    assert mops.TC_PS3_MIN_SIZE == float("inf")
    op = mops.ParametricOp(
        {"op": "tc", "out": 32, "kernel": 4, "strides": 2,
         "dilation": 1, "padding": "SAME"},
        input_shape=(64, 64, 16), name="kernel")
    params, state = op.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 16),
                    jnp.float32)
    y_direct, _ = op.apply(params, state, x, train=False)

    old = mops.TC_PS3_MIN_SIZE
    try:
        mops.TC_PS3_MIN_SIZE = 64
        y_ps3, _ = op.apply(params, state, x, train=False)
    finally:
        mops.TC_PS3_MIN_SIZE = old
    # both paths agree (bf16 compute -> loose tolerance), and the
    # lowering is exact in f32 per test_tc_ps3_lowering_exact
    np.testing.assert_allclose(
        np.asarray(y_ps3, np.float32), np.asarray(y_direct, np.float32),
        rtol=0.05, atol=0.05)
