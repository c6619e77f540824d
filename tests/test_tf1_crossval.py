"""Cross-framework validation: the REFERENCE's own graph builder (run
read-only under tf.compat.v1 in a subprocess) vs our builder with imported
weights — generator and discriminator outputs must match numerically.

This validates, end to end: variable-name mapping, conv/transpose-conv
kernel layout conversion, BN inference semantics, SN power-vector import
and sigma computation, activation parity (lrelu 0.1, act_k multiplier),
and the NCHW->NHWC feature permutations across reshape boundaries.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


def dump(mode, tmp_path):
    out = str(tmp_path / f"ref_{mode}.npz")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dump_reference_model.py"),
         "--mode", mode, "--out", out],
        capture_output=True, text=True, timeout=300,
    )
    if res.returncode != 0:
        pytest.skip(f"reference dump failed: {res.stderr[-500:]}")
    data = np.load(out, allow_pickle=False)
    variables = {k[4:]: data[k] for k in data.files if k.startswith("var:")}
    return data, variables


def build_ours(mode):
    from mmdgan_tpu.models.network import Net, Routine

    if mode == "nhwc_conv":
        gen_design = [
            {"name": "l1", "out": 8 * 4 * 4, "op": "d", "act": "linear",
             "act_nm": None, "out_reshape": [8, 4, 4]},   # (C,H,W) spec
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
        code, img = 16, [2, 8, 8]
    else:
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
        code, img = 16, [2, 4, 4]

    def make(design, name, input_spec):
        net = Net(design, net_name=name, compute_dtype=jnp.float32)
        r = Routine(net)
        r.add_input_layers(input_spec, [0])
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
        return r

    gen = make(gen_design, "gen", [code])
    dis = make(dis_design, "dis", img)
    return gen, dis


@pytest.mark.parametrize("mode,data_format", [
    ("nhwc_conv", "NHWC"),
    ("nchw_dense", "NCHW"),
])
def test_outputs_match_reference(tmp_path, key, mode, data_format):
    from mmdgan_tpu.utils.tf1_import import TF1CheckpointImporter

    data, variables = dump(mode, tmp_path)
    gen, dis = build_ours(mode)
    pg, sg = gen.init(key)
    pd, sd = dis.init(jax.random.fold_in(key, 1))
    pg, sg = TF1CheckpointImporter(gen, data_format).apply(pg, sg, variables)
    pd, sd = TF1CheckpointImporter(dis, data_format).apply(pd, sd, variables)

    z = jnp.asarray(data["__z__"])
    x = np.asarray(data["__x__"])
    ref_gen = np.asarray(data["__gen_out__"])
    ref_dis = np.asarray(data["__dis_out__"])
    if data_format == "NCHW":
        x = np.transpose(x, (0, 2, 3, 1))
        ref_gen = np.transpose(ref_gen, (0, 2, 3, 1))

    out_g, _ = gen.apply(pg, sg, {"x": z}, train=False)
    out_d, _ = dis.apply(pd, sd, {"x": jnp.asarray(x)}, train=False)

    np.testing.assert_allclose(
        np.asarray(out_g["x"]), ref_gen, rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out_d["x"]), ref_dis, rtol=1e-4, atol=5e-5)


def test_full_cifar_architecture_matches_reference(tmp_path, key):
    """The COMPLETE my_test_cifar.py architecture: reference graph builder
    vs ours with imported weights — G and D outputs must match."""
    from mmdgan_tpu.models.network import Net, Routine
    from mmdgan_tpu.utils.tf1_import import TF1CheckpointImporter
    from experiments.architectures import cifar_architecture

    data, variables = dump("cifar_nhwc", tmp_path)
    arch = cifar_architecture()

    def make(design, name, input_spec):
        net = Net(design, net_name=name, compute_dtype=jnp.float32)
        r = Routine(net)
        r.add_input_layers(input_spec, [0])
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
        return r

    gen = make(arch["generator"], "gen", [128])
    dis = make(arch["discriminator"], "dis", [3, 32, 32])
    pg, sg = gen.init(key)
    pd, sd = dis.init(jax.random.fold_in(key, 1))
    pg, sg = TF1CheckpointImporter(gen, "NHWC").apply(pg, sg, variables)
    pd, sd = TF1CheckpointImporter(dis, "NHWC").apply(pd, sd, variables)

    z = jnp.asarray(data["__z__"])
    x = jnp.asarray(data["__x__"])
    out_g, _ = gen.apply(pg, sg, {"x": z}, train=False)
    out_d, _ = dis.apply(pd, sd, {"x": x}, train=False)
    # atol 1e-3: with every variable randomized (incl. small
    # moving_variance) TF-vs-XLA conv reduction order differences
    # accumulate to ~6e-4 through the 8-layer float32 net
    np.testing.assert_allclose(
        np.asarray(out_g["x"]), data["__gen_out__"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_d["x"]), data["__dis_out__"], rtol=1e-3, atol=1e-3)


def test_losses_match_reference_code(tmp_path):
    """Our loss/kernel functions vs the REFERENCE's math_func code executed
    under tf.compat.v1 — value parity on fixed scores."""
    out = str(tmp_path / "ref_losses.npz")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dump_reference_losses.py"),
         "--out", out], capture_output=True, text=True, timeout=300)
    if res.returncode != 0:
        pytest.skip(f"reference loss dump failed: {res.stderr[-400:]}")
    data = np.load(out)
    s_gen = jnp.asarray(data["__s_gen__"])
    s_x = jnp.asarray(data["__s_x__"])
    b, d = s_gen.shape

    from mmdgan_tpu.ops.distance import get_squared_dist
    from mmdgan_tpu.ops import kernels as K
    from mmdgan_tpu.ops.losses import GANLoss

    def close(ref, got, name, rtol=2e-4, atol=2e-5):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=rtol, atol=atol,
            err_msg=name)

    # dispatcher losses
    for loss_type in ["logistic", "hinge", "rep", "rmb", "mmd_g", "mmd_t", "mgb"]:
        lg, ld, _, _ = GANLoss().apply(s_gen, s_x, loss_type, batch_size=b, d=d)
        close(data[f"loss:{loss_type}:gen"], lg, f"{loss_type}:gen")
        close(data[f"loss:{loss_type}:dis"], ld, f"{loss_type}:dis")
    for loss_type in ["rand_g", "rgb"]:
        lg, ld, _, _ = GANLoss(omega_range=0.45).apply(
            s_gen, s_x, loss_type, batch_size=b, d=d)
        close(data[f"loss:{loss_type}:gen"], lg, f"{loss_type}:gen", rtol=1e-3)
        close(data[f"loss:{loss_type}:dis"], ld, f"{loss_type}:dis", rtol=1e-3)

    # kernel-level functions
    dxx, dxy, dyy = get_squared_dist(s_gen, s_x, mode="xxxyyy")
    close(data["fn:mmd_g_s2"], K.mmd_g(dxx, dxy, dyy, b, sigma=2.0), "mmd_g_s2")
    m1, m2 = K.mmd_g(dxx, dxy, dyy, b, sigma=1.0, custom_weights=[0.0, -1.0])
    close(data["fn:rep1"], m1, "rep1")
    close(data["fn:rep2"], m2, "rep2")
    b1, b2 = K.mmd_g_bounded(dxx, dxy, dyy, b, sigma=1.0, lower_bound=0.25,
                             upper_bound=4.0, custom_weights=[0.0, -1.0])
    close(data["fn:rmb1"], b1, "rmb1")
    close(data["fn:rmb2"], b2, "rmb2")
    close(data["fn:mmd_t"], K.mmd_t(dxx, dxy, dyy, b, alpha=0.7, beta=2.0), "mmd_t")
    close(data["fn:cramer"], K.cramer(dxx, dxy, dyy, b), "cramer")
    close(data["fn:witness_g"], K.witness_g(dxy, dyy, sigma=1.5), "witness_g")
    close(data["fn:witness_t"], K.witness_t(dxy, dyy, alpha=0.8, beta=2.0),
          "witness_t")
    close(data["fn:rand_xy"],
          K.rand_mmd_g_xy(dxx, dxy, dyy, b, omega=0.4, max_iter=3),
          "rand_xy", rtol=1e-3)
    r1, r2 = K.rand_mmd_g_xy_bounded(dxx, dxy, dyy, b, omega=0.4, max_iter=3)
    close(data["fn:rand_xy_b1"], r1, "rand_xy_b1", rtol=1e-3)
    close(data["fn:rand_xy_b2"], r2, "rand_xy_b2", rtol=1e-3)
    close(data["fn:rand_xn"],
          K.rand_mmd_g_xn(s_gen, 1.0, b, d, omega=0.4, max_iter=3),
          "rand_xn", rtol=1e-3)
    dall = get_squared_dist(jnp.concatenate([s_gen, s_x]), mode="xx")
    close(data["fn:rand_all"], K.rand_mmd_g(dall, b, omega=0.4, max_iter=3),
          "rand_all", rtol=1e-3)


def test_loss_gradients_match_reference_code(tmp_path):
    """d(loss_gen + 0.5*loss_dis)/d scores: reference tf.gradients vs
    jax.grad — validates clamp subgradients and bounded-kernel gating."""
    out = str(tmp_path / "ref_losses.npz")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dump_reference_losses.py"),
         "--out", out], capture_output=True, text=True, timeout=300)
    if res.returncode != 0:
        pytest.skip(f"reference loss dump failed: {res.stderr[-400:]}")
    data = np.load(out)
    s_gen = jnp.asarray(data["__s_gen__"])
    s_x = jnp.asarray(data["__s_x__"])
    b, d = s_gen.shape
    from mmdgan_tpu.ops.losses import GANLoss

    for loss_type in ["rep", "rmb", "mmd_g", "rand_g"]:
        hp = GANLoss(omega_range=0.45) if loss_type == "rand_g" else GANLoss()

        def f(sg, sx):
            lg, ld, _, _ = hp.apply(sg, sx, loss_type, batch_size=b, d=d)
            return lg + 0.5 * ld

        g_gen, g_x = jax.grad(f, argnums=(0, 1))(s_gen, s_x)
        np.testing.assert_allclose(
            np.asarray(g_gen), data[f"grad:{loss_type}:gen"],
            rtol=1e-3, atol=1e-5, err_msg=f"{loss_type}:gen")
        np.testing.assert_allclose(
            np.asarray(g_x), data[f"grad:{loss_type}:x"],
            rtol=1e-3, atol=1e-5, err_msg=f"{loss_type}:x")


def test_conditional_ops_match_reference(tmp_path, key):
    """Conditional capability surface: cbn generator, cck/dck layers and a
    projection discriminator — reference graph vs ours with imported
    weights (all variables randomized in the dump)."""
    from mmdgan_tpu.models.network import Net, Routine
    from mmdgan_tpu.utils.tf1_import import TF1CheckpointImporter

    data, variables = dump("cond_nhwc", tmp_path)
    gen_design = [
        {"name": "l1", "out": 2 * 4 * 4, "op": "d", "act": "linear",
         "act_nm": None, "out_reshape": [2, 4, 4]},
        {"name": "l2", "out": 4, "op": "tc", "act": "relu",
         "act_nm": "cbn", "kernel": 4, "strides": 2},
        {"name": "l3", "out": 2, "op": "cck", "act": "tanh", "kernel": 3,
         "strides": 1},
    ]
    dis_design = [
        {"name": "l1", "out": 8, "op": "c", "act": "lrelu", "act_k": 1.3,
         "w_nm": "s", "kernel": 3, "strides": 2, "out_reshape": [4 * 4 * 8]},
        {"name": "l2", "out": 4, "op": "dck", "act": "lrelu",
         "w_nm": "s", "act_k": 1.0},
        {"name": "l3", "out": 1, "op": "d", "type": "project",
         "w_nm": "s", "act_k": 1.0},
    ]

    def make(design, name, input_spec):
        net = Net(design, net_name=name, num_class=3, compute_dtype=jnp.float32)
        r = Routine(net)
        r.add_input_layers(input_spec, [0])
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
        return r

    gen = make(gen_design, "gen", [16])
    dis = make(dis_design, "dis", [2, 8, 8])
    pg, sg = gen.init(key)
    pd, sd = dis.init(jax.random.fold_in(key, 1))
    pg, sg = TF1CheckpointImporter(gen, "NHWC").apply(pg, sg, variables)
    pd, sd = TF1CheckpointImporter(dis, "NHWC").apply(pd, sd, variables)

    z = jnp.asarray(data["__z__"])
    x = jnp.asarray(data["__x__"])
    y = jnp.asarray(data["__y__"])
    out_g, _ = gen.apply(pg, sg, {"x": z, "y": y}, train=False)
    out_d, _ = dis.apply(pd, sd, {"x": x, "y": y}, train=False)
    np.testing.assert_allclose(
        np.asarray(out_g["x"]), data["__gen_out__"], rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out_d["x"]), data["__dis_out__"], rtol=1e-4, atol=5e-5)


def test_res_and_nonlocal_blocks_match_reference(tmp_path, key):
    """Residual generator block + non-local (SAGAN attention) pooled
    discriminator block — reference graph vs ours with imported weights,
    all variables randomized."""
    from mmdgan_tpu.models.network import Net, Routine
    from mmdgan_tpu.utils.tf1_import import TF1CheckpointImporter

    data, variables = dump("resnl_nhwc", tmp_path)
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

    def make(design, name, input_spec):
        net = Net(design, net_name=name, compute_dtype=jnp.float32)
        r = Routine(net)
        r.add_input_layers(input_spec, [0])
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
        return r

    gen = make(gen_design, "gen", [16])
    dis = make(dis_design, "dis", [2, 8, 8])
    pg, sg = gen.init(key)
    pd, sd = dis.init(jax.random.fold_in(key, 1))
    pg, sg = TF1CheckpointImporter(gen, "NHWC").apply(pg, sg, variables)
    pd, sd = TF1CheckpointImporter(dis, "NHWC").apply(pd, sd, variables)

    z = jnp.asarray(data["__z__"])
    x = jnp.asarray(data["__x__"])
    out_g, _ = gen.apply(pg, sg, {"x": z, "y": None}, train=False)
    out_d, _ = dis.apply(pd, sd, {"x": x, "y": None}, train=False)
    np.testing.assert_allclose(
        np.asarray(out_g["x"]), data["__gen_out__"], rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out_d["x"]), data["__dis_out__"], rtol=1e-4, atol=5e-5)


def test_misc_ops_match_reference(tmp_path, key):
    """The remaining op catalogue: dcd, lrn, conditional biases (cb/bcb),
    separable conv, sum-pool — reference graph vs ours with imported
    weights, all variables randomized. (tcck is omitted: the reference
    lists it but its _get_shape_ never implements it — layer_func.py:685
    raises — so tcck is unusable in the reference as shipped.)"""
    from mmdgan_tpu.models.network import Net, Routine
    from mmdgan_tpu.utils.tf1_import import TF1CheckpointImporter

    data, variables = dump("misc_nhwc", tmp_path)
    gen_design = [
        {"name": "l1", "op": "dcd", "out": 4 * 4 * 4, "act": "linear",
         "act_nm": None, "out_reshape": [4, 4, 4]},
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

    def make(design, name, input_spec):
        net = Net(design, net_name=name, num_class=3,
                  compute_dtype=jnp.float32)
        r = Routine(net)
        r.add_input_layers(input_spec, [0])
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
        return r

    gen = make(gen_design, "gen", [16])
    dis = make(dis_design, "dis", [2, 8, 8])
    pg, sg = gen.init(key)
    pd, sd = dis.init(jax.random.fold_in(key, 1))
    pg, sg = TF1CheckpointImporter(gen, "NHWC").apply(pg, sg, variables)
    pd, sd = TF1CheckpointImporter(dis, "NHWC").apply(pd, sd, variables)

    z = jnp.asarray(data["__z__"])
    x = jnp.asarray(data["__x__"])
    y = jnp.asarray(data["__y__"])
    out_g, _ = gen.apply(pg, sg, {"x": z, "y": y}, train=False)
    out_d, _ = dis.apply(pd, sd, {"x": x, "y": y}, train=False)
    np.testing.assert_allclose(
        np.asarray(out_g["x"]), data["__gen_out__"], rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out_d["x"]), data["__dis_out__"], rtol=1e-4, atol=5e-5)
