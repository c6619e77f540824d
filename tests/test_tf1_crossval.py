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
