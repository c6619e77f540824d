"""Layer: composes ParametricOps into blocks (default / resnet / non-local).

Functional JAX rebuild of ``update_layer_design`` + ``Layer``
(``GeneralTools/layer_func.py:1189-2108``). A Layer is compiled once from
its design dict (static shape inference in NHWC), then exposes
``init(key) -> (params, state)`` and
``apply(params, state, {'x': x, 'y': y}, train) -> (out, new_state)``.

Block types (layer_func.py:2060-2068):
  'default' / 'project' / 'c_bias':
      upsampling - kernel - bias - BN - act - downsampling
      (+ label-projection head for 'project', layer_func.py:1611-1685)
  'res' / 'res_i' / 'res_v1': two-conv residual block with configurable
      shortcut (layer_func.py:1687-1842)
  'nl', 'nl_dist', 'nl_pool', 'nl_pool_dist': SAGAN-style self-attention
      with dot-product or distance logits (layer_func.py:1844-2041)

Reshape specs in architecture dicts follow the reference's channels-first
convention ([C, H, W]); they are converted to NHWC here. Feature ordering
inside a flat reshape differs from the reference (C-major vs H-major) —
irrelevant for training from scratch, noted for weight-porting.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.models.ops import ParametricOp
from mmdgan_tpu.models.scaling import ImageScaling
from mmdgan_tpu.ops.distance import get_batch_squared_dist

Array = jnp.ndarray


def update_layer_design(layer_design: dict) -> dict:
    """Normalize a layer design dict against the template
    (layer_func.py:1189-1275)."""
    template = {
        "name": None, "type": "default", "op": "c", "out": None, "bias": "b",
        "act": "linear", "act_nm": None, "act_k": False,
        "w_nm": None, "w_p": None,
        "kernel": 3, "strides": 1, "dilation": 1, "padding": "SAME", "scale": None,
        "in_reshape": None, "out_reshape": None, "aux": None,
    }
    template.update(layer_design)
    # batch norm replaces plain bias (layer_func.py:1241-1244)
    if template["act_nm"] in ("bn", "BN") and template["bias"] in ("b", "bias"):
        template["bias"] = None
    if template["act_nm"] in ("cbn", "CBN"):
        template["bias"] = None
    if template["op"] in ("tc",):  # tc is itself the upsampler
        template["scale"] = None
    if template["scale"] is not None:
        assert isinstance(template["scale"], (list, tuple)), \
            'Value for key "scale" must be list or tuple.'
    if template["w_nm"] is not None:
        assert not isinstance(template["w_nm"], (list, tuple)), \
            'Value for key "w_nm" must not be list or tuple.'

    if template["op"] in ("d", "dcd", "dck"):
        keys = ["name", "op", "type", "out", "bias", "act", "act_nm", "act_k",
                "w_nm", "w_p", "in_reshape", "out_reshape", "aux"]
    elif template["op"] in ("sc", "c", "tc", "avg", "max", "sum", "cck", "tcck"):
        keys = ["name", "op", "type", "out", "bias", "act", "act_nm", "act_k",
                "w_nm", "w_p", "kernel", "strides", "dilation", "padding", "scale",
                "in_reshape", "out_reshape", "aux"]
    elif template["op"] in ("i",):
        keys = ["name", "op", "act", "act_nm", "type", "in_reshape", "out_reshape"]
    else:
        raise ValueError("layer op {} not supported.".format(template["op"]))
    return {k: template[k] for k in keys}


def _nhwc_shape(shape: Sequence[int]) -> Tuple[int, ...]:
    """Convert a reference channels-first spec [C, H, W] to NHWC (H, W, C)."""
    if len(shape) == 3:
        c, h, w = shape
        return (h, w, c)
    return tuple(shape)


ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "crelu": lambda x: jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1),
    "elu": jax.nn.elu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def apply_activation(x: Array, act: str) -> Array:
    try:
        return ACTIVATIONS[act](x)
    except KeyError:
        raise NotImplementedError(f"Activation {act} is not implemented.")


class Layer:
    def __init__(
        self,
        design: dict,
        input_shape: Optional[Sequence[int]] = None,
        name_prefix: str = "",
        num_class: int = 0,
        init_mode: str = "default",
        sn_mode: str = "pico",
        compute_dtype=jnp.bfloat16,
    ):
        self.design = design
        self.layer_scope = name_prefix + design["name"]
        self.input_shape = None if input_shape is None else tuple(input_shape)
        self.output_shape: Optional[Tuple[int, ...]] = None
        self.num_class = num_class
        self.init_mode = init_mode
        self.sn_mode = sn_mode
        self.compute_dtype = compute_dtype
        if self.num_class < 2:
            assert design.get("type") not in ("project",), \
                f"{self.layer_scope}: cannot use projection for one class"
            assert design.get("act_nm") not in ("cbn", "CBN"), \
                f"{self.layer_scope}: cannot use cbn for one class"
        self.is_built = False
        self.ops: Dict[str, Union[ParametricOp, ImageScaling]] = {}

    # -- op registration helpers (mirror layer_func.py:1397-1578) --------
    def _sub_design(self, target_keys, index=None, base=None):
        design = dict(base or {})
        for key in target_keys:
            if key in self.design:
                v = self.design[key]
                if index is not None and isinstance(v, (list, tuple)):
                    design[key] = v[index]
                else:
                    design[key] = v
        return design

    def _add_scaling(self, input_shape, name, scale_design=None):
        sd = scale_design if scale_design is not None else self.design["scale"]
        op = ImageScaling(
            {"method": sd[0], "factor": sd[1]}, input_shape,
            name=self.layer_scope + "/" + name,
        )
        self.ops[name] = op
        return op.output_shape

    def _add_kernel(self, input_shape, name, index=None, op_design=None,
                    kernel_out=None, kernel_init_scale=None):
        design = {"op": self.design["op"] if op_design is None else op_design}
        design = self._sub_design(
            {"out", "act", "act_k", "w_nm", "kernel", "strides", "dilation", "padding"},
            index, base=design,
        )
        if design["op"] in ("dcd", "dck", "cck", "tcck"):
            design["num_class"] = self.num_class
        if kernel_init_scale is not None:
            design["init_w_scale"] = kernel_init_scale
        if kernel_out is not None:
            design["out"] = kernel_out
        op = ParametricOp(
            design, input_shape, name=name, scope_prefix=self.layer_scope + "/",
            num_class=self.num_class, init_mode=self.init_mode,
            sn_mode=self.sn_mode, compute_dtype=self.compute_dtype,
        )
        self.ops[name] = op
        return op.output_shape

    def _add_scalar_kernel(self, input_shape, name, init_w_scale=None, bound=None):
        design = {"op": "k"}
        if init_w_scale is not None:
            design["init_w_scale"] = init_w_scale
        if bound is not None:
            design["bound"] = tuple(bound)
        op = ParametricOp(design, input_shape, name=name,
                          scope_prefix=self.layer_scope + "/",
                          compute_dtype=self.compute_dtype)
        self.ops[name] = op
        return op.output_shape

    def _add_projection(self, input_shape, name="project"):
        design = {"op": "project", "num_class": self.num_class, "act": "linear"}
        design = self._sub_design({"act_k", "w_nm"}, base=design)
        op = ParametricOp(design, input_shape, name=name,
                          scope_prefix=self.layer_scope + "/",
                          num_class=self.num_class, init_mode=self.init_mode,
                          sn_mode=self.sn_mode, compute_dtype=self.compute_dtype)
        self.ops[name] = op

    def _add_bias(self, input_shape, name, op_design=None):
        if op_design is None:
            op_design = self.design.get("bias")
        if op_design in ("bias", "b") or op_design is None:
            design = {"op": "bias"}
        elif op_design in ("cb", "c_bias"):
            design = {"op": "c_bias", "num_class": self.num_class}
        elif op_design in ("bcb",):
            design = {"op": "bcb", "num_class": self.num_class}
        elif op_design is False:
            return input_shape
        else:
            raise NotImplementedError(
                f"{self.layer_scope}: bias option {op_design} not implemented.")
        op = ParametricOp(design, input_shape, name=name,
                          scope_prefix=self.layer_scope + "/",
                          num_class=self.num_class,
                          compute_dtype=self.compute_dtype)
        self.ops[name] = op
        return op.output_shape

    def _add_bn(self, input_shape, name, scale=None):
        if self.design["act_nm"] in ("cbn", "CBN"):
            design = {"op": "cbn", "num_class": self.num_class}
        elif self.design["act_nm"] in ("b", "bn", "BN"):
            design = {"op": "bn"}
        else:
            raise NotImplementedError(
                f"{self.layer_scope}: {self.design['act_nm']} not implemented")
        if scale is not None:
            design["bn_scale"] = scale
        op = ParametricOp(design, input_shape, name=name,
                          scope_prefix=self.layer_scope + "/",
                          num_class=self.num_class,
                          compute_dtype=self.compute_dtype)
        self.ops[name] = op
        return op.output_shape

    def _act(self, x, index=None, act_fun=None):
        if act_fun is None:
            a = self.design["act"]
            act_fun = a if isinstance(a, str) else a[index]
        return apply_activation(x, act_fun)

    # -- block builders ---------------------------------------------------
    def _build_default(self, input_shape):
        # upsampling - kernel - bias - BN - act - downsampling
        if self.design["type"] in ("project",):
            assert len(input_shape) == 1 and self.design["out"] == 1, (
                f"{self.layer_scope}: projection only applies to dense layer "
                "with one output")
            self._add_projection(input_shape, "project")
        if self.design.get("scale") is not None and self.design["scale"][1] > 0:
            input_shape = self._add_scaling(input_shape, "upsampling")
        input_shape = self._add_kernel(input_shape, "kernel")
        if self.design.get("bias") is not None:
            input_shape = self._add_bias(input_shape, "bias")
        if self.design["act_nm"] in ("bn", "BN", "cbn", "CBN"):
            input_shape = self._add_bn(input_shape, "BN")
        if self.design.get("scale") is not None and self.design["scale"][1] < 0:
            input_shape = self._add_scaling(input_shape, "downsampling")
        return input_shape

    def _build_res(self, input_shape):
        # res branch: BN_0 - act - up_0 - kernel_0 - bias_0 - BN_1 - act -
        #             kernel_1 - bias_1 - down_0
        # sc branch:  up_1 - kernel_sc - bias_sc - down_1
        if (self.design["type"] != "res_v1") and self.design["act_nm"] in (
                "bn", "BN", "cbn", "CBN"):
            res_shape = self._add_bn(input_shape, "BN_0")
        else:
            res_shape = input_shape
        if self.design.get("scale") is not None and self.design["scale"][1] > 0:
            res_shape = self._add_scaling(res_shape, "upsampling_0")
        res_shape = self._add_kernel(res_shape, "kernel_0", index=0)
        if self.design.get("bias") is not None:
            res_shape = self._add_bias(res_shape, "bias_0")
        if self.design["act_nm"] in ("bn", "BN", "cbn", "CBN"):
            res_shape = self._add_bn(res_shape, "BN_1")
        if self.design["op"] == "tc":  # second conv in a tc res block is 'c'
            res_shape = self._add_kernel(res_shape, "kernel_1", index=1, op_design="c")
        else:
            res_shape = self._add_kernel(res_shape, "kernel_1", index=1)
        if self.design.get("bias") is not None:
            res_shape = self._add_bias(res_shape, "bias_1")
        if self.design.get("scale") is not None and self.design["scale"][1] < 0:
            res_shape = self._add_scaling(res_shape, "downsampling_0")

        sc_shape = input_shape
        if self.design["type"] == "res":
            if self.design.get("scale") is not None and self.design["scale"][1] > 0:
                sc_shape = self._add_scaling(sc_shape, "upsampling_1")
            sc_shape = self._add_kernel(sc_shape, "kernel_sc", index=2)
            if "bias" in self.design:
                sc_shape = self._add_bias(sc_shape, "bias_sc")
            if self.design.get("scale") is not None and self.design["scale"][1] < 0:
                sc_shape = self._add_scaling(sc_shape, "downsampling_1")
        elif self.design["type"] == "res_v1":
            # wgan-gp first dis block: downsample-then-conv shortcut
            if self.design.get("scale") is not None:
                if self.design["scale"][1] < 0:
                    sc_shape = self._add_scaling(sc_shape, "downsampling_1")
                else:
                    raise ValueError(
                        f"{self.layer_scope}: res_v1 is only used with downsampling.")
            sc_shape = self._add_kernel(sc_shape, "kernel_sc", index=2)
            if "bias" in self.design:
                sc_shape = self._add_bias(sc_shape, "bias_sc")

        assert tuple(sc_shape) == tuple(res_shape), (
            f"{self.layer_scope}: resnet shape {res_shape} and shortcut shape "
            f"{sc_shape} do not match.")
        return sc_shape

    def _build_nonlocal(self, input_shape):
        att_shape = input_shape
        att_shape_f = self._add_kernel(att_shape, "f_x", index=0)
        att_shape_f = self._add_bias(att_shape_f, "bias_f")
        if self.design["type"] in ("nl_pool", "nl_pool_dist"):
            att_shape_gh = self._add_scaling(att_shape, "downsampling", ["max", -2])
        else:
            att_shape_gh = att_shape
        att_shape_g = self._add_kernel(att_shape_gh, "g_x", index=1)
        att_shape_h = self._add_kernel(att_shape_gh, "h_x", index=2)
        # NHWC checks (layer_func.py:1894-1913)
        assert att_shape_f[-1] == att_shape_g[-1], (
            f"{self.layer_scope}: f(x) channel {att_shape_f[-1]} does not match "
            f"g(x) channel {att_shape_g[-1]}")
        assert att_shape_g[:2] == att_shape_h[:2], (
            f"{self.layer_scope}: g(x) size {att_shape_g[:2]} does not match "
            f"h(x) size {att_shape_h[:2]}")
        att_shape = (att_shape_f[0], att_shape_f[1], att_shape_h[2])
        if self.design.get("act_nm") in ("bn", "BN", "cbn", "CBN"):
            att_shape = self._add_bn(att_shape, "BN_1", scale=False)
        bound = [-1.0, 1.0] if self.design["w_nm"] == "s" else None
        att_shape = self._add_scalar_kernel(att_shape, "k_x", init_w_scale=0.0, bound=bound)
        assert tuple(input_shape) == tuple(att_shape), (
            f"{self.layer_scope}: attention map shape {att_shape} does not "
            f"match input shape {input_shape}")
        return att_shape

    def build(self):
        if self.is_built:
            return
        assert self.input_shape is not None, f"{self.layer_scope}: input shape unset"
        if self.design["in_reshape"] is None:
            input_shape = self.input_shape
        else:
            input_shape = _nhwc_shape(self.design["in_reshape"])
        t = self.design["type"]
        if t in ("default", "project", "c_bias"):
            input_shape = self._build_default(input_shape)
        elif t in ("res", "res_i", "res_v1"):
            input_shape = self._build_res(input_shape)
        elif t in ("nl", "nl_dist", "nl_pool", "nl_pool_dist"):
            input_shape = self._build_nonlocal(input_shape)
        else:
            raise NotImplementedError(f"{self.layer_scope}: {t} is not implemented.")
        # pre-reshape block output (used by the TF1 checkpoint importer to
        # compute feature-order permutations across flatten boundaries)
        self.pre_out_reshape_shape = tuple(input_shape)
        if self.design["out_reshape"] is None:
            self.output_shape = tuple(input_shape)
        else:
            self.output_shape = _nhwc_shape(self.design["out_reshape"])
        self.is_built = True

    # alias matching the reference API
    build_layer = build

    # -- init / apply -----------------------------------------------------
    def init(self, key: Array):
        self.build()
        params, state = {}, {}
        pkeys = jax.random.split(key, max(len(self.ops), 1))
        for (name, op), k in zip(self.ops.items(), pkeys):
            if isinstance(op, ImageScaling):
                continue
            p, s = op.init(k)
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    def _op_apply(self, name, params, state, new_state, x, train, label):
        op = self.ops[name]
        if isinstance(op, ImageScaling):
            return op.apply(x)
        y, s = op.apply(params.get(name, {}), state.get(name, {}), x,
                        train=train, label=label)
        if s:
            new_state[name] = s
        return y

    def apply(self, params, state, layer_input, train: bool = True):
        """Returns ({'x': out, 'y': labels}, new_state)."""
        self.build()
        if not isinstance(layer_input, dict):
            layer_input = {"x": layer_input, "y": None}
        x = layer_input["x"]
        label = layer_input.get("y")
        assert x.shape[1:] == tuple(self.input_shape), (
            f"{self.layer_scope}: input shape {x.shape[1:]} does not match "
            f"declared {self.input_shape}")
        if self.design["in_reshape"] is not None:
            x = x.reshape((x.shape[0],) + _nhwc_shape(self.design["in_reshape"]))

        new_state: Dict[str, Dict] = {}
        run = lambda name, v: self._op_apply(name, params, state, new_state, v, train, label)
        t = self.design["type"]

        if t in ("default", "project", "c_bias"):
            y = x
            if "upsampling" in self.ops:
                y = run("upsampling", y)
            y = run("kernel", y)
            if "bias" in self.ops:
                y = run("bias", y)
            if "BN" in self.ops:
                y = run("BN", y)
            y = self._act(y)
            if "downsampling" in self.ops:
                y = run("downsampling", y)
            if "project" in self.ops:
                y = y + run("project", x)
        elif t in ("res", "res_i", "res_v1"):
            res = x
            if t != "res_v1":
                if "BN_0" in self.ops:
                    res = run("BN_0", res)
                res = self._act(res, index=0)
            if "upsampling_0" in self.ops:
                res = run("upsampling_0", res)
            res = run("kernel_0", res)
            if "bias_0" in self.ops:
                res = run("bias_0", res)
            if "BN_1" in self.ops:
                res = run("BN_1", res)
            res = self._act(res, index=1 if isinstance(self.design["act"], (list, tuple)) else None)
            res = run("kernel_1", res)
            if "bias_1" in self.ops:
                res = run("bias_1", res)
            if "downsampling_0" in self.ops:
                res = run("downsampling_0", res)
            sc = x
            if t == "res":
                if "upsampling_1" in self.ops:
                    sc = run("upsampling_1", sc)
                sc = run("kernel_sc", sc)
                if "bias_sc" in self.ops:
                    sc = run("bias_sc", sc)
                if "downsampling_1" in self.ops:
                    sc = run("downsampling_1", sc)
            elif t == "res_v1":
                if "downsampling_1" in self.ops:
                    sc = run("downsampling_1", sc)
                sc = run("kernel_sc", sc)
                if "bias_sc" in self.ops:
                    sc = run("bias_sc", sc)
            y = res + sc
        elif t in ("nl", "nl_dist", "nl_pool", "nl_pool_dist"):
            y = self._apply_nonlocal(run, x)
        else:
            raise NotImplementedError(f"{self.layer_scope}: {t} not implemented")

        if self.design["out_reshape"] is not None:
            y = y.reshape((y.shape[0],) + _nhwc_shape(self.design["out_reshape"]))
        assert y.shape[1:] == tuple(self.output_shape), (
            f"{self.layer_scope}: output shape {y.shape[1:]} does not match "
            f"declared {self.output_shape}")
        out = dict(layer_input)
        out["x"] = y
        return out, new_state

    def _apply_nonlocal(self, run, x):
        """SAGAN-style attention, NHWC (layer_func.py:1934-2041):
            m = softmax(f(x)' g(pool(x)));  o = m h(pool(x));
            y = k * BN(o) + x
        """
        att_f = run("f_x", x)
        att_f = run("bias_f", att_f)
        att_gh = run("downsampling", x) if "downsampling" in self.ops else x
        att_g = run("g_x", att_gh)
        att_h = run("h_x", att_gh)

        n = x.shape[0]
        h1, w1, c2 = att_f.shape[1:]
        h2, w2, _ = att_g.shape[1:]
        c1 = att_h.shape[-1]
        # logits + softmax in f32 (bf16 softmax loses attention contrast);
        # the attention map itself is in [0,1] and is carried back in the
        # activation dtype for the bandwidth-heavy second einsum
        f_flat = att_f.reshape(n, h1 * w1, c2).astype(jnp.float32)
        g_flat = att_g.reshape(n, h2 * w2, c2).astype(jnp.float32)
        if self.design["type"] in ("nl_dist", "nl_pool_dist"):
            dist_fg = get_batch_squared_dist(f_flat, g_flat, axis=2, mode="xy")
            logits = -dist_fg / float(c2)  # N x HW1 x HW2
        else:
            logits = jnp.einsum("npc,nqc->npq", f_flat, g_flat) / np.sqrt(c2)
        att_map = jax.nn.softmax(logits, axis=2).astype(att_h.dtype)
        h_flat = att_h.reshape(n, h2 * w2, c1)
        o = jnp.einsum("npq,nqc->npc", att_map, h_flat)
        o = o.reshape(n, h1, w1, c1)
        if "BN_1" in self.ops:
            o = run("BN_1", o)
        o = run("k_x", o)
        return o + x

    def __call__(self, params, state, layer_input, train=True):
        return self.apply(params, state, layer_input, train)
