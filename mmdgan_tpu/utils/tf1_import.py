"""Import reference (TF1) checkpoints into mmdgan_tpu parameters.

The reference's variable naming is deterministic from its scoping
(layer_func.py:878, 699, 727-777; graph build under tf.variable_scope):

    {net}/{layer}/kernel/kernel            dense/conv/tc weights
    {net}/{layer}/kernel/SN/in_rand        spectral-norm power vector
    {net}/{layer}/bias/bias                bias
    {net}/{layer}/BN/BN/{gamma,beta,moving_mean,moving_variance}
    (res blocks: kernel_0/kernel, bias_0/bias, BN_0/BN/..., kernel_sc/...)

Layout conversions handled here:

- transpose-conv kernels: TF ``conv2d_transpose`` stores [k, k, out, in]
  and computes the *adjoint* (spatially flipped) conv; our
  ``lax.conv_transpose`` (HWIO, no kernel transpose) needs
  ``transpose(w, (0, 1, 3, 2))[::-1, ::-1]`` — verified numerically
  against tf.nn.conv2d_transpose.
- NCHW checkpoints (the reference default, misc_fun.py:50): dense kernels
  adjacent to image reshapes get feature-order permutations (the
  reference flattens C-major, we flatten H-major), and SN power vectors
  for conv ops are [1, C, H, W] -> [1, H, W, C].
- NHWC checkpoints import without permutations.

Cross-validated end-to-end against the reference's own graph builder run
under tf.compat.v1 (tests/test_tf1_crossval.py): generator/discriminator
outputs match to float tolerance.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _col_perm_chw_to_hwc(c: int, h: int, w: int) -> np.ndarray:
    """perm[j_ours] = j_ref for flat features: ours (h, w, c) row-major,
    reference (c, h, w) row-major."""
    idx = np.arange(c * h * w).reshape(c, h, w)      # ref layout
    return idx.transpose(1, 2, 0).reshape(-1)        # ours order -> ref index


def _map_tc_kernel(w_tf: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(w_tf, (0, 1, 3, 2))[::-1, ::-1])


class TF1CheckpointImporter:
    """Map a {tf_name: array} dict onto (params, state) of one Routine.

    :param routine: our built Routine (model.Gen or model.Dis)
    :param data_format: layout of the source checkpoint,
        'NCHW' (reference default) or 'NHWC'
    """

    def __init__(self, routine, data_format: str = "NCHW"):
        self.routine = routine
        self.nchw = data_format in ("NCHW", "channels_first")

    # ------------------------------------------------------------------
    def _get(self, variables, name):
        if name not in variables:
            raise KeyError(
                f"checkpoint variable '{name}' not found; available near "
                f"miss: {[v for v in variables if name.split('/')[1] in v][:6]}")
        return np.asarray(variables[name])

    def _dense_kernel(self, variables, name, layer, prev_layer):
        w = self._get(variables, name)
        if self.nchw:
            # rows: flattened image features, either from the previous
            # layer's flattening out_reshape or this layer's in_reshape
            if (prev_layer is not None
                    and prev_layer.design.get("out_reshape") is not None
                    and len(prev_layer.design["out_reshape"]) == 1
                    and len(prev_layer.pre_out_reshape_shape) == 3):
                h, wd, c = prev_layer.pre_out_reshape_shape
                w = w[_col_perm_chw_to_hwc(c, h, wd), :]
            elif (layer.design.get("in_reshape") is not None
                    and len(layer.design["in_reshape"]) == 1
                    and layer.input_shape is not None
                    and len(layer.input_shape) == 3):
                h, wd, c = layer.input_shape
                w = w[_col_perm_chw_to_hwc(c, h, wd), :]
            # cols: output reshaped to an image by this layer
            if (layer.design.get("out_reshape") is not None
                    and len(layer.design["out_reshape"]) == 3):
                c, h, wd = layer.design["out_reshape"]
                w = w[:, _col_perm_chw_to_hwc(c, h, wd)]
        return w

    def _sn_vector(self, variables, name, our_shape):
        x = self._get(variables, name)
        if self.nchw and x.ndim == 4:
            x = np.transpose(x, (0, 2, 3, 1))  # [1,C,H,W] -> [1,H,W,C]
        if tuple(x.shape) != tuple(our_shape):
            raise ValueError(
                f"SN vector {name}: ckpt shape {x.shape} vs ours {our_shape}")
        return x

    # ------------------------------------------------------------------
    def apply(self, params: Dict, state: Dict, variables: Dict[str, np.ndarray]):
        """Returns (new_params, new_state) with checkpoint values filled in.

        Every parameter of the routine must be found in ``variables``
        (strict); SN vectors and BN statistics are imported into state.
        """
        import jax.numpy as jnp

        new_params = {k: dict(v) for k, v in params.items()}
        new_state = {k: dict(v) for k, v in state.items()}
        layers = [self.routine.net.layers[i] for i in self.routine.layer_indices]
        for li, layer in enumerate(layers):
            scope = layer.layer_scope
            prev_layer = layers[li - 1] if li > 0 else None
            for op_name, op in layer.ops.items():
                if not hasattr(op, "design"):
                    continue  # ImageScaling
                d = op.design
                base = f"{scope}/{op_name}"
                p = dict(new_params.get(scope, {}).get(op_name, {}))
                s = dict(new_state.get(scope, {}).get(op_name, {}))
                if d["op"] == "d":
                    p["kernel"] = jnp.asarray(self._dense_kernel(
                        variables, f"{base}/kernel", layer, prev_layer))
                elif d["op"] == "c":
                    p["kernel"] = jnp.asarray(self._get(variables, f"{base}/kernel"))
                elif d["op"] == "tc":
                    p["kernel"] = jnp.asarray(_map_tc_kernel(
                        self._get(variables, f"{base}/kernel")))
                elif d["op"] == "k":
                    p["kernel"] = jnp.asarray(self._get(variables, f"{base}/kernel"))
                elif d["op"] in ("b", "bias"):
                    b = self._get(variables, f"{base}/bias")
                    # a flat bias applied just before this layer's image
                    # out_reshape lives in the reference's C-major feature
                    # order; permute to our H-major order (same rule as
                    # dense kernel columns)
                    if (self.nchw and b.ndim == 1
                            and layer.design.get("out_reshape") is not None
                            and len(layer.design["out_reshape"]) == 3):
                        c, h, wd = layer.design["out_reshape"]
                        if b.shape[0] == c * h * wd:
                            b = b[_col_perm_chw_to_hwc(c, h, wd)]
                    p["bias"] = jnp.asarray(b)
                elif d["op"] in ("bn",):
                    bn = f"{base}/BN"
                    if "gamma" in p:
                        p["gamma"] = jnp.asarray(self._get(variables, f"{bn}/gamma"))
                    if "beta" in p:
                        p["beta"] = jnp.asarray(self._get(variables, f"{bn}/beta"))
                    s["moving_mean"] = jnp.asarray(
                        self._get(variables, f"{bn}/moving_mean"))
                    s["moving_var"] = jnp.asarray(
                        self._get(variables, f"{bn}/moving_variance"))
                elif d["op"] == "project":
                    w = self._get(variables, f"{base}/kernel")
                    if self.nchw:
                        # columns index flattened image features when the
                        # projected input came from a flatten (rare; same
                        # rule as dense rows)
                        if (prev_layer is not None
                                and prev_layer.design.get("out_reshape") is not None
                                and len(prev_layer.design["out_reshape"]) == 1
                                and len(prev_layer.pre_out_reshape_shape) == 3):
                            h, wd, c = prev_layer.pre_out_reshape_shape
                            w = w[:, _col_perm_chw_to_hwc(c, h, wd)]
                    p["kernel"] = jnp.asarray(w)
                elif d["op"] == "cbn":
                    scale = self._get(variables, f"{base}/scale")
                    offset = self._get(variables, f"{base}/offset")
                    if self.nchw:  # [num_class, C, 1, 1] -> [num_class, 1, 1, C]
                        scale = np.transpose(scale, (0, 2, 3, 1))
                        offset = np.transpose(offset, (0, 2, 3, 1))
                    p["scale"] = jnp.asarray(scale)
                    p["offset"] = jnp.asarray(offset)
                    s["moving_mean"] = jnp.asarray(
                        self._get(variables, f"{base}/BN/moving_mean"))
                    s["moving_var"] = jnp.asarray(
                        self._get(variables, f"{base}/BN/moving_variance"))
                elif d["op"] in ("c_bias", "cb"):
                    cb = self._get(variables, f"{base}/c_bias")
                    if self.nchw and cb.ndim == 4:
                        cb = np.transpose(cb, (0, 2, 3, 1))
                    p["c_bias"] = jnp.asarray(cb)
                elif d["op"] == "bcb":
                    p["bias"] = jnp.asarray(self._get(variables, f"{base}/bias"))
                    cb = self._get(variables, f"{base}/c_bias")
                    if self.nchw and cb.ndim == 4:
                        cb = np.transpose(cb, (0, 2, 3, 1))
                    p["c_bias"] = jnp.asarray(cb)
                elif d["op"] == "dcd":
                    p["kernel"] = jnp.asarray(self._dense_kernel(
                        variables, f"{base}/kernel", layer, prev_layer))
                    p["c_kernel"] = jnp.asarray(
                        self._get(variables, f"{base}/c_kernel"))
                elif d["op"] == "dck":
                    p["kernel"] = jnp.asarray(self._dense_kernel(
                        variables, f"{base}/kernel", layer, prev_layer))
                    p["c_kernel"] = jnp.asarray(
                        self._get(variables, f"{base}/c_kernel"))
                elif d["op"] == "sc":
                    p["depthwise_kernel"] = jnp.asarray(
                        self._get(variables, f"{base}/depthwise_kernel"))
                    p["pointwise_kernel"] = jnp.asarray(
                        self._get(variables, f"{base}/pointwise_kernel"))
                elif d["op"] in ("i", "max", "avg", "sum"):
                    pass  # no parameters
                elif d["op"] in ("cck", "tcck"):
                    w = self._get(variables, f"{base}/kernel")
                    if d["op"] == "tcck":
                        w = _map_tc_kernel(w)
                    ck = self._get(variables, f"{base}/c_kernel")
                    if self.nchw and ck.ndim == 4:
                        ck = np.transpose(ck, (0, 2, 3, 1))
                    p["kernel"] = jnp.asarray(w)
                    p["c_kernel"] = jnp.asarray(ck)
                else:
                    raise NotImplementedError(
                        f"TF1 import for op '{d['op']}' ({base}) not supported")
                if "sn_x" in s:
                    sn_name = f"{base}/SN/in_rand"
                    if sn_name in variables:
                        s["sn_x"] = jnp.asarray(self._sn_vector(
                            variables, sn_name, s["sn_x"].shape))
                    # else: the reference hit a closed-form sigma shortcut
                    # (math_func.py:700-721) and created no power vector;
                    # ours is vestigial in that case too (closed form wins
                    # in spectral_norm_apply) — keep the local init.
                if p:
                    new_params.setdefault(scope, {})[op_name] = p
                if s:
                    new_state.setdefault(scope, {})[op_name] = s
        return new_params, new_state


def load_tf1_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read all variables of a TF1 checkpoint file into a dict."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


def import_reference_checkpoint(
    model,
    params: Dict,
    state: Dict,
    ckpt_path_or_vars,
    data_format: str = "NCHW",
):
    """Import a reference SNGan checkpoint into (params, state).

    :param model: our SNGan (architecture must match the checkpoint's)
    :param ckpt_path_or_vars: checkpoint path or a {name: array} dict
    """
    variables = (
        ckpt_path_or_vars if isinstance(ckpt_path_or_vars, dict)
        else load_tf1_checkpoint(ckpt_path_or_vars)
    )
    gen_imp = TF1CheckpointImporter(model.Gen, data_format)
    dis_imp = TF1CheckpointImporter(model.Dis, data_format)
    pg, sg = gen_imp.apply(params["gen"], state["gen"], variables)
    pd, sd = dis_imp.apply(params["dis"], state["dis"], variables)
    return {"gen": pg, "dis": pd}, {"gen": sg, "dis": sd}
