"""ParametricOp: one parameterized operation compiled from a design dict.

Functional JAX rebuild of the reference ``ParametricOperation``
(``GeneralTools/layer_func.py:480-1039``). Construction performs full static
shape inference (NHWC); ``init`` creates the parameter/state pytrees;
``apply`` is pure and jit-compatible.

Op catalogue (layer_func.py:488-524):
  'i'   identity                    'k'    trainable scalar multiply
  'd'   dense                       'c'    conv
  'tc'  transpose conv              'sc'   separable conv
  'max' 'avg' 'sum'                 pooling
  'b'/'bias'  bias                  'cb'/'c_bias'  conditional bias
  'bcb' bias + conditional bias     'bn'   batch norm
  'cbn' conditional batch norm      'lrn'  local response normalization
  'project'  label projection       'dcd'  dense + conditional dense
  'dck' dense * (1+cond scale)      'cck'  conv * (1+cond scale)
  'tcck' transpose conv * (1+cond scale)

Spectral normalization (``w_nm='s'``) attaches a PICO power-iteration state
and rescales the kernel by ``act_k / sigma`` at apply time
(layer_func.py:785-892). TPU note: convs/matmuls and inter-op activations
run in ``compute_dtype`` (bf16 by default; the MXU accumulates in f32
internally); parameters, normalizers, BN statistics and routine outputs
stay float32. (Tried and rejected: zero-padding <8-channel image convs
for MXU lane utilization — XLA's algebraic simplifier strips the pads
and reconstitutes the narrow conv, so it has no effect.)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mmdgan_tpu.models.initializers import bias_initializer, weight_initializer
from mmdgan_tpu.ops.spectral_norm import (
    SnDef,
    spectral_norm_apply,
    spectral_norm_init,
    spectral_norm_pim_apply,
    spectral_norm_pim_init,
)

Array = jnp.ndarray
_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# Transposed-conv lowering choice (docs/conv_study.md "tc study"): the
# exact ps3 reformulation of ``tc k=4/s2/SAME`` — ONE 3x3/s1 conv to
# 4*Cout phase channels + depth-to-space — wins every ISOLATED-op
# microbench on image-resolution inputs (H >= 64: up to x1.88 fwd+bwd
# on hd512's 128^2 32->32), yet measured SLOWER end-to-end in the real
# train step (hd512 -7.8%, hd256 -9.9%, hd128 wash; two A/B pairs each,
# round 5): inside the full graph the depth-to-space transpose pins
# layouts that XLA otherwise optimizes across the neighboring ops, and
# the per-step kernel re-embedding + its VJP run inside the scan. The
# measured end-to-end default is therefore DIRECT everywhere
# (threshold = inf); the lowering stays available for A/B
# (set to 64 to re-judge on new hardware/XLA versions — the gate is
# trace-time static, flip it before building the jit).
TC_PS3_MIN_SIZE = float("inf")

# tf.layers.batch_normalization defaults (layer_func.py:960-966)
BN_MOMENTUM = 0.99
BN_EPS = 1e-3

EPSI = 1e-10


def spatial_shape_after_conv(s, kernel, strides, dilation, padding):
    """math_func.py:172-192."""
    if padding in ("same", "SAME"):
        return int(math.ceil(s / strides))
    return int(math.ceil((s - (kernel - 1) * dilation) / strides))


def spatial_shape_after_transpose_conv(s, kernel, strides, dilation, padding):
    """math_func.py:195-216."""
    if padding in ("same", "SAME"):
        return int(s * strides)
    return int(s * strides + (kernel - 1) * dilation)


class ParametricOp:
    def __init__(
        self,
        design: dict,
        input_shape: Sequence[int],
        name: str = "kernel",
        scope_prefix: str = "",
        num_class: int = 0,
        init_mode: str = "default",
        sn_mode: str = "pico",
        compute_dtype=jnp.bfloat16,
    ):
        """:param design: see module docstring; shapes are per-example
        (no batch dim): (F,) for dense data, (H, W, C) for image data."""
        self.design = dict(design)
        self.name = name
        self.name_in_err = scope_prefix + name
        self.input_shape = tuple(int(v) for v in input_shape)
        self.num_class = int(self.design.get("num_class", num_class))
        self.init_mode = init_mode
        self.sn_mode = sn_mode
        self.compute_dtype = compute_dtype
        self._infer_shapes()
        self._setup_spectral_norm()

    # ------------------------------------------------------------------
    # static shape inference (layer_func.py:566-685)
    # ------------------------------------------------------------------
    def _infer_shapes(self):
        d = self.design
        op = d["op"]
        ish = self.input_shape
        if op == "i":
            self.kernel_shape = None
            self.output_shape = ish
        elif op == "k":
            self.kernel_shape = ()
            self.output_shape = ish
        elif op == "d":
            assert len(ish) == 1, f"{self.name_in_err}: dense input must be 1-D, got {ish}"
            self.kernel_shape = (ish[0], d["out"])
            self.output_shape = (d["out"],)
        elif op in ("c", "tc"):
            h, w, fan_in = ish
            k, s, dl, pad = d["kernel"], d["strides"], d["dilation"], d["padding"]
            # HWIO for both; 'tc' uses jax.lax.conv_transpose convention
            self.kernel_shape = (k, k, fan_in, d["out"])
            if op == "c":
                h2 = spatial_shape_after_conv(h, k, s, dl, pad)
                w2 = spatial_shape_after_conv(w, k, s, dl, pad)
            else:
                h2 = spatial_shape_after_transpose_conv(h, k, s, dl, pad)
                w2 = spatial_shape_after_transpose_conv(w, k, s, dl, pad)
            self.output_shape = (h2, w2, d["out"])
        elif op == "cck" or op == "tcck":
            h, w, fan_in = ish
            k, s, dl, pad = d["kernel"], d["strides"], d["dilation"], d["padding"]
            if op == "cck":
                h2 = spatial_shape_after_conv(h, k, s, dl, pad)
                w2 = spatial_shape_after_conv(w, k, s, dl, pad)
            else:
                h2 = spatial_shape_after_transpose_conv(h, k, s, dl, pad)
                w2 = spatial_shape_after_transpose_conv(w, k, s, dl, pad)
            c_shape = (k, k, fan_in, d["out"])
            ck_shape = (self.num_class, 1, 1, d["out"])
            self.kernel_shape = (c_shape, ck_shape)
            self.output_shape = (h2, w2, d["out"])
        elif op == "sc":
            h, w, fan_in = ish
            k, s, dl, pad = d["kernel"], d["strides"], d["dilation"], d["padding"]
            depthwise = (k, k, fan_in, 1)
            pointwise = (1, 1, fan_in, d["out"])
            self.kernel_shape = (depthwise, pointwise)
            h2 = spatial_shape_after_conv(h, k, s, dl, pad)
            w2 = spatial_shape_after_conv(w, k, s, dl, pad)
            self.output_shape = (h2, w2, d["out"])
        elif op in ("max", "avg", "sum"):
            h, w, fan_in = ish
            k, s, dl, pad = d["kernel"], d["strides"], d["dilation"], d["padding"]
            self.kernel_shape = (k,)
            h2 = spatial_shape_after_conv(h, k, s, dl, pad)
            w2 = spatial_shape_after_conv(w, k, s, dl, pad)
            self.output_shape = (h2, w2, d.get("out", fan_in) or fan_in)
        elif op in ("b", "bias"):
            self.kernel_shape = (ish[-1],)
            self.output_shape = ish
        elif op in ("bn", "lrn"):
            self.kernel_shape = None
            self.output_shape = ish
        elif op in ("cbn", "c_bias", "cb"):
            self.output_shape = ish
            if len(ish) == 3:
                self.kernel_shape = (self.num_class, 1, 1, ish[-1])
            else:
                self.kernel_shape = (self.num_class, ish[-1])
        elif op == "bcb":
            if len(ish) == 3:
                cb_shape = (self.num_class, 1, 1, ish[-1])
            else:
                cb_shape = (self.num_class, ish[-1])
            self.kernel_shape = ((ish[-1],), cb_shape)
            self.output_shape = ish
        elif op == "project":
            assert len(ish) == 1
            self.kernel_shape = (self.num_class, ish[0])
            self.output_shape = (1,)
        elif op == "dcd":
            self.kernel_shape = ((ish[0], d["out"]), (self.num_class, ish[0], d["out"]))
            self.output_shape = (d["out"],)
        elif op == "dck":
            self.kernel_shape = ((ish[0], d["out"]), (self.num_class, d["out"]))
            self.output_shape = (d["out"],)
        else:
            raise ValueError(f"{self.name_in_err}: op {op} not supported")

    # ------------------------------------------------------------------
    # spectral norm wiring (layer_func.py:785-826)
    # ------------------------------------------------------------------
    def _setup_spectral_norm(self):
        self.sn_def: Optional[SnDef] = None
        self.use_pim = False
        d = self.design
        if d.get("w_nm") not in ("s",):
            if d.get("w_nm") not in (None, False):
                raise NotImplementedError(
                    f"{self.name_in_err}: w_nm {d.get('w_nm')} not implemented"
                )
            return
        op = d["op"]
        if op in ("d", "project", "dcd", "dck"):
            if op == "project":
                # the projection kernel [num_class, num_in] maps
                # num_in -> num_class as a plain matrix (math_func.py:477-486)
                self.sn_def = SnDef(
                    op="project", input_shape=(self.input_shape[0],),
                    output_shape=(self.num_class,),
                )
            elif op == "dcd":
                # conditional dense family uses [num_class, 1, n] row batches
                self.sn_def = SnDef(
                    op="dcd", input_shape=(1, self.input_shape[0]),
                    output_shape=(1, self.output_shape[0]), num_class=self.num_class,
                )
            else:
                self.sn_def = SnDef(
                    op=op,
                    input_shape=(self.input_shape[0],),
                    output_shape=(self.output_shape[0],),
                    num_class=self.num_class,
                )
        elif op in ("c", "tc", "cck", "tcck"):
            if self.sn_mode in ("default", "pico", "PICO"):
                self.sn_def = SnDef(
                    op=op,
                    input_shape=self.input_shape,
                    output_shape=self.output_shape,
                    strides=d["strides"],
                    dilation=d["dilation"],
                    padding=d["padding"],
                    num_class=self.num_class,
                )
            elif self.sn_mode in ("sn_paper", "pim", "PIM"):
                assert op in ("c", "tc"), (
                    f"{self.name_in_err}: PIM mode only for plain convs"
                )
                self.use_pim = True
            else:
                raise NotImplementedError(f"sn mode {self.sn_mode}")
        else:
            raise NotImplementedError(
                f"{self.name_in_err}: spectral norm for {op} not implemented."
            )

    # ------------------------------------------------------------------
    # parameter / state creation (layer_func.py:709-783)
    # ------------------------------------------------------------------
    def init(self, key: Array) -> Tuple[Dict, Dict]:
        d = self.design
        op = d["op"]
        params: Dict[str, Array] = {}
        state: Dict[str, Array] = {}
        k_w, k_b, k_sn = jax.random.split(key, 3)

        w_init = weight_initializer(
            d.get("act", "linear"),
            1.0 if d.get("init_w_scale") is None else d["init_w_scale"],
            mode=self.init_mode,
        )
        if op in ("d", "c", "tc", "project"):
            params["kernel"] = w_init(k_w, self.kernel_shape, transpose_conv=(op == "tc"))
        elif op == "k":
            params["kernel"] = (
                jnp.zeros(()) if d.get("init_w_scale") == 0.0 else jnp.ones(())
            )
        elif op == "sc":
            kd, kp = jax.random.split(k_w)
            params["depthwise_kernel"] = w_init(kd, self.kernel_shape[0])
            params["pointwise_kernel"] = w_init(kp, self.kernel_shape[1])
        elif op in ("b", "bias"):
            # tiny non-zero bias init (layer_func.py:741-747)
            params["bias"] = bias_initializer(1e-5)(k_b, self.kernel_shape)
        elif op in ("c_bias", "cb"):
            params["c_bias"] = bias_initializer(1e-5)(k_b, self.kernel_shape)
        elif op == "bcb":
            params["bias"] = bias_initializer(1e-5)(k_b, self.kernel_shape[0])
            params["c_bias"] = jnp.zeros(self.kernel_shape[1])
        elif op == "bn":
            c = self.input_shape[-1]
            if d.get("bn_scale", True):
                params["gamma"] = jnp.ones((c,))
            if d.get("bn_center", True):
                params["beta"] = jnp.zeros((c,))
            state["moving_mean"] = jnp.zeros((c,))
            state["moving_var"] = jnp.ones((c,))
        elif op == "cbn":
            c = self.input_shape[-1]
            params["scale"] = jnp.ones(self.kernel_shape)
            params["offset"] = bias_initializer(1e-5)(k_b, self.kernel_shape)
            state["moving_mean"] = jnp.zeros((c,))
            state["moving_var"] = jnp.ones((c,))
        elif op in ("dcd", "dck", "cck", "tcck"):
            params["kernel"] = w_init(
                k_w, self.kernel_shape[0], transpose_conv=(op == "tcck")
            )
            params["c_kernel"] = jnp.zeros(self.kernel_shape[1])
        elif op in ("i", "max", "avg", "sum", "lrn"):
            pass
        else:
            raise ValueError(f"{self.name_in_err}: op {op} not supported")

        if self.sn_def is not None:
            state["sn_x"] = spectral_norm_init(k_sn, self.sn_def)
        elif self.use_pim:
            state["sn_x"] = spectral_norm_pim_init(k_sn, self.kernel_shape)
        return params, state

    # ------------------------------------------------------------------
    # runtime multiplier act_k / sigma (layer_func.py:827-892)
    # ------------------------------------------------------------------
    def _kernel_norm(self, params, state):
        """Returns (sigma, new_sn_state) or (None, None)."""
        if self.sn_def is None and not self.use_pim:
            return None, None
        op = self.design["op"]
        if op in ("dcd", "dck", "cck", "tcck"):
            kernel = (params["kernel"], params["c_kernel"])
        else:
            kernel = params["kernel"]
        if self.use_pim:
            sigma, new_x = spectral_norm_pim_apply(kernel, state["sn_x"], num_iter=1)
        else:
            sigma, new_x = spectral_norm_apply(kernel, state["sn_x"], self.sn_def, num_iter=1)
            if op == "dcd" and sigma.ndim == 3:
                sigma = jnp.squeeze(sigma, axis=2)  # [num_class, 1]
        return sigma, new_x

    def _multiplier(self, sigma):
        """act_k / sigma (layer_func.py:884-887)."""
        act_k = self.design.get("act_k")
        if isinstance(act_k, (float, int)) and not isinstance(act_k, bool):
            return act_k / (sigma)
        return 1.0 / sigma

    # ------------------------------------------------------------------
    # Mixed precision: inputs/kernels cast to compute_dtype (bf16 on TPU,
    # MXU accumulates in f32 internally). Op OUTPUTS also stay in
    # compute_dtype — inter-op activations in HBM are bf16, which matters
    # because the train step is bandwidth-bound (~87% of HBM roofline at
    # f32 activations). Elementwise work that mixes in f32 params promotes
    # locally to f32 inside an XLA fusion (no HBM traffic) and the op tail
    # casts back. f32 islands: BN statistics, attention softmax, routine
    # outputs (scores/images).
    def _conv(self, x, w, strides, padding, dilation, feature_group_count=1):
        cd = self.compute_dtype
        return jax.lax.conv_general_dilated(
            x.astype(cd), w.astype(cd),
            window_strides=(strides, strides), padding=padding,
            rhs_dilation=(dilation, dilation) if dilation > 1 else None,
            dimension_numbers=_DIMSPEC,
            feature_group_count=feature_group_count,
        )

    def _conv_t(self, x, w, strides, padding, dilation):
        cd = self.compute_dtype
        if (strides == 2 and dilation == 1
                and tuple(w.shape[:2]) == (4, 4)
                and str(padding).upper() == "SAME"
                and x.ndim == 4 and x.shape[1] >= TC_PS3_MIN_SIZE):
            return self._conv_t_ps3(x.astype(cd), w.astype(cd))
        return jax.lax.conv_transpose(
            x.astype(cd), w.astype(cd),
            strides=(strides, strides), padding=padding,
            rhs_dilation=(dilation, dilation) if dilation > 1 else None,
            dimension_numbers=_DIMSPEC,
        )

    @staticmethod
    def _conv_t_ps3(x, w):
        """Exact periodic-shuffle lowering of ``tc k=4/s2/SAME``: output
        phase (p, q) in {0,1}^2 is a 2x2/s1 conv of x with the
        parity-matched kernel taps, so ONE 3x3/s1 conv to 4*Cout channels
        (taps embedded at offsets (a+p, b+q), channel block (2p+q)*Cout)
        followed by depth-to-space reproduces ``lax.conv_transpose``
        (verified <2e-5 rel in f32 incl. both VJPs,
        tests/test_network.py). Wins isolated-op microbenches on
        image-resolution inputs (the direct emitter is output-lane-
        starved there) but loses end-to-end in the full step — the
        measured NO-GO and analysis live in docs/conv_study.md; the
        ``TC_PS3_MIN_SIZE`` gate in ``_conv_t`` defaults it off."""
        cout = w.shape[3]
        blocks = []
        for p in (0, 1):
            for q in (0, 1):
                k = jnp.zeros((3, 3) + tuple(w.shape[2:]), w.dtype)
                for a in (0, 1):
                    for b in (0, 1):
                        k = k.at[a + p, b + q].set(w[2 * a + p, 2 * b + q])
                blocks.append(k)
        w3 = jnp.concatenate(blocks, axis=3)  # [3, 3, Cin, 4*Cout]
        z = jax.lax.conv_general_dilated(
            x, w3, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=_DIMSPEC)
        n, h, wd, _ = z.shape
        z = z.reshape(n, h, wd, 2, 2, cout)
        return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, cout)

    def _dense(self, x, w):
        cd = self.compute_dtype
        return jnp.matmul(x.astype(cd), w.astype(cd))

    # ------------------------------------------------------------------
    def apply(
        self,
        params: Dict,
        state: Dict,
        x: Array,
        train: bool = True,
        label: Optional[Array] = None,
    ) -> Tuple[Array, Dict]:
        """Apply the op; returns (output, new_state).

        ``label`` is an int32 [N] or [N, 1] tensor for conditional ops.
        """
        d = self.design
        op = d["op"]
        assert x.shape[1:] == tuple(self.input_shape), (
            f"{self.name_in_err}: input shape {x.shape[1:]} does not match "
            f"declared {self.input_shape}"
        )
        new_state = dict(state)

        if label is not None and label.ndim == 2:
            label = jnp.squeeze(label, axis=1)
        if op in ("c_bias", "cb", "bcb", "cbn", "project", "dcd", "dck", "cck", "tcck"):
            assert label is not None, (
                f"{self.name_in_err}: labels must be provided for op {op}"
            )

        # spectral norm multiplier
        multiplier = None
        if self.sn_def is not None or self.use_pim:
            sigma, new_x = self._kernel_norm(params, state)
            if new_x is not None:
                new_state["sn_x"] = new_x
            multiplier = self._multiplier(sigma + EPSI)

        if op == "i":
            y = x
        elif op == "k":
            kern = params["kernel"]
            if "bound" in d:  # clip to prevent gradient explosion
                lb, ub = d["bound"]
                kern = jnp.clip(kern, lb, ub)
            y = x * kern
        elif op == "d":
            kernel = params["kernel"] if multiplier is None else params["kernel"] * multiplier
            y = self._dense(x, kernel)
        elif op == "c":
            kernel = params["kernel"] if multiplier is None else params["kernel"] * multiplier
            y = self._conv(x, kernel, d["strides"], d["padding"], d["dilation"])
        elif op == "tc":
            kernel = params["kernel"] if multiplier is None else params["kernel"] * multiplier
            y = self._conv_t(x, kernel, d["strides"], d["padding"], d["dilation"])
        elif op == "sc":
            cin = self.input_shape[-1]
            # depthwise kernel stored [k, k, C_in, 1] (TF layout); jax wants
            # [k, k, 1, C_in] with feature_group_count=C_in
            dw = jnp.transpose(params["depthwise_kernel"], (0, 1, 3, 2))
            y = self._conv(
                x, dw, d["strides"], d["padding"], d["dilation"], feature_group_count=cin
            )
            y = self._conv(y, params["pointwise_kernel"], 1, "SAME", 1)
        elif op in ("max", "avg", "sum"):
            from mmdgan_tpu.models.scaling import avg_pool, max_pool
            k, s, pad = d["kernel"], d["strides"], d["padding"]
            if op == "max":
                y = max_pool(x, k, s, pad)
            elif op == "avg":
                y = avg_pool(x, k, s, pad)
            else:  # reference 'sum' = avg_pool * k^2 (layer_func.py:941-945)
                y = avg_pool(x, k, s, pad) * (k ** 2)
        elif op in ("b", "bias"):
            y = x + params["bias"]
        elif op in ("bn", "cbn"):
            y, new_state = self._batch_norm(params, state, new_state, x, train, label, op)
        elif op == "lrn":
            # normalize by RMS over channels (layer_func.py:462-477)
            y = x / jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + EPSI)
        elif op == "project":
            # NOTE: the reference creates an SN power vector for project
            # kernels (layer_func.py:792) but deliberately excludes project
            # from the multiplier application (layer_func.py:832-833,
            # 885-887) — the projection kernel is applied RAW even with
            # w_nm='s'. We match that (verified in test_tf1_crossval).
            selected = params["kernel"][label]  # [N, D]
            y = jnp.sum(selected * x, axis=1, keepdims=True)
        elif op in ("c_bias", "cb"):
            y = x + params["c_bias"][label]
        elif op == "bcb":
            y = x + params["bias"] + params["c_bias"][label]
        elif op == "dcd":
            y_d = self._dense(x, params["kernel"])
            kernel_cd = params["c_kernel"][label]  # [N, in, out]
            y_cd = jnp.einsum("ni,nio->no", x, kernel_cd)
            y = y_d + y_cd
            if multiplier is not None:
                y = y * multiplier[label]
        elif op == "dck":
            y = self._dense(x, params["kernel"])
            y = y * (1.0 + params["c_kernel"])[label]
            if multiplier is not None:
                y = y * multiplier[label]
        elif op in ("cck", "tcck"):
            if op == "cck":
                y = self._conv(x, params["kernel"], d["strides"], d["padding"], d["dilation"])
            else:
                y = self._conv_t(x, params["kernel"], d["strides"], d["padding"], d["dilation"])
            y = y * (1.0 + params["c_kernel"])[label]
            if multiplier is not None:
                y = y * multiplier[label]
        else:
            raise ValueError(f"{self.name_in_err}: op {op} not supported")

        y = y.astype(self.compute_dtype)
        assert y.shape[1:] == tuple(self.output_shape), (
            f"{self.name_in_err}: output shape {y.shape[1:]} does not match "
            f"declared {self.output_shape}"
        )
        return y, new_state

    def _batch_norm(self, params, state, new_state, x, train, label, op):
        d = self.design
        # statistics and normalization in f32 regardless of activation
        # dtype (elementwise, fuses with the producing conv — no HBM cost)
        x = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))  # (N,) or (N, H, W)
        if train:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            new_state["moving_mean"] = (
                BN_MOMENTUM * state["moving_mean"] + (1.0 - BN_MOMENTUM) * mean
            )
            new_state["moving_var"] = (
                BN_MOMENTUM * state["moving_var"] + (1.0 - BN_MOMENTUM) * var
            )
        else:
            mean, var = state["moving_mean"], state["moving_var"]
        y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
        if op == "bn":
            if "gamma" in params:
                y = y * params["gamma"]
            if "beta" in params:
                y = y + params["beta"]
        else:  # cbn: per-class scale & offset (layer_func.py:967-971)
            y = y * params["scale"][label] + params["offset"][label]
        return y, new_state

    def __call__(self, params, state, x, **kw):
        return self.apply(params, state, x, **kw)
