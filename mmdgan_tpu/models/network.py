"""Net (layer list) + Routine (mini DAG executor).

Functional JAX rebuild of ``Net``/``Routine``
(``GeneralTools/layer_func.py:2111-2531``). A ``Net`` compiles an
architecture list into :class:`Layer` objects; a ``Routine`` wires layers
(sequentially or with concat/sum/split fan-in/out), infers every shape
statically, and executes them as one pure function.

The reference's del-op insertion (layer_func.py:2397-2433) — freeing
intermediate tensors — is unnecessary under XLA, which performs liveness
analysis during compilation; the wiring API is preserved without it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mmdgan_tpu.models.layers import Layer, _nhwc_shape, update_layer_design

Array = jnp.ndarray


class Net:
    """Compile an architecture list into Layer objects (layer_func.py:2111-2151).

    :param net_design: list of layer design dicts (see update_layer_design)
    :param net_name: parameter scope name ('gen' / 'dis')
    :param num_class: number of data classes (0/1 = unconditional)
    """

    def __init__(
        self,
        net_design: Sequence[dict],
        net_name: str = "net",
        num_class: int = 0,
        init_mode: str = "default",
        sn_mode: str = "pico",
        compute_dtype=jnp.bfloat16,
    ):
        self.net_def = net_design
        self.num_layers = len(net_design)
        self.net_name = net_name
        self.layers: List[Layer] = []
        for i in range(self.num_layers):
            design = update_layer_design(self.net_def[i])
            self.layers.append(
                Layer(
                    design,
                    name_prefix=self.net_name + "/",
                    num_class=num_class,
                    init_mode=init_mode,
                    sn_mode=sn_mode,
                    compute_dtype=compute_dtype,
                )
            )

    def init(self, key: Array) -> Tuple[Dict, Dict]:
        params, state = {}, {}
        keys = jax.random.split(key, self.num_layers)
        for layer, k in zip(self.layers, keys):
            p, s = layer.init(k)
            if p:
                params[layer.layer_scope] = p
            if s:
                state[layer.layer_scope] = s
        return params, state


class Routine:
    """Static DAG of layers with concat/sum/split links
    (layer_func.py:2207-2495).

    Build phase (shape inference, one-time):
        r = Routine(net)
        r.add_input_layers([code_size], [0])      # per-example shape, no batch
        r.seq_links(list(range(net.num_layers)))
        r.add_output_layers([net.num_layers - 1])
    Run phase (pure):
        params, state = r.init(key)
        out, new_state = r.apply(params, state, {'x': z}, train=True)
    """

    def __init__(self, net_object: Net):
        self.net = net_object
        self.operations: List = []
        self.layer_indices: List[int] = []
        self.output_layer_indices: List[int] = []
        self.output_added = False

    # -- build phase ------------------------------------------------------
    def _claim(self, out_index: int):
        if out_index in self.layer_indices:
            raise ValueError(f"Layer {out_index} has already been linked.")
        self.layer_indices.append(out_index)

    def add_input_layers(self, input_shape: Sequence[int], out_layer_indices: Sequence[int]):
        """Register entry layers. ``input_shape`` is per-example (no batch);
        a reference channels-first image spec [C, H, W] (or a legacy
        [batch, C, H, W] / [batch, F]) is converted/stripped."""
        input_shape = list(input_shape)
        if len(input_shape) == 4:  # legacy [batch, C, H, W]
            input_shape = input_shape[1:]
        elif len(input_shape) == 2:  # legacy [batch, F]
            input_shape = input_shape[1:]
        shape = _nhwc_shape(input_shape)
        for out_index in out_layer_indices:
            self._claim(out_index)
            layer = self.net.layers[out_index]
            layer.input_shape = tuple(shape)
            layer.build()
            self.operations.append([None, None, out_index, [out_index]])

    def link(
        self,
        in_layer_indices: Sequence[int],
        out_layer_indices: Sequence[int],
        input_fun: Optional[str] = None,
    ):
        """Wire in-layers to out-layers (layer_func.py:2242-2347):
        1->N None: broadcast; 1->N 'split': channel split;
        N->1 'concat': channel concat; N->1 'sum': add; N->N: pairwise."""
        for in_index in in_layer_indices:
            if self.net.layers[in_index].output_shape is None:
                raise RuntimeError(f"Input layer {in_index} has not been defined yet.")
        num_in, num_out = len(in_layer_indices), len(out_layer_indices)

        if num_in == num_out:
            for i in range(num_in):
                self._claim(out_layer_indices[i])
                in_shape = self.net.layers[in_layer_indices[i]].output_shape
                layer = self.net.layers[out_layer_indices[i]]
                layer.input_shape = tuple(in_shape)
                layer.build()
                self.operations.append(
                    [[in_layer_indices[i]], None, out_layer_indices[i], [out_layer_indices[i]]]
                )
        elif num_in > 1 and num_out == 1:
            self._claim(out_layer_indices[0])
            in_shape = list(self.net.layers[in_layer_indices[0]].output_shape)
            if input_fun == "concat":
                for in_index in in_layer_indices[1:]:
                    in_shape[-1] += self.net.layers[in_index].output_shape[-1]
                handler = "concat"
            elif input_fun == "sum":
                handler = "sum"
            else:
                raise ValueError(f"{in_layer_indices}: input function {input_fun} is not supported.")
            layer = self.net.layers[out_layer_indices[0]]
            layer.input_shape = tuple(in_shape)
            layer.build()
            self.operations.append([list(in_layer_indices), handler, out_layer_indices[0], list(out_layer_indices)])
        elif num_in == 1 and num_out > 1:
            in_shape = list(self.net.layers[in_layer_indices[0]].output_shape)
            if input_fun == "split":
                in_shape[-1] = in_shape[-1] // num_out
                group = []
                for out_index in out_layer_indices:
                    self._claim(out_index)
                    layer = self.net.layers[out_index]
                    layer.input_shape = tuple(in_shape)
                    layer.build()
                    group.append(out_index)
                self.operations.append([list(in_layer_indices), "split", group, list(out_layer_indices)])
            else:  # broadcast
                for out_index in out_layer_indices:
                    self._claim(out_index)
                    layer = self.net.layers[out_index]
                    layer.input_shape = tuple(in_shape)
                    layer.build()
                    self.operations.append([list(in_layer_indices), None, out_index, [out_index]])
        else:
            raise ValueError(
                f"{in_layer_indices}: input has {num_in} layers which do not "
                f"match the output with {num_out} layers."
            )

    def seq_links(self, in_layer_indices: Sequence[int]):
        """Chain layers sequentially (layer_func.py:2349-2376)."""
        if self.net.layers[in_layer_indices[0]].output_shape is None:
            raise RuntimeError(f"Input layer {in_layer_indices[0]} has not been defined yet.")
        for i in range(len(in_layer_indices) - 1):
            self._claim(in_layer_indices[i + 1])
            in_shape = self.net.layers[in_layer_indices[i]].output_shape
            layer = self.net.layers[in_layer_indices[i + 1]]
            layer.input_shape = tuple(in_shape)
            layer.build()
            self.operations.append(
                [[in_layer_indices[i]], None, in_layer_indices[i + 1], [in_layer_indices[i + 1]]]
            )

    def add_output_layers(self, in_layer_indices: Sequence[int]):
        for out_index in in_layer_indices:
            if out_index in self.output_layer_indices:
                raise ValueError(f"Layer {out_index} has already been added as output layer.")
            self.output_layer_indices.append(out_index)
            if self.net.layers[out_index].output_shape is None:
                raise RuntimeError(f"Output layer {out_index} has not been linked yet.")
        self.output_added = True

    @property
    def output_shape(self):
        if len(self.output_layer_indices) == 1:
            return self.net.layers[self.output_layer_indices[0]].output_shape
        return {
            i: self.net.layers[i].output_shape for i in self.output_layer_indices
        }

    # -- run phase --------------------------------------------------------
    def init(self, key: Array) -> Tuple[Dict, Dict]:
        """Init params/state for the layers this routine claimed."""
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layer_indices), 1))
        for idx, k in zip(self.layer_indices, keys):
            layer = self.net.layers[idx]
            p, s = layer.init(k)
            if p:
                params[layer.layer_scope] = p
            if s:
                state[layer.layer_scope] = s
        return params, state

    def kernel_norms(self, params: Dict, state: Dict) -> Dict[str, float]:
        """Per-op spectral norms for observability (the reference's
        ``kernel_norm`` summaries, layer_func.py:2153-2165,
        my_sngan.py:320-321). Pure read: state is not advanced."""
        from mmdgan_tpu.ops.spectral_norm import (
            spectral_norm_apply,
            spectral_norm_pim_apply,
        )

        out: Dict[str, float] = {}
        for idx in self.layer_indices:
            layer = self.net.layers[idx]
            scope = layer.layer_scope
            for op_name, op in layer.ops.items():
                sn_def = getattr(op, "sn_def", None)
                use_pim = getattr(op, "use_pim", False)
                if sn_def is None and not use_pim:
                    continue
                p = params.get(scope, {}).get(op_name, {})
                s = state.get(scope, {}).get(op_name, {})
                if "sn_x" not in s:
                    continue
                if op.design["op"] in ("dcd", "dck", "cck", "tcck"):
                    kernel = (p["kernel"], p["c_kernel"])
                else:
                    kernel = p["kernel"]
                if use_pim:
                    sigma, _ = spectral_norm_pim_apply(kernel, s["sn_x"])
                else:
                    sigma, _ = spectral_norm_apply(kernel, s["sn_x"], sn_def)
                import numpy as _np

                arr = _np.asarray(sigma)
                out[f"{scope}/{op_name}"] = (
                    float(arr) if arr.size == 1 else arr
                )
        return out

    def apply(
        self,
        params: Dict,
        state: Dict,
        routine_inputs,
        train: bool = True,
    ):
        """Execute the DAG. ``routine_inputs`` is an Array or
        {'x': Array, 'y': labels}. Returns (output, new_state); output is
        {'x': ..., 'y': ...} for one output layer, else {index: out_dict}."""
        if not self.output_added:
            raise RuntimeError("Output layer has not been defined.")
        if not isinstance(routine_inputs, dict):
            routine_inputs = {"x": routine_inputs, "y": None}
        new_state: Dict[str, Dict] = {}
        outs: Dict[int, dict] = {}

        def run_layer(idx, inp):
            layer = self.net.layers[idx]
            scope = layer.layer_scope
            y, s = layer.apply(
                params.get(scope, {}), state.get(scope, {}), inp, train=train
            )
            if s:
                new_state[scope] = s
            return y

        for in_indices, handler, target, out_indices in self.operations:
            if in_indices is None:
                outs[out_indices[0]] = run_layer(target, routine_inputs)
            elif handler is None:
                outs[out_indices[0]] = run_layer(target, outs[in_indices[0]])
            elif handler == "concat":
                xs = [outs[i]["x"] for i in in_indices]
                inp = dict(outs[in_indices[0]])
                inp["x"] = jnp.concatenate(xs, axis=-1)
                outs[out_indices[0]] = run_layer(target, inp)
            elif handler == "sum":
                xs = [outs[i]["x"] for i in in_indices]
                inp = dict(outs[in_indices[0]])
                inp["x"] = sum(xs[1:], xs[0])
                outs[out_indices[0]] = run_layer(target, inp)
            elif handler == "split":
                src = outs[in_indices[0]]
                splits = jnp.split(src["x"], len(target), axis=-1)
                for t, piece in zip(target, splits):
                    inp = dict(src)
                    inp["x"] = piece
                    outs[t] = run_layer(t, inp)
            else:
                raise RuntimeError(f"unknown handler {handler}")

        def as_f32(o):
            # routine outputs (scores, images) always f32: the MMD loss
            # computes Gram matrices in HIGHEST precision from them, and
            # users receive f32 regardless of the internal activation dtype
            o = dict(o)
            o["x"] = o["x"].astype(jnp.float32)
            return o

        if len(self.output_layer_indices) == 1:
            return as_f32(outs[self.output_layer_indices[0]]), new_state
        return {i: as_f32(outs[i]) for i in self.output_layer_indices}, new_state

    def __call__(self, params, state, routine_inputs, train=True):
        return self.apply(params, state, routine_inputs, train)
