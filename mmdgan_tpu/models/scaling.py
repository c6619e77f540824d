"""Image up/down-sampling ops (periodic shuffling, bilinear/bicubic resize,
pooling, unpooling).

Rebuild of ``ImageScaling`` + ``periodic_shuffling``
(``GeneralTools/layer_func.py:197-244, 1041-1186``) in NHWC. All ops are
stateless and parameter-free; shape inference happens at construction.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def depth_to_space(x: Array, r: int) -> Array:
    """TF-compatible NHWC depth_to_space:
    out[n, h*r+i, w*r+j, c] = in[n, h, w, (i*r + j)*C_out + c]."""
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n h i w j c
    return x.reshape(n, h * r, w * r, c_out)


def space_to_depth(x: Array, r: int) -> Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n h w i j c
    return x.reshape(n, h // r, w // r, c * r * r)


def periodic_shuffling(x: Array, scale_factor: int, scale_up: bool = True) -> Array:
    """Sub-pixel conv shuffle (layer_func.py:197-244)."""
    return depth_to_space(x, scale_factor) if scale_up else space_to_depth(x, scale_factor)


def _pool(x: Array, k: int, s: int, padding: str, mode: str) -> Array:
    if mode == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), padding
        )
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), padding
    )
    if mode == "sum":
        return summed
    if padding == "VALID":
        return summed / (k * k)
    # SAME avg pool: divide by the actual window size (TF semantics divides
    # by the full window including padding? TF's avg_pool excludes padding).
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), padding
    )
    return summed / counts


max_pool = lambda x, k, s, padding="SAME": _pool(x, k, s, padding, "max")
avg_pool = lambda x, k, s, padding="SAME": _pool(x, k, s, padding, "avg")
sum_pool = lambda x, k, s, padding="SAME": _pool(x, k, s, padding, "sum")


def _resize_matrix(n_in: int, n_out: int, kind: str) -> "np.ndarray":
    """Interpolation matrix [n_out, n_in] with TF1 align_corners=True
    semantics: output i samples input coordinate i*(n_in-1)/(n_out-1);
    'cubic' is Keys' kernel with a=-0.75 (tf.image.resize_bicubic),
    edge taps clamped."""
    import numpy as np

    W = np.zeros((n_out, n_in), np.float32)
    if n_out == 1:
        W[0, 0] = 1.0
        return W
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)

    def cubic(u, a=-0.75):
        u = abs(u)
        if u <= 1.0:
            return (a + 2) * u ** 3 - (a + 3) * u ** 2 + 1
        if u < 2.0:
            return a * u ** 3 - 5 * a * u ** 2 + 8 * a * u - 4 * a
        return 0.0

    for i, s in enumerate(src):
        j0 = int(np.floor(s))
        t = s - j0
        if kind == "linear":
            taps = ((j0, 1.0 - t), (j0 + 1, t))
        else:
            # TF evaluates the cubic kernel through a 1024-entry lookup
            # table (kTableSize in resize_bicubic); quantizing t the same
            # way makes the match exact (verified to ~1e-7)
            t = round(t * 1024.0) / 1024.0
            taps = tuple((j0 + dj, cubic(t - dj)) for dj in (-1, 0, 1, 2))
        for j, wgt in taps:
            if wgt != 0.0:
                W[i, min(max(j, 0), n_in - 1)] += wgt
    return W


class ImageScaling:
    """One scaling op compiled from a design dict (layer_func.py:1041-1186).

    design keys:
      'method': 'ps' | 'bil' | 'bic' | 'max' | 'avg' | 'unpool'
      'factor': positive = upsample, negative = downsample
      'size':   target (h, w) if factor is None
    input_shape: per-example NHWC shape (H, W, C).
    """

    def __init__(self, design: dict, input_shape: Sequence[int], name: str = "scale"):
        self.method = design["method"]
        self.name = name
        self.input_shape = tuple(input_shape)
        h, w, fan_in = self.input_shape
        factor = design.get("factor", 2)
        size = design.get("size", (None, None))
        new_h, new_w = size
        if factor is None:
            assert new_h / h == new_w / w, "height/width factors do not match."
            factor = int(new_h / h) if new_h > h else -int(h / new_h)
        elif factor > 0:
            new_h, new_w = int(h * factor), int(w * factor)
        elif factor < 0:
            new_h, new_w = int(-h / factor), int(-w / factor)
        else:
            raise ValueError(f"{name}: factor cannot be zero.")
        self.factor = factor
        if factor > 0 and self.method in ("avg", "max"):
            raise ValueError(f"{name}: {self.method} can only be used for downsampling")
        if factor < 0 and self.method == "unpool":
            raise ValueError(f"{name}: unpool can only be used for upsampling")
        if factor != 2 and self.method == "unpool":
            raise ValueError(f"{name}: unpool can only deal with factor = 2")
        if self.method == "ps":
            fan_out = int(fan_in * h * w / new_h / new_w)
        else:
            fan_out = fan_in
        self.output_shape = (new_h, new_w, fan_out)

    def apply(self, x: Array) -> Array:
        h, w, _ = self.output_shape
        if self.method == "ps":
            return periodic_shuffling(x, abs(self.factor), self.factor > 0)
        if self.method in ("bil", "bic"):
            # the reference resizes with align_corners=True
            # (layer_func.py:1142, :1152 — TF1 semantics, NOT the
            # half-pixel-centers convention of jax.image.resize); built as
            # two static interpolation matrices -> two matmuls (exact and
            # MXU-friendly)
            kind = "linear" if self.method == "bil" else "cubic"
            wh = jnp.asarray(_resize_matrix(x.shape[1], h, kind))
            ww = jnp.asarray(_resize_matrix(x.shape[2], w, kind))
            y = jnp.einsum("oh,nhwc->nowc", wh.astype(jnp.float32),
                           x.astype(jnp.float32))
            y = jnp.einsum("pw,nowc->nopc", ww.astype(jnp.float32), y)
            return y.astype(x.dtype)
        if self.method == "max":
            f = -self.factor
            return max_pool(x, f, f, "SAME")
        if self.method == "avg":
            f = -self.factor
            return avg_pool(x, f, f, "SAME")
        if self.method == "unpool":
            # concat x4 then shuffle up (layer_func.py:1167-1170)
            return periodic_shuffling(jnp.concatenate([x] * 4, axis=3), 2, True)
        raise NotImplementedError(f"{self.name}: method {self.method} not implemented.")

    def __call__(self, x: Array) -> Array:
        return self.apply(x)
