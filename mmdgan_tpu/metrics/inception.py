"""Inception classifier backends for IS/FID.

The reference runs the frozen ``inception_v1_2015_12_05`` graph through
tf.contrib.gan (graph_func.py:1616, 1635-1655): images resized bilinearly
to 299, fed to tensor 'Mul:0', outputs 'logits:0' (IS) and 'pool_3:0'
(FID). Bit-parity of FID requires that exact graph, so:

- :class:`FrozenGraphClassifier` executes the user-provided .pb via
  TensorFlow (CPU) with identical tensor wiring — the parity path. The
  .pb is downloaded the same way as the reference's Addon/inception_v1
  instructions; it cannot ship with the repo.
- :class:`RandomFeatureClassifier` is a fixed-seed random conv feature
  extractor for smoke tests and relative comparisons when no weights are
  available. FID numbers from it are NOT comparable to published values
  (clearly marked).
- :class:`InceptionClassifier` picks the frozen graph when a path is
  given/exists, else falls back with a warning.

All classifiers take NHWC float images in [-1, 1] and return
(logits [N, 1001-ish], pool3 [N, D]) as numpy arrays, chunked to bound
memory (the reference chunks at 100, graph_func.py:1670-1705).
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, Tuple

import numpy as np

CHUNK = 100
IMAGE_SIZE = 299  # tfgan.eval.INCEPTION_DEFAULT_IMAGE_SIZE


def _to_rgb(images: np.ndarray) -> np.ndarray:
    """Classifiers expect 3 channels: tile grayscale, average extras."""
    c = images.shape[-1]
    if c == 3:
        return images
    if c == 1:
        return np.repeat(images, 3, axis=-1)
    return np.repeat(images.mean(axis=-1, keepdims=True), 3, axis=-1)


def resize_bilinear_tf1(x, size: Tuple[int, int]):
    """TF1 ``tf.image.resize_bilinear(align_corners=False)`` semantics —
    the resize the reference applies before inception
    (graph_func.py:1649-1651). Legacy TF1 samples source coordinates at
    ``i * in/out`` (no half-pixel offset), unlike jax.image.resize.
    Pure JAX, jittable; x is NHWC."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    out_h, out_w = size
    scale_h = h / out_h
    scale_w = w / out_w
    ys = jnp.arange(out_h, dtype=jnp.float32) * scale_h
    xs = jnp.arange(out_w, dtype=jnp.float32) * scale_w
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class FrozenGraphClassifier:
    """Run the reference frozen inception graph.

    backend='jax' (default): the GraphDef executes as pure XLA via
    :class:`mmdgan_tpu.metrics.tf_graph_jax.GraphDefModule` — batched
    TPU-resident inference (the BASELINE north-star), with TF1-legacy
    bilinear resize for exact preprocessing parity.
    backend='tf': execute through TensorFlow on host CPU (the reference's
    own execution engine; useful for cross-checking).
    """

    def __init__(self, pb_path: str, backend: str = "jax",
                 input_tensor: str = "Mul:0",
                 output_tensors: Tuple[str, str] = ("logits:0", "pool_3:0")):
        self.backend = backend
        self.input_tensor = input_tensor
        self.output_tensors = tuple(output_tensors)
        if backend == "jax":
            import jax

            from mmdgan_tpu.metrics.tf_graph_jax import GraphDefModule

            mod = GraphDefModule(pb_path, [input_tensor], list(output_tensors))

            def run(images):
                if images.shape[1] != IMAGE_SIZE:
                    images = resize_bilinear_tf1(images, (IMAGE_SIZE, IMAGE_SIZE))
                logits, pool3 = mod(images)
                return logits, pool3

            self._fn = jax.jit(run)
        elif backend == "tf":
            import tensorflow as tf

            with open(pb_path, "rb") as f:
                graph_def = tf.compat.v1.GraphDef()
                graph_def.ParseFromString(f.read())
            self._tf = tf

            def _run(images):
                if images.shape[1] != IMAGE_SIZE:
                    images = tf.compat.v1.image.resize_bilinear(
                        images, [IMAGE_SIZE, IMAGE_SIZE])
                logits, pool3 = tf.graph_util.import_graph_def(
                    graph_def,
                    input_map={input_tensor: images},
                    return_elements=list(output_tensors),
                )
                return tf.squeeze(logits), tf.squeeze(pool3)

            self._fn = tf.function(_run)
        else:
            raise ValueError(f"backend {backend} not supported")

    def __call__(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        logits_all, pool_all = [], []
        images = _to_rgb(np.asarray(images, np.float32))
        for i in range(0, len(images), CHUNK):
            chunk = images[i:i + CHUNK]
            logits, pool3 = self._fn(chunk)
            logits_all.append(np.asarray(logits).reshape(len(chunk), -1))
            pool_all.append(np.asarray(pool3).reshape(len(chunk), -1))
        return np.concatenate(logits_all), np.concatenate(pool_all)


class RandomFeatureClassifier:
    """Deterministic random conv features — smoke-test stand-in.

    A small strided conv stack with fixed random weights; outputs
    (logits [N, 1001], pool3 [N, 2048]). Useful for pipeline tests and
    relative model comparison, NOT for absolute FID/IS numbers.
    """

    def __init__(self, seed: int = 0, pool_dim: int = 2048, num_logits: int = 1001):
        self.seed = seed
        self.pool_dim = pool_dim
        self.num_logits = num_logits
        self._fn = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        key = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(key, 6)
        dims = [3, 16, 32, 64, 128]
        kernels = [
            jax.random.normal(ks[i], (3, 3, dims[i], dims[i + 1]))
            * np.sqrt(2.0 / (9 * dims[i]))
            for i in range(4)
        ]
        w_pool = jax.random.normal(ks[4], (dims[-1], self.pool_dim)) * np.sqrt(
            1.0 / dims[-1])
        w_log = jax.random.normal(ks[5], (self.pool_dim, self.num_logits)) * np.sqrt(
            1.0 / self.pool_dim)

        @jax.jit
        def fwd(x):
            h = x
            for k in kernels:
                h = jax.lax.conv_general_dilated(
                    h, k, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jax.nn.relu(h)
            h = jnp.mean(h, axis=(1, 2))  # global average pool
            pool3 = jnp.tanh(h @ w_pool)
            logits = pool3 @ w_log
            return logits, pool3

        self._fn = fwd

    def __call__(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._fn is None:
            self._build()
        import jax

        images = _to_rgb(np.asarray(images, np.float32))
        logits_all, pool_all = [], []
        for i in range(0, len(images), CHUNK):
            chunk = np.asarray(images[i:i + CHUNK], np.float32)
            logits, pool3 = self._fn(chunk)
            logits_all.append(np.asarray(jax.device_get(logits)))
            pool_all.append(np.asarray(jax.device_get(pool3)))
        return np.concatenate(logits_all), np.concatenate(pool_all)


class InceptionClassifier:
    """Default selector: frozen graph if available, else random features."""

    def __new__(cls, pb_path: Optional[str] = None, seed: int = 0):
        if pb_path is None:
            from mmdgan_tpu.config import get_config
            pb_path = get_config().inception_npz  # path knob reused for .pb
        if pb_path is not None and os.path.isfile(pb_path):
            try:
                return FrozenGraphClassifier(pb_path)
            except Exception as e:
                warnings.warn(f"frozen inception graph failed to load: {e}; "
                              "falling back to random features.")
        else:
            warnings.warn(
                "No frozen inception graph provided — using the random-feature "
                "classifier. IS/FID values will NOT be comparable to published "
                "numbers; download the reference frozen_inception_v1_2015_12_05 "
                "graph and set Config.inception_npz to its .pb path for parity."
            )
        return RandomFeatureClassifier(seed=seed)
