"""Sliced Wasserstein Distance between image batches.

The reference exposes SWD (graph_func.py:1947-1982) but notes it returns
NaN ("swd gives nan somehow", my_sngan.py:634); this is a working
implementation: Laplacian-pyramid patch descriptors + random-projection
1-D Wasserstein, following Karras et al. (2018) "Progressive Growing of
GANs" appendix A — the same metric the reference intended to use.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _gauss_kernel5() -> np.ndarray:
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    k2 = np.outer(k, k)
    return (k2 / k2.sum()).astype(np.float32)


def _blur(x: Array) -> Array:
    k = jnp.asarray(_gauss_kernel5())[:, :, None, None]
    c = x.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def laplacian_pyramid(x: Array, num_levels: int) -> List[Array]:
    """Standard Laplacian pyramid: level i holds detail at scale i."""
    levels = []
    cur = x
    for _ in range(num_levels - 1):
        blurred = _blur(cur)
        levels.append(cur - blurred)
        cur = blurred[:, ::2, ::2, :]
    levels.append(cur)
    return levels


def _extract_patches(x: Array, patch: int, num_patches: int, key) -> Array:
    """Random patch descriptors [num_patches, patch*patch*C], normalized
    per channel (Karras et al. normalize patches by mean/std)."""
    n, h, w, c = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    idx_n = jax.random.randint(k1, (num_patches,), 0, n)
    idx_h = jax.random.randint(k2, (num_patches,), 0, h - patch + 1)
    idx_w = jax.random.randint(k3, (num_patches,), 0, w - patch + 1)

    def grab(i, ph, pw):
        return jax.lax.dynamic_slice(x[i], (ph, pw, 0), (patch, patch, c))

    patches = jax.vmap(grab)(idx_n, idx_h, idx_w)  # [P, p, p, C]
    mu = jnp.mean(patches, axis=(1, 2), keepdims=True)
    sd = jnp.std(patches, axis=(1, 2), keepdims=True) + 1e-8
    patches = (patches - mu) / sd
    return patches.reshape(num_patches, -1)


def sliced_wasserstein(a: Array, b: Array, num_dirs: int, key) -> Array:
    """Average 1-D Wasserstein distance over random unit projections."""
    d = a.shape[1]
    dirs = jax.random.normal(key, (d, num_dirs))
    dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-8)
    pa = jnp.sort(a @ dirs, axis=0)
    pb = jnp.sort(b @ dirs, axis=0)
    return jnp.mean(jnp.abs(pa - pb))


def sliced_wasserstein_distance(
    x: Array,
    y: Array,
    num_levels: int = 3,
    patch: int = 7,
    num_patches: int = 2048,
    num_dirs: int = 128,
    key=None,
) -> List[float]:
    """Per-pyramid-level SWD between two NHWC image batches in [-1, 1].

    Returns one score per level (finest first), x1e3 like the PGGAN paper.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    pyr_x = laplacian_pyramid(x, num_levels)
    pyr_y = laplacian_pyramid(y, num_levels)
    scores = []
    for lx, ly in zip(pyr_x, pyr_y):
        key, k1, k2, k3 = jax.random.split(key, 4)
        if min(lx.shape[1], lx.shape[2]) < patch:
            continue
        pa = _extract_patches(lx, patch, num_patches, k1)
        pb = _extract_patches(ly, patch, num_patches, k2)
        scores.append(float(sliced_wasserstein(pa, pb, num_dirs, k3)) * 1e3)
    return scores
