"""Multi-scale SSIM in pure JAX.

Rebuild of the reference's ``ms_ssim`` (graph_func.py:1984-2023, which
delegates to tf.image.ssim_multiscale): 11x11 Gaussian window (sigma 1.5),
power factors (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), avg-pool 2x
between scales. Matches TF's formulation: contrast-structure terms at all
scales, luminance term only at the coarsest.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    kernel2d = np.outer(g, g)
    kernel2d /= kernel2d.sum()
    return jnp.asarray(kernel2d, jnp.float32)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv of NHWC x with a 2-D kernel."""
    c = x.shape[-1]
    k = kernel[:, :, None, None]  # HWIO with I=1
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_per_scale(x, y, max_val, k1=0.01, k2=0.03):
    """Returns ([N, C] ssim_mean, [N, C] contrast_structure_mean) per
    channel — TF applies the scale powers per channel and averages over
    channels only at the end."""
    kernel = _gaussian_kernel()
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_x = _filter2d(x, kernel)
    mu_y = _filter2d(y, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d(x * x, kernel) - mu_xx
    sigma_yy = _filter2d(y * y, kernel) - mu_yy
    sigma_xy = _filter2d(x * y, kernel) - mu_xy
    lum = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    axes = (1, 2)
    return jnp.mean(lum * cs, axis=axes), jnp.mean(cs, axis=axes)


def _avg_pool2(x):
    # TF pads odd spatial dims with SYMMETRIC, then 2x2 VALID avg pool
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="symmetric")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    max_val: float = 255.0,
    power_factors: Sequence[float] = _MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Per-pair MS-SSIM of NHWC image batches; images should be at least
    176x176 for the 5-scale default (graph_func.py:1999)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    terms = []  # per-channel factors [N, C]
    ssim_cc = None
    for i, w in enumerate(power_factors):
        ssim_cc, cs = _ssim_per_scale(x, y, max_val)
        if i < len(power_factors) - 1:
            terms.append(jax.nn.relu(cs) ** w)
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    out = jax.nn.relu(ssim_cc) ** power_factors[-1]
    for c in terms:
        out = out * c
    return jnp.mean(out, axis=-1)  # average over channels last (TF semantics)
