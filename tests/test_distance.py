"""Unit tests for the pairwise-distance engine against naive numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from mmdgan_tpu.ops.distance import (
    get_batch_squared_dist,
    get_squared_dist,
    get_squared_dist_ref,
    slice_pairwise_distance,
    squared_dist_triplet,
)


def np_pairwise(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def test_xx_matches_numpy(rng):
    x = rng.randn(16, 8).astype(np.float32)
    d = np.asarray(get_squared_dist(x, mode="xx"))
    np.testing.assert_allclose(d, np_pairwise(x, x), rtol=1e-4, atol=1e-4)
    assert (d >= 0).all()


def test_xxxyyy_matches_numpy(rng):
    x = rng.randn(12, 6).astype(np.float32)
    y = rng.randn(12, 6).astype(np.float32)
    dxx, dxy, dyy = get_squared_dist(x, y, mode="xxxyyy")
    np.testing.assert_allclose(np.asarray(dxx), np_pairwise(x, x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dxy), np_pairwise(x, y), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dyy), np_pairwise(y, y), rtol=1e-4, atol=1e-4)


def test_xy_and_xxxy_modes(rng):
    x = rng.randn(10, 4).astype(np.float32)
    y = rng.randn(10, 4).astype(np.float32)
    dxy = get_squared_dist(x, y, mode="xy")
    np.testing.assert_allclose(np.asarray(dxy), np_pairwise(x, y), rtol=1e-4, atol=1e-4)
    dxx, dxy2 = get_squared_dist(x, y, mode="xxxy")
    np.testing.assert_allclose(np.asarray(dxy2), np_pairwise(x, y), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dxx), np_pairwise(x, x), rtol=1e-4, atol=1e-4)


def test_fast_matches_exact_reference(rng):
    """Fast Gram-matrix path vs exact O(n^2 d) path (math_func.py:861-888)."""
    x = rng.randn(20, 16).astype(np.float32)
    y = rng.randn(20, 16).astype(np.float32)
    fast = get_squared_dist(x, y, mode="xxxyyy")
    exact = get_squared_dist_ref(x, y)
    for f, e in zip(fast, exact):
        np.testing.assert_allclose(np.asarray(f), np.asarray(e), rtol=1e-4, atol=1e-4)


def test_scale_vector(rng):
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 4).astype(np.float32)
    scale = np.abs(rng.randn(4)).astype(np.float32)
    dxy = get_squared_dist(x, y, scale=scale, mode="xy")
    # reference semantics: d = sum(scale*x*x) - 2 x*scale . y + sum(scale*y*y)
    expect = np.maximum(
        (x * scale * x).sum(1)[:, None]
        - 2 * (x * scale) @ y.T
        + (y * scale * y).sum(1)[None, :],
        0.0,
    )
    np.testing.assert_allclose(np.asarray(dxy), expect, rtol=1e-4, atol=1e-4)


def test_z_score_centering(rng):
    x = rng.randn(8, 4).astype(np.float32) + 10.0
    y = rng.randn(8, 4).astype(np.float32) + 10.0
    d1, d2, d3 = get_squared_dist(x, y, z_score=True, mode="xxxyyy")
    mu = np.concatenate([x, y]).mean(0, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(d2), np_pairwise(x - mu, y - mu), rtol=1e-3, atol=1e-3
    )


def test_triplet(rng):
    x, y, z = (rng.randn(6, 3).astype(np.float32) for _ in range(3))
    dxx, dyy, dzz, dxy, dxz, dyz = squared_dist_triplet(x, y, z)
    np.testing.assert_allclose(np.asarray(dxy), np_pairwise(x, y), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dyz), np_pairwise(y, z), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dxz), np_pairwise(x, z), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("axis", [1, 2])
def test_batch_squared_dist(rng, axis):
    xb = rng.randn(3, 5, 7).astype(np.float32)
    yb = rng.randn(3, 5, 7).astype(np.float32)
    got = get_batch_squared_dist(xb, yb, axis=axis, mode="xy")
    for i in range(3):
        if axis == 1:  # features along axis 1 -> pairwise over axis-2 columns
            expect = np_pairwise(xb[i].T, yb[i].T)
        else:
            expect = np_pairwise(xb[i], yb[i])
        np.testing.assert_allclose(np.asarray(got[i]), expect, rtol=1e-4, atol=1e-4)


def test_batch_xxxyyy(rng):
    xb = rng.randn(2, 4, 6).astype(np.float32)
    yb = rng.randn(2, 4, 6).astype(np.float32)
    dxx, dxy, dyy = get_batch_squared_dist(xb, yb, axis=2, mode="xxxyyy")
    for i in range(2):
        np.testing.assert_allclose(np.asarray(dxx[i]), np_pairwise(xb[i], xb[i]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dyy[i]), np_pairwise(yb[i], yb[i]), rtol=1e-4, atol=1e-4)


def test_slice_pairwise_no_mix(rng):
    b = 4
    s = rng.randn(2 * b, 3).astype(np.float32)
    pd = get_squared_dist(jnp.asarray(s), mode="xx")
    g1, g12, g2 = slice_pairwise_distance(pd, batch_size=b)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(pd)[:b, :b])
    np.testing.assert_allclose(np.asarray(g12), np.asarray(pd)[:b, b:])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(pd)[b:, b:])


def test_slice_pairwise_mix_identity(rng):
    """All-True indices keep the original grouping."""
    b = 4
    s = rng.randn(2 * b, 3).astype(np.float32)
    pd = get_squared_dist(jnp.asarray(s), mode="xx")
    idx = jnp.ones([b], bool)
    g1, g12, g2 = slice_pairwise_distance(pd, indices=idx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(pd)[:b, :b])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(pd)[b:, b:])


def test_slice_pairwise_mix_swap(rng):
    """Mixed indices pull swapped rows into group1."""
    b = 4
    s = rng.randn(2 * b, 3).astype(np.float32)
    pd = np.asarray(get_squared_dist(jnp.asarray(s), mode="xx"))
    idx = jnp.asarray([True, False, True, False])
    g1, g12, g2 = slice_pairwise_distance(jnp.asarray(pd), indices=idx)
    # group1 rows: x0, x2 (idx True), y1, y3 (i.e. rows 0,2,5,7)
    rows1 = [0, 2, 5, 7]
    rows2 = [1, 3, 4, 6]
    np.testing.assert_allclose(np.asarray(g1), pd[np.ix_(rows1, rows1)])
    np.testing.assert_allclose(np.asarray(g2), pd[np.ix_(rows2, rows2)])
    np.testing.assert_allclose(np.asarray(g12), pd[np.ix_(rows1, rows2)])
