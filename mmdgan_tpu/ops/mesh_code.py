"""MeshCode: latent-code grids for evaluation sampling.

Rebuild of ``MeshCode`` / ``kron_by_reshape`` / ``slerp``
(``GeneralTools/math_func.py:9-36, 140-168, 219-352``) on numpy + JAX PRNG
(deterministic given a key, unlike the reference's graph-level RNG).

Modes (math_func.py:235-245):
  0 / 'random'  — z ~ N(0, 1)
  1 / 'sine'    — sine-interpolated 2-D manifold between 4 support codes
  2 / 'feature' — per-feature sweeps over [-grid, grid]
plus ``simple_grid`` for 2-D codes.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import numpy as np

Array = np.ndarray


def kron_by_reshape(mat1: Array, mat2: Array) -> Array:
    """Kronecker product via reshape+transpose (math_func.py:9-36)."""
    a, b = mat1.shape
    c, d = mat2.shape
    mat3 = np.matmul(np.reshape(mat1, [-1, 1]), np.reshape(mat2, [1, -1]))
    mat3 = np.reshape(mat3, [a, b, c, d])
    mat3 = np.transpose(mat3, axes=[0, 2, 1, 3])
    return np.reshape(mat3, [a * c, b * d])


def slerp(p0: Array, p1: Array, t: Union[float, Array]) -> Array:
    """Spherical linear interpolation (math_func.py:140-168)."""
    from numpy.linalg import norm

    theta = np.arccos(np.clip(np.dot(p0 / norm(p0), p1 / norm(p1)), -1.0, 1.0))
    st = np.sin(theta)
    if not np.isscalar(t):
        p0 = np.expand_dims(p0, axis=0)
        p1 = np.expand_dims(p1, axis=0)
        t = np.expand_dims(np.asarray(t), axis=1)
    if st > 0.1:
        return np.sin((1.0 - t) * theta) / st * p0 + np.sin(t * theta) / st * p1
    return (1.0 - t) * p0 + t * p1


class MeshCode:
    def __init__(self, code_length: int, mesh_num: Optional[Tuple[int, int]] = None):
        self.D = code_length
        self.mesh_num = (10, 10) if mesh_num is None else tuple(mesh_num)

    def get_batch(self, mesh_mode, key=None) -> Array:
        if key is None:
            key = jax.random.PRNGKey(0)
        if mesh_mode in (0, "random"):
            return self.by_random(key)
        if mesh_mode in (1, "sine"):
            return self.by_sine(key=key)
        if mesh_mode in (2, "feature"):
            return self.by_feature(key=key)
        raise ValueError("mesh_mode is not supported.")

    def by_random(self, key) -> Array:
        return np.asarray(
            jax.random.normal(key, (self.mesh_num[0] * self.mesh_num[1], self.D)),
            np.float32,
        )

    def by_sine(self, z_support: Optional[Array] = None, key=None) -> Array:
        """Sine interpolation between 4 support codes (math_func.py:259-295)."""
        if z_support is None:
            z_support = np.asarray(jax.random.normal(key, (4, self.D)), np.float32)
        z0, z1, z2, z3 = (z_support[i][None, :] for i in range(4))
        mesh_phi = np.float32(
            np.expand_dims(np.pi / 4.0 * np.linspace(0.0, 1.0, self.mesh_num[0]), 1))
        mesh_psi = np.float32(
            np.expand_dims(np.pi / 4.0 * np.linspace(0.0, 1.0, self.mesh_num[1]), 1))
        return (
            kron_by_reshape(
                np.cos(mesh_psi) @ z0 + np.sin(mesh_psi) @ z1, np.cos(mesh_phi))
            + kron_by_reshape(
                np.cos(mesh_psi) @ z2 + np.sin(mesh_psi) @ z3, np.sin(mesh_phi))
        ).astype(np.float32)

    def by_feature(self, grid: float = 2.0, key=None) -> Array:
        """One-hot feature sweeps (math_func.py:297-318), with shuffled
        feature dimensions."""
        mesh = np.float32(np.expand_dims(np.linspace(-grid, grid, self.mesh_num[1]), 1))
        z_batch = kron_by_reshape(
            np.eye(self.mesh_num[0], self.D, dtype=np.float32), mesh)
        if key is not None:
            perm = np.asarray(jax.random.permutation(key, self.D))
            z_batch = z_batch[:, perm]
        return z_batch.astype(np.float32)

    def simple_grid(self, grid: Optional[Array] = None):
        """2-D grid (math_func.py:320-338); returns (z, x, y)."""
        if self.D != 2:
            raise ValueError("Code length has to be two")
        if grid is None:
            grid = np.array([[-1.0, 1.0], [-1.0, 1.0]], dtype=np.float32)
        x = np.linspace(grid[0][0], grid[0][1], self.mesh_num[0])
        y = np.linspace(grid[1][0], grid[1][1], self.mesh_num[1])
        z0 = np.reshape(np.transpose(np.tile(x, (self.mesh_num[1], 1))), [-1, 1])
        z1 = np.reshape(np.tile(y, (1, self.mesh_num[0])), [-1, 1])
        return np.concatenate((z0, z1), axis=1).astype(np.float32), x, y
