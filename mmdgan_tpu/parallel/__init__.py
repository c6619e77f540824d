"""SPMD data-parallel execution over a jax.sharding.Mesh."""

from mmdgan_tpu.parallel.mesh import (  # noqa: F401
    DataParallel,
    make_mesh,
    make_mesh_2d,
)
