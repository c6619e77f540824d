"""SPMD data-parallel execution over a jax.sharding.Mesh."""

from mmdgan_tpu.parallel.mesh import DataParallel, make_mesh  # noqa: F401
