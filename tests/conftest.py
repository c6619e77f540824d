"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard TPU-less way to test pjit/sharding code paths
(SURVEY.md §4): the XLA host platform is split into 8 virtual devices
before JAX initializes.
"""

import os

# Force CPU for tests even if the environment pre-registers a TPU platform
# (the axon sitecustomize imports jax before conftest runs, so the env var
# alone is not enough — set the config knob too, before any backend use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
