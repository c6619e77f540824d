"""Backend selection helper.

On this development setup the default JAX platform is a tunneled TPU
chip registered by sitecustomize BEFORE any user code runs, so the
``JAX_PLATFORMS`` environment variable is silently ignored (jax is
already imported at interpreter startup). Forcing a backend therefore
requires ``jax.config.update`` after import — this helper is the one
place that recipe lives (tools/figure1.py, tools/quality_smoke.py,
tools/preflight.py and tests/conftest.py all need it).
"""

from __future__ import annotations


def force_platform(name: str) -> None:
    """Force the JAX backend (e.g. 'cpu', 'tpu').

    Must run before the first backend initialization (any device use);
    importing jax earlier is fine.
    """
    import jax

    jax.config.update("jax_platforms", name)
