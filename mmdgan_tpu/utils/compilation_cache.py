"""Persistent XLA compilation cache for fast restarts.

The TF1 reference rebuilt and re-optimized its graph on every process
start. Under JAX the equivalent tax is XLA compilation of the train /
serving step on first call; the persistent compilation cache writes the
compiled executable to disk keyed by (HLO, compile options, backend) so
a restarted process — checkpoint resume, the next 12.5k-step chunk in a
my_test_cifar.py-style protocol, a re-spawned serving worker — skips
straight to execution.

Measured on the tunneled v5e chip: the CIFAR scan-fused K=16 train step
compiles in 9.7 s cold and 1.8 s from the cache (5.4x); the plain step
10.8 s -> 2.2 s. Works on both the TPU and CPU backends here.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str,
                             min_compile_seconds: float = 1.0) -> str:
    """Turn on the persistent compilation cache rooted at ``cache_dir``.

    Call once, any time before the first ``jit`` compilation (importing
    jax earlier is fine). Safe to share the directory between processes
    and backends — entries are content-addressed; concurrent writers of
    the same key are benign.

    :param cache_dir: directory for compiled-executable blobs (created
        if missing).
    :param min_compile_seconds: only persist compilations that took at
        least this long (skip trivia like reshapes; 0 persists all).
    :return: the cache directory, for logging.
    """
    import jax

    cache_dir = os.fspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    # default also gates on entry size; -1 defers to the time gate only
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
