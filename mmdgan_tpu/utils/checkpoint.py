"""Checkpoint inspection / rollback utilities.

Rebuild of graph_func.py:399-443 (``get_ckpt``, ``print_tensor_in_ckpt``)
and :606-638 (``rollback``) on Orbax: list checkpoints, inspect the stored
pytree structure, and evaluate arbitrary functions of a restored state
without a training loop.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax


def _manager(ckpt_folder: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(os.path.abspath(ckpt_folder))


def get_ckpt(ckpt_folder: str, ckpt_step: Optional[int] = None) -> Optional[int]:
    """Latest (or pinned) checkpoint step in a folder (graph_func.py:399-416).
    Returns None when the folder holds no checkpoints."""
    mgr = _manager(ckpt_folder)
    steps = mgr.all_steps()
    if not steps:
        return None
    if ckpt_step is not None:
        return ckpt_step if ckpt_step in steps else None
    return max(steps)


def list_ckpt_steps(ckpt_folder: str) -> Sequence[int]:
    return sorted(_manager(ckpt_folder).all_steps())


def print_tensor_in_ckpt(ckpt_folder: str, step: Optional[int] = None) -> dict:
    """Print (and return) {path: (shape, dtype)} of everything stored in a
    checkpoint (graph_func.py:419-443)."""
    import orbax.checkpoint as ocp

    step = get_ckpt(ckpt_folder, step)
    if step is None:
        print(f"No checkpoint found in {ckpt_folder}")
        return {}
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    meta = ckptr.metadata(
        os.path.join(os.path.abspath(ckpt_folder), str(step), "default"))
    tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") else meta
    out = {}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}[{i}]")
        else:
            shape = getattr(node, "shape", None)
            dtype = getattr(node, "dtype", None)
            out[prefix] = (tuple(shape) if shape is not None else None, str(dtype))

    walk(tree)
    for path, (shape, dtype) in sorted(out.items()):
        print(f"{path}: shape={shape} dtype={dtype}")
    return out


def rollback(
    abstract_state: Any,
    ckpt_folder: str,
    fn: Optional[Callable] = None,
    ckpt_step: Optional[int] = None,
) -> Tuple[Any, int]:
    """Restore a checkpoint into the structure of ``abstract_state`` and
    optionally evaluate ``fn(state)`` (graph_func.py:606-638 — restoring
    into a fresh graph to evaluate var_list). Returns (value, step)."""
    import orbax.checkpoint as ocp

    step = get_ckpt(ckpt_folder, ckpt_step)
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_folder}")
    mgr = _manager(ckpt_folder)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    value = fn(restored) if fn is not None else restored
    return value, step
