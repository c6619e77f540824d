"""Model export for serving: serialize the generator (or any jitted
function of the trained params) to a portable StableHLO artifact via
``jax.export``.

The artifact is self-contained (weights baked in as constants or carried
as inputs), loadable without the model-building code, and runnable on any
backend that can compile StableHLO — the deployment story the TF1
reference lacked entirely (its serving path was "restore the ckpt into a
rebuilt graph").
"""

from __future__ import annotations

import os



def export_generator(
    model,
    params,
    net_state,
    batch_size: int,
    out_path: str,
    platforms=("cpu", "tpu"),
    mesh=None,
    axis: str = "data",
) -> str:
    """Serialize ``generate(z) -> images`` with the weights closed over.

    Conditional models (``model.num_class >= 2``) export a two-input
    entry point ``generate(z, y) -> images`` with ``y`` an int32
    ``[batch, 1]`` class-label column (the cbn/cck conditioning input);
    unconditional models keep the single-input ``generate(z)``.

    :param model: SNGan instance
    :param params / net_state: trained (host or device) pytrees
    :param batch_size: static batch size of the exported entry point.
        With ``mesh`` this is the GLOBAL batch (must divide by the mesh
        size).
    :param platforms: lowering targets baked into the artifact. An
        exported function REFUSES to run on a platform it was not
        lowered for, so the default covers both cpu and tpu — export
        on a CPU host, serve on a TPU chip (or vice versa). Pass a
        single-element tuple to shave artifact size.
    :param mesh: export a DATA-PARALLEL (pod-slice) entry point: ``z``
        (and ``y``) arrive batch-sharded over ``axis`` of this
        ``jax.sharding.Mesh``, weights are replicated, the output comes
        back batch-sharded — zero-collective multi-chip serving from
        one artifact. The artifact records the device count; call it
        on a same-sized mesh with same-sharded inputs. Output equals
        the sharded in-process generator bitwise (tested).
    :return: written file path
    """
    import jax
    import jax.numpy as jnp

    # jnp constants, not host numpy: ops that index a weight by a traced
    # label (cbn/cck) would call __array__ on the tracer otherwise
    host_params = jax.tree.map(jnp.asarray, jax.device_get(params))
    host_state = jax.tree.map(jnp.asarray, jax.device_get(net_state))
    conditional = getattr(model, "num_class", 0) >= 2

    def generate(z, y=None):
        gen_out, _ = model.Gen.apply(
            host_params["gen"], host_state["gen"], {"x": z, "y": y},
            train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        assert batch_size % mesh.size == 0, (batch_size, mesh.size)
        sharding = NamedSharding(mesh, PartitionSpec(axis))
        jit_fn = jax.jit(generate, in_shardings=sharding,
                         out_shardings=sharding)
    else:
        jit_fn = jax.jit(generate)

    z_spec = jax.ShapeDtypeStruct((batch_size, model.code_size),
                                  jnp.float32, sharding=sharding)
    export_fn = jax.export.export(jit_fn, platforms=list(platforms))
    if conditional:
        y_spec = jax.ShapeDtypeStruct((batch_size, 1), jnp.int32,
                                      sharding=sharding)
        exported = export_fn(z_spec, y_spec)
    else:
        exported = export_fn(z_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def load_exported(path: str):
    """Load a serialized artifact; returns a callable ``fn(z) -> images``
    (``fn(z, y)`` for conditional exports)."""
    import jax

    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return jax.jit(exported.call)
