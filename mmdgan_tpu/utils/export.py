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
) -> str:
    """Serialize ``generate(z) -> images`` with the weights closed over.

    :param model: SNGan instance
    :param params / net_state: trained (host or device) pytrees
    :param batch_size: static batch size of the exported entry point
    :return: written file path
    """
    import jax
    import jax.numpy as jnp

    host_params = jax.device_get(params)
    host_state = jax.device_get(net_state)

    def generate(z):
        gen_out, _ = model.Gen.apply(
            host_params["gen"], host_state["gen"], {"x": z, "y": None},
            train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    exported = jax.export.export(jax.jit(generate))(
        jax.ShapeDtypeStruct((batch_size, model.code_size), jnp.float32)
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def load_exported(path: str):
    """Load a serialized artifact; returns a callable ``fn(z) -> images``."""
    import jax

    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return jax.jit(exported.call)
