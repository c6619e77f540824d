#!/usr/bin/env python
"""Why is the exported 64x64 generator slower than the in-process jit?

docs/SERVING.md measured the deserialized StableHLO artifact at ~2-2.6x
below the in-process generator on the conv_transpose-heavy celeba/lsun
architectures (within noise on cifar/stl). This study isolates the
candidate causes by timing, per architecture and batch:

- ``model``      in-process ``jax.jit(generate)`` (weights closed over =
                 baked as constants in the jaxpr) — the reference point.
- ``exp_multi``  the shipped default: jax.export with
                 platforms=("cpu","tpu"), weights baked. Round-trips
                 through serialized StableHLO AND wraps the module in a
                 platform-index dispatch.
- ``exp_tpu``    platforms=("tpu",): same round-trip, no multi-platform
                 wrapping — isolates the platform-dispatch cost.
- ``exp_args``   single-platform export of ``generate(params, state, z)``
                 with the weights as call ARGUMENTS instead of baked
                 constants — isolates constant-layout/fusion effects of
                 baked weights in the serialized module.

Outcome drives export_generator defaults/documentation (pallas_study.md
methodology: measure, decide, document).

Usage: python tools/export_study.py [--arch celeba,lsun] [--batch 1024]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CALLS = 64
WARMUP = 3


def _fence(out):
    # one-element fetch: full-batch device_get serializes MBs through the
    # ~0.08 GB/s tunnel inside the window (tools/serving_bench.py)
    float(np.asarray(jax.device_get(out[(0,) * out.ndim])))


def _measure(call, *args):
    for _ in range(WARMUP):
        out = call(*args)
    _fence(out)
    start = time.perf_counter()
    for _ in range(CALLS):
        out = call(*args)
    _fence(out)
    n = args[-1].shape[0]  # z is always the last argument
    return CALLS * n / (time.perf_counter() - start)


def study(arch_name, batch):
    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)
    from mmdgan_tpu.models import SNGan

    fn = {"cifar": cifar_architecture, "stl": stl_architecture,
          "celeba": celeba_architecture, "lsun": lsun_architecture}[arch_name]
    model = SNGan(fn(), num_class=0, loss_type="rep")
    params, state, _ = model.init(jax.random.PRNGKey(0))
    host_params = jax.tree.map(jnp.asarray, jax.device_get(params))
    host_state = jax.tree.map(jnp.asarray, jax.device_get(state))

    def generate(z):
        gen_out, _ = model.Gen.apply(
            host_params["gen"], host_state["gen"], {"x": z, "y": None},
            train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    def generate_args(p, s, z):
        gen_out, _ = model.Gen.apply(
            p["gen"], s["gen"], {"x": z, "y": None}, train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    z = jax.device_put(np.random.RandomState(0)
                       .randn(batch, model.code_size).astype(np.float32))
    z_spec = jax.ShapeDtypeStruct((batch, model.code_size), jnp.float32)
    platform = jax.default_backend()
    out = {"arch": arch_name, "batch": batch, "platform": platform,
           "img_per_sec": {}}

    out["img_per_sec"]["model"] = round(_measure(jax.jit(generate), z), 1)

    with tempfile.TemporaryDirectory() as td:
        def rt(exported, name):
            """serialize -> deserialize round trip, like real serving."""
            path = os.path.join(td, name)
            with open(path, "wb") as f:
                f.write(exported.serialize())
            with open(path, "rb") as f:
                blob = f.read()
            return jax.jit(jax.export.deserialize(blob).call)

        e_multi = jax.export.export(
            jax.jit(generate), platforms=["cpu", "tpu"])(z_spec)
        out["img_per_sec"]["exp_multi"] = round(
            _measure(rt(e_multi, "multi"), z), 1)

        e_one = jax.export.export(
            jax.jit(generate), platforms=[platform])(z_spec)
        out["img_per_sec"]["exp_tpu"] = round(
            _measure(rt(e_one, "one"), z), 1)

        spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_params)
        sspec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_state)
        e_args = jax.export.export(
            jax.jit(generate_args), platforms=[platform])(
                spec, sspec, z_spec)
        dev_params = jax.device_put(host_params)
        dev_state = jax.device_put(host_state)
        out["img_per_sec"]["exp_args"] = round(
            _measure(rt(e_args, "args"), dev_params, dev_state, z), 1)

    base = out["img_per_sec"]["model"]
    out["vs_model"] = {k: round(v / base, 3)
                       for k, v in out["img_per_sec"].items()}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="celeba,lsun")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    for a in args.arch.split(","):
        res = study(a.strip(), args.batch)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
