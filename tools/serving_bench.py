#!/usr/bin/env python
"""Serving-path benchmark: generator inference throughput (images/s).

Measures the two deployment surfaces:

- ``model``: the in-process jitted generator (eval mode, weights on
  device) — the eval_sampling / mdl_score path.
- ``export``: the serialized StableHLO artifact (``utils/export.py``)
  deserialized and executed — the portable serving story the TF1
  reference lacked (it re-built the graph and restored a ckpt).

Protocol mirrors bench.py: warmup calls, a timed window, and a value
fetch as the fence (block_until_ready under-reports on tunneled
backends). Batch sweep shows where the generator saturates the chip.

Usage: python tools/serving_bench.py [--arch cifar] [--batches 64,256,1024]
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

from mmdgan_tpu.models import SNGan

CALLS = 64
WARMUP = 3


def _model(arch_name):
    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)

    fn = {"cifar": cifar_architecture, "stl": stl_architecture,
          "celeba": celeba_architecture, "lsun": lsun_architecture}[arch_name]
    return SNGan(fn(), num_class=0, loss_type="rep")


def _fence(out):
    # Fetch ONE element as the completion fence: device_get of the full
    # image batch would move megabytes over the ~0.08 GB/s tunnel inside
    # the timed window (15-20% throughput bias at 64x64 b1024). bench.py
    # fences on a scalar metric for the same reason.
    float(np.asarray(jax.device_get(out[(0,) * out.ndim])))


def _measure(call, z):
    for _ in range(WARMUP):
        out = call(z)
    _fence(out)
    start = time.perf_counter()
    for _ in range(CALLS):
        out = call(z)
    _fence(out)
    return CALLS * z.shape[0] / (time.perf_counter() - start)


def bench(arch_name, batches):
    model = _model(arch_name)
    params, state, _ = model.init(jax.random.PRNGKey(0))

    def generate(z):
        gen_out, _ = model.Gen.apply(
            params["gen"], state["gen"], {"x": z, "y": None}, train=False)
        return jnp.clip(gen_out["x"], -1.0, 1.0)

    gen_jit = jax.jit(generate)
    out = {"arch": arch_name, "model_img_per_sec": {},
           "export_img_per_sec": {}}
    for b in batches:
        z = jax.device_put(np.random.RandomState(0)
                           .randn(b, model.code_size).astype(np.float32))
        ips = _measure(gen_jit, z)
        out["model_img_per_sec"][b] = round(ips, 1)
        print(f"[serving] {arch_name} b{b} model: {ips:,.0f} img/s",
              file=sys.stderr)

    # exported artifact round-trip at the largest batch
    from mmdgan_tpu.utils.export import export_generator, load_exported

    b = batches[-1]
    with tempfile.TemporaryDirectory() as td:
        path = export_generator(model, params, state, b,
                                os.path.join(td, "gen.stablehlo"))
        served = load_exported(path)
        z = jax.device_put(np.random.RandomState(0)
                           .randn(b, model.code_size).astype(np.float32))
        ips = _measure(served, z)
        out["export_img_per_sec"][b] = round(ips, 1)
        print(f"[serving] {arch_name} b{b} export: {ips:,.0f} img/s",
              file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar",
                    choices=["cifar", "stl", "celeba", "lsun", "all"])
    ap.add_argument("--batches", default="64,256,1024")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    archs = (["cifar", "stl", "celeba", "lsun"] if args.arch == "all"
             else [args.arch])
    for a in archs:
        print(json.dumps(bench(a, batches)))


if __name__ == "__main__":
    main()
