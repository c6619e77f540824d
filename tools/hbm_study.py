#!/usr/bin/env python
"""HBM-resident dataset sampling study: where does the synthetic-feed vs
device-dataset throughput gap (CIFAR b64: ~456 vs ~413 steps/s, bench.py)
come from, and can a different on-device batch-sampling strategy close it?

Variants measured (same fused-scan protocol as bench.py: K=16, 512-step
windows, value-fetch fenced):

  synthetic  : pre-staged f32 [K,B,...] batches (no gather, no decode) —
               the compute ceiling.
  base       : current build_device_data_step — per-scan-iteration
               jnp.take of B rows (uint8) + in-step decode.
  pregather  : ONE [K*B]-row gather per launch outside the scan, then
               scan over the staged [K,B,...] uint8 batches.
  pregather32: pregather, but decode uint8->f32 once at gather time (the
               scan sees f32 batches; 4x the staged bytes, no per-step
               decode).
  f32data    : current sampler over an f32-resident dataset (4x gather
               traffic, no decode).
  cursor     : epoch-style without-replacement: batches are contiguous
               dynamic slices of a (pre-permuted) dataset; zero gather on
               the hot path. (Closest to the reference's shuffled-epoch
               semantics, input_func.py:905-916 — re-permuting once per
               epoch costs one 150 MB gather every N/B steps.)

Usage: python tools/hbm_study.py [--arch cifar] [--steps 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config

BATCH = 64
SCAN_K = 16
WARMUP = 2


def _model_and_data(arch_name, dtype):
    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)

    fn, img = {"cifar": (cifar_architecture, 32),
               "stl": (stl_architecture, 48),
               "celeba": (celeba_architecture, 64),
               "lsun": (lsun_architecture, 64)}[arch_name]
    model = SNGan(fn(), num_class=0, loss_type="rep")
    n = 50000
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (n, img, img, 3), np.uint8)
    if dtype == "f32":
        data = jnp.asarray(raw.astype(np.float32) / 127.5 - 1.0)
    else:
        data = jnp.asarray(raw)
    return model, data, img


def _measure(fn, ts, args, steps):
    for _ in range(WARMUP):
        out = fn(ts, *args)
        ts = out[0]
    _ = float(np.asarray(jax.device_get(out[-1]["loss_gen"])).ravel()[-1])
    n_calls = steps // SCAN_K
    start = time.perf_counter()
    for _ in range(n_calls):
        out = fn(ts, *args)
        ts = out[0]
    _ = float(np.asarray(jax.device_get(out[-1]["loss_gen"])).ravel()[-1])
    dur = time.perf_counter() - start
    return n_calls * SCAN_K / dur


def run_variant(name, arch, steps):
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4], optimizer="adam")

    if name == "synthetic":
        model, _, img = _model_and_data(arch, "uint8")
        from mmdgan_tpu.train.step import build_multi_step
        ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
        step = jax.jit(build_multi_step(model, opt_d, opt_g, SCAN_K))
        rng = np.random.RandomState(0)
        batches = {
            "x": jnp.asarray(rng.randn(SCAN_K, BATCH, img, img, 3)
                             .astype(np.float32).clip(-1, 1)),
            "y": None,
        }
        t = jnp.asarray(True)
        return _measure(lambda ts_, b, t1, t2: step(ts_, b, t1, t2),
                        ts, (batches, t, t), steps)

    if name in ("base", "f32data"):
        from mmdgan_tpu.train.step import build_device_data_step
        dtype = "f32" if name == "f32data" else "uint8"
        model, data, _ = _model_and_data(arch, dtype)
        ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
        fn = jax.jit(build_device_data_step(
            model, opt_d, opt_g, num_steps=SCAN_K, batch_size=BATCH))
        t = jnp.asarray(True)

        def call(ts_, data_, rng_, t1, t2):
            ts2, rng2, m = fn(ts_, data_, None, rng_, t1, t2)
            return ts2, m
        return _measure(call, ts, (data, jax.random.PRNGKey(1), t, t), steps)

    if name in ("pregather", "pregather32"):
        model, data, _ = _model_and_data(arch, "uint8")
        ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
        step = build_train_step(model, opt_d, opt_g)
        n = data.shape[0]
        decode32 = name == "pregather32"

        def launch(ts_, data_, rng_, t1, t2):
            rng_, k = jax.random.split(rng_)
            idx = jax.random.randint(k, (SCAN_K * BATCH,), 0, n)
            xs = jnp.take(data_, idx, axis=0)
            if decode32:
                xs = xs.astype(jnp.float32) / 127.5 - 1.0
            xs = xs.reshape(SCAN_K, BATCH, *data_.shape[1:])

            def body(carry, x):
                return step(carry, {"x": x, "y": None}, t1, t2)

            ts2, ms = jax.lax.scan(body, ts_, xs)
            return ts2, rng_, ms

        fn = jax.jit(launch)
        t = jnp.asarray(True)

        def call(ts_, data_, rng_, t1, t2):
            ts2, rng2, m = fn(ts_, data_, rng_, t1, t2)
            return ts2, m
        return _measure(call, ts, (data, jax.random.PRNGKey(1), t, t), steps)

    if name == "cursor":
        model, data, _ = _model_and_data(arch, "uint8")
        ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
        step = build_train_step(model, opt_d, opt_g)
        n_batches = data.shape[0] // BATCH

        def launch(ts_, data_, cursor, t1, t2):
            def body(carry, _):
                ts_c, cur = carry
                x = jax.lax.dynamic_slice_in_dim(
                    data_, cur * BATCH, BATCH, axis=0)
                ts2, m = step(ts_c, {"x": x, "y": None}, t1, t2)
                return (ts2, (cur + 1) % n_batches), m

            (ts2, cur2), ms = jax.lax.scan(
                body, (ts_, cursor), None, length=SCAN_K)
            return ts2, cur2, ms

        fn = jax.jit(launch)
        t = jnp.asarray(True)

        def call(ts_, data_, cur, t1, t2):
            ts2, cur2, m = fn(ts_, data_, cur, t1, t2)
            return ts2, m
        return _measure(call, ts, (data, jnp.asarray(0), t, t), steps)

    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar",
                    choices=["cifar", "stl", "celeba", "lsun"])
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--variants", default="synthetic,base,pregather,"
                    "pregather32,f32data,cursor")
    args = ap.parse_args()

    results = {}
    for v in args.variants.split(","):
        sps = run_variant(v, args.arch, args.steps)
        results[v] = round(sps, 1)
        print(f"[hbm_study] {args.arch} {v}: {sps:.1f} steps/s",
              file=sys.stderr)
    print(json.dumps({"arch": args.arch, "steps": args.steps,
                      "steps_per_sec": results}))


if __name__ == "__main__":
    main()
