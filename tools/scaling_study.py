#!/usr/bin/env python
"""Reproducible queue-depth (scan K) and per-chip batch-size scaling study.

Round-1 measured these ad hoc (CLAUDE.md prose); this makes the numbers
a one-command artifact on whatever chip is attached:

  python tools/scaling_study.py [--arch cifar] [--loss rep]

Two sweeps over the synthetic-feed fused train step, value-fetch fenced:
  1. scan-K sweep at fixed batch: how many steps per device launch are
     needed to amortize the ~30 ms tunneled-host dispatch+sync cost;
  2. batch sweep at fixed K: throughput vs per-chip batch (reports both
     steps/s and images/s — images/s keeps rising after steps/s falls).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(arch, loss, batch, scan_k, steps):
    import jax
    import jax.numpy as jnp

    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_multi_step

    arch_fn, img = {
        "cifar": (cifar_architecture, 32), "stl": (stl_architecture, 48),
        "celeba": (celeba_architecture, 64), "lsun": (lsun_architecture, 64),
    }[arch]
    model = SNGan(arch_fn(), num_class=0, loss_type=loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    step = jax.jit(build_multi_step(model, opt_d, opt_g, scan_k))
    rng = np.random.RandomState(0)
    batches = {
        "x": jnp.asarray(
            rng.randn(scan_k, batch, img, img, 3).astype(np.float32).clip(-1, 1)),
        "y": None,
    }
    t = jnp.asarray(True)
    for _ in range(2):
        ts, m = step(ts, batches, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = max(steps // scan_k, 2)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        ts, m = step(ts, batches, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - t0
    return n_calls * scan_k / dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar",
                    choices=["cifar", "stl", "celeba", "lsun"])
    ap.add_argument("--loss", default="rep")
    ap.add_argument("--steps", type=int, default=384)
    ap.add_argument("--k-sweep", default="1,2,4,8,16,32,64")
    ap.add_argument("--batch-sweep", default="16,32,64,128,256")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}; arch={args.arch} "
          f"loss={args.loss}\n")

    print("## scan-K sweep (batch 64) — dispatch amortization\n")
    print("| K | steps/s |")
    print("|---|---------|")
    for k in [int(v) for v in args.k_sweep.split(",")]:
        sps = measure(args.arch, args.loss, 64, k, args.steps)
        print(f"| {k:3d} | {sps:8.1f} |", flush=True)

    print("\n## batch sweep (K=16) — per-chip batch scaling\n")
    print("| batch | steps/s | images/s |")
    print("|-------|---------|----------|")
    for b in [int(v) for v in args.batch_sweep.split(",")]:
        sps = measure(args.arch, args.loss, b, 16, args.steps)
        print(f"| {b:5d} | {sps:8.1f} | {sps*b:9.0f} |", flush=True)


if __name__ == "__main__":
    main()
