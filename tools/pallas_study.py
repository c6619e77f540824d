#!/usr/bin/env python
"""Decide the fused Pallas MMD kernel's fate with data (VERDICT r1 item 6).

Two measurements on the current default backend (run on the TPU chip):

1. **Kernel microbench** — ``fused_kernel_means`` (Pallas) vs the plain-JAX
   reference reductions, forward-only and forward+grad, for
   (B, d) in {64, 256} x {16, 256}. Each timing is one jitted
   ``lax.scan`` of N iterations (per-iteration input perturbation defeats
   CSE), fenced by a host fetch of the accumulated value.

2. **Full train step** — CIFAR SNGAN with ``use_pallas`` on/off for
   loss in {rep, rmb, rmb_gp} at B in {64, 256} (scan K=16). rmb_gp
   exercises the witness-penalty regime the kernel also feeds
   (losses.py routes rep_gp/rmb_gp through the same _repulsive paths).

Prints a markdown table to stdout; paste into docs/ when re-run.

  python tools/pallas_study.py [--steps 512] [--micro-iters 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax

    return float(np.asarray(jax.device_get(x)))


def micro_bench(B, d, n_iter, with_grad, use_pallas, repeats=5):
    """Seconds per iteration for the six-means reduction."""
    import jax
    import jax.numpy as jnp

    from mmdgan_tpu.ops.pallas_mmd import _means_reference, fused_kernel_means

    fn = fused_kernel_means if use_pallas else (
        lambda a, b, s: _means_reference(a, b, s))

    def scalar(sg, sx):
        e = fn(sg, sx, 1.0)
        return e[0] - 2.0 * e[1] + e[2] + 0.1 * (e[3] - e[4] + e[5])

    def body(carry, x):
        sg, sx = carry
        sg = sg + x * 1e-6  # defeat CSE across iterations
        if with_grad:
            v, g = jax.value_and_grad(scalar)(sg, sx)
            sg = sg + 1e-6 * g
        else:
            v = scalar(sg, sx)
        return (sg, sx), v

    @jax.jit
    def run(sg, sx, xs):
        (sg, _), vs = jax.lax.scan(body, (sg, sx), xs)
        return vs.sum() + sg.sum() * 0.0

    rng = np.random.RandomState(0)
    sg = jnp.asarray(rng.randn(B, d).astype(np.float32))
    sx = jnp.asarray(rng.randn(B, d).astype(np.float32))
    xs = jnp.asarray(rng.randn(n_iter).astype(np.float32))

    fence(run(sg, sx, xs))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(run(sg, sx, xs))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def step_bench(loss_type, batch, use_pallas, steps=512, scan_k=16):
    """Full fused-train-step steps/s on the CIFAR architecture."""
    import jax
    import jax.numpy as jnp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_multi_step

    model = SNGan(cifar_architecture(), num_class=0, loss_type=loss_type,
                  use_pallas=use_pallas)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    step = jax.jit(build_multi_step(model, opt_d, opt_g, scan_k))
    rng = np.random.RandomState(0)
    batches = {
        "x": jnp.asarray(
            rng.randn(scan_k, batch, 32, 32, 3).astype(np.float32).clip(-1, 1)),
        "y": None,
    }
    t = jnp.asarray(True)
    for _ in range(2):
        ts, m = step(ts, batches, t, t)
    fence(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = max(steps // scan_k, 1)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        ts, m = step(ts, batches, t, t)
    _ = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - t0
    return n_calls * scan_k / dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--micro-iters", type=int, default=512)
    ap.add_argument("--skip-step-bench", action="store_true")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})\n")

    print("## Kernel microbench (us/iter, scan-fused, lower is better)\n")
    print("| B | d | fwd ref | fwd pallas | fwd+grad ref | fwd+grad pallas |")
    print("|---|---|---------|------------|--------------|-----------------|")
    for B in (64, 256):
        for d in (16, 256):
            row = [f"| {B} | {d} |"]
            for grad in (False, True):
                for pallas in (False, True):
                    us = micro_bench(B, d, args.micro_iters, grad, pallas) * 1e6
                    row.append(f" {us:.2f} |")
            print("".join(row), flush=True)

    if args.skip_step_bench:
        return
    print("\n## Full CIFAR train step (steps/s, higher is better)\n")
    print("| loss | batch | ref | pallas | delta |")
    print("|------|-------|-----|--------|-------|")
    for loss in ("rep", "rmb", "rmb_gp"):
        for batch in (64, 256):
            ref = step_bench(loss, batch, False, steps=args.steps)
            pal = step_bench(loss, batch, True, steps=args.steps)
            print(f"| {loss} | {batch} | {ref:.1f} | {pal:.1f} | "
                  f"{(pal / ref - 1) * 100:+.1f}% |", flush=True)


if __name__ == "__main__":
    main()
