#!/usr/bin/env python
"""Reproducible per-op / per-source-line profile of the fused train step.

Round-1's xprof analysis (CLAUDE.md "Measured performance") was ad hoc;
this tool makes it a one-command artifact:

  python tools/profile_step.py [--arch cifar] [--loss rep] [--batch 64]

It runs warm scan-fused steps under ``jax.profiler.trace``, converts the
dumped ``xplane.pb`` with ``xprof.convert.raw_to_tool_data`` (the
framework_op_stats tool), and prints:

  1. top HLO/framework ops by self-time with their share of the step,
  2. the same aggregated by python source line (the HLO metadata join),
  3. device-time totals so the shares can be sanity-checked against the
     measured steps/s.

Run on the TPU backend; CPU works but profiles the wrong thing.
"""

import argparse
import glob
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_trace(arch, loss, batch, scan_k, calls):
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
    for _ in range(3):  # compile + warm
        ts, m = step(ts, batches, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    trace_dir = tempfile.mkdtemp(prefix="mmdgan_profile_")
    with jax.profiler.trace(trace_dir):
        for _ in range(calls):
            ts, m = step(ts, batches, t, t)
        float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    return paths[0]


def op_table(xplane_path):
    """Rows of (op_name, source_info, self_us, occurrences) from the
    framework_op_stats csv."""
    import csv

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar",
                    choices=["cifar", "stl", "celeba", "lsun"])
    ap.add_argument("--loss", default="rep")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan-k", type=int, default=16)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}; arch={args.arch} "
          f"loss={args.loss} b={args.batch} K={args.scan_k}", flush=True)
    xplane = collect_trace(args.arch, args.loss, args.batch,
                           args.scan_k, args.calls)
    rows = op_table(xplane)
    if not rows:
        print("no op rows parsed — inspect", xplane)
        return

    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] not in ("", None):
                try:
                    return float(row[n])
                except ValueError:
                    pass
        return default

    # column names vary across xprof versions; probe the common ones
    key_time = None
    for cand in ("total_self_time_in_us", "self_time_in_us", "Total self-time (us)"):
        if cand in rows[0]:
            key_time = cand
            break
    if key_time is None:
        print("available columns:", sorted(rows[0]))
        raise SystemExit("unknown framework_op_stats schema")
    device_rows = [r for r in rows
                   if r.get("host_or_device", "Device").lower() != "host"]
    total = sum(f(r, key_time) for r in device_rows) or 1.0

    print(f"\n## Top {args.top} device ops by self-time "
          f"(total {total/1e3:.1f} ms over {args.calls*args.scan_k} steps)\n")
    print("| % | self ms | occurrences | op | source |")
    print("|---|---------|-------------|----|--------|")
    for r in sorted(device_rows, key=lambda r: -f(r, key_time))[:args.top]:
        name = (r.get("operation") or r.get("op_name") or "?")[:60]
        src = (r.get("source_info") or r.get("Source Info") or "")[-50:]
        occ = int(f(r, "occurrences", "Occurrences", default=0))
        print(f"| {100*f(r, key_time)/total:5.1f} | "
              f"{f(r, key_time)/1e3:8.2f} | {occ:5d} | {name} | {src} |")

    by_src = {}
    for r in device_rows:
        src = (r.get("source_info") or "").strip() or "(no source)"
        by_src[src] = by_src.get(src, 0.0) + f(r, key_time)
    print(f"\n## Aggregated by source line (top {args.top})\n")
    print("| % | self ms | source line |")
    print("|---|---------|-------------|")
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"| {100*us/total:5.1f} | {us/1e3:8.2f} | {src[-70:]} |")
    print(f"\nxplane: {xplane}")


if __name__ == "__main__":
    main()
