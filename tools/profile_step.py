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
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_trace(arch, loss, batch, scan_k, calls, micro_batches=1):
    import jax
    import jax.numpy as jnp

    from experiments.architectures import (
        celeba_architecture, cifar_architecture, hd_architecture,
        lsun_architecture, stl_architecture)
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_multi_step

    arch_fn, img = {
        "cifar": (cifar_architecture, 32), "stl": (stl_architecture, 48),
        "celeba": (celeba_architecture, 64), "lsun": (lsun_architecture, 64),
        "hd128": (lambda: hd_architecture(128), 128),
        "hd256": (lambda: hd_architecture(256), 256),
        "hd512": (lambda: hd_architecture(512), 512),
    }[arch]
    model = SNGan(arch_fn(), num_class=0, loss_type=loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    rng = np.random.RandomState(0)
    t = jnp.asarray(True)
    if micro_batches > 1:
        # HBM-resident dataset + on-device gather + exact micro-batch
        # accumulation. (Round 5: the fused b64 step FITS at 512² after
        # all and is ~3x faster — micro>1 remains the beyond-HBM
        # escape-hatch profile, docs/SCALING.md.)
        from mmdgan_tpu.train.step import build_device_data_step

        fn = jax.jit(build_device_data_step(
            model, opt_d, opt_g, num_steps=scan_k, batch_size=batch,
            micro_batches=micro_batches))
        data = jnp.asarray(rng.randint(0, 256, (4 * batch, img, img, 3),
                                       np.uint8))
        key = jax.random.PRNGKey(1)

        def step(ts):
            nonlocal key
            ts, key, m = fn(ts, data, None, key, t, t)
            return ts, m
    else:
        fused = jax.jit(build_multi_step(model, opt_d, opt_g, scan_k))
        batches = {
            "x": jnp.asarray(rng.randn(scan_k, batch, img, img, 3)
                             .astype(np.float32).clip(-1, 1)),
            "y": None,
        }

        def step(ts):
            return fused(ts, batches, t, t)

    for _ in range(3):  # compile + warm
        ts, m = step(ts)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    trace_dir = tempfile.mkdtemp(prefix="mmdgan_profile_")
    with jax.profiler.trace(trace_dir):
        for _ in range(calls):
            ts, m = step(ts)
        float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    return paths[0]


def op_table(xplane_path):
    """Parse the hlo_stats gviz DataTable into dict rows (keys = column
    ids: category, hlo_op_name, tf_op_name, occurrences,
    total_self_time, source_info, bound_by, ...)."""
    import json

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    if isinstance(obj, list):
        obj = obj[0]
    import re

    ids = [c["id"] for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        cells = [cell.get("v") if cell else None for cell in r["c"]]
        row = dict(zip(ids, cells))
        if row.get("source_info"):  # rendered as an HTML cell; strip tags
            row["source_info"] = re.sub(r"<[^>]*>", "", str(row["source_info"]))
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar",
                    choices=["cifar", "stl", "celeba", "lsun", "hd128",
                             "hd256", "hd512"])
    ap.add_argument("--loss", default="rep")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan-k", type=int, default=16)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--micro-batches", type=int, default=1,
                    help="profile the accumulated device-data step "
                         "instead of the fused host-fed one (the "
                         "beyond-HBM escape hatch; all archs incl. "
                         "hd512 fit FUSED on the v5e)")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}; arch={args.arch} "
          f"loss={args.loss} b={args.batch} K={args.scan_k} "
          f"micro={args.micro_batches}", flush=True)
    xplane = collect_trace(args.arch, args.loss, args.batch,
                           args.scan_k, args.calls, args.micro_batches)
    rows = op_table(xplane)
    if not rows:
        print("no op rows parsed — inspect", xplane)
        return

    def f(row, name, default=0.0):
        v = row.get(name)
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    total = sum(f(r, "total_self_time") for r in rows) or 1.0
    steps = args.calls * args.scan_k

    print(f"\n## Top {args.top} HLO ops by self-time "
          f"(device total {total/1e3:.1f} ms over {steps} steps = "
          f"{total/steps/1e3:.2f} ms/step)\n")
    print("| % | self ms | occ | category | framework op | bound by | source |")
    print("|---|---------|-----|----------|--------------|----------|--------|")
    for r in sorted(rows, key=lambda r: -f(r, "total_self_time"))[:args.top]:
        tf_op = (r.get("tf_op_name") or "?").split("/")[-1][:45]
        src = (r.get("source_info") or "")[-40:]
        print(f"| {100*f(r, 'total_self_time')/total:5.1f} | "
              f"{f(r, 'total_self_time')/1e3:8.2f} | "
              f"{int(f(r, 'occurrences')):4d} | "
              f"{(r.get('category') or '?')[:22]} | {tf_op} | "
              f"{(r.get('bound_by') or '')[:10]} | {src} |")

    by_src = {}
    for r in rows:
        src = (r.get("source_info") or "").strip() or "(no source)"
        by_src[src] = by_src.get(src, 0.0) + f(r, "total_self_time")
    print(f"\n## Aggregated by source line (top {args.top})\n")
    print("| % | self ms | source line |")
    print("|---|---------|-------------|")
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"| {100*us/total:5.1f} | {us/1e3:8.2f} | {src[-70:]} |")

    by_cat = {}
    for r in rows:
        cat = r.get("category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + f(r, "total_self_time")
    print("\n## By HLO category\n")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {100*us/total:5.1f}%  {us/1e3:8.2f} ms  {cat}")
    print(f"\nxplane: {xplane}")


if __name__ == "__main__":
    main()
