#!/usr/bin/env python
"""Benchmark: SNGAN train-step throughput across the reference's four
dataset architectures, plus the HBM-resident real-data path.

Prints ONE JSON line per metric:
  {"metric": "...", "value": N, "unit": "steps/sec", "vs_baseline": N}

The flagship CIFAR line is printed FIRST (so a partial run still records
the headline) and repeated LAST (so last-line parsers also get it).
Single-arch mode: ``--arch cifar|stl|celeba|lsun`` emits just that line.

Baselines: the reference (TF 1.8, single GPU, graph_func.py:944-946
duration logging) publishes no throughput numbers; BASELINE.md directs us
to characterize it. We assume 12 steps/sec for the TF1-GPU batch-64
SN-DCGAN at 32x32 (typical for TF1.8 + cuDNN7 on the era's hardware) and
pixel-scale it for the larger architectures (conv FLOPs in this family
grow ~linearly with the pixel count): stl48 12*(32/48)^2 = 5.33,
celeba/lsun 64 -> 3.0.
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

# assumed TF1-GPU figures (see module docstring); hd128 extrapolates the
# same pixel scaling past the reference's 64x64 cap (no reference
# experiment exists at 128² — the ratio is vs what the TF1 stack WOULD
# do if it scaled)
BASELINES = {"cifar": 12.0, "stl": 12.0 * (32.0 / 48.0) ** 2,
             "celeba": 12.0 * (32.0 / 64.0) ** 2,
             "lsun": 12.0 * (32.0 / 64.0) ** 2,
             "hd128": 12.0 * (32.0 / 128.0) ** 2,
             "hd256": 12.0 * (32.0 / 256.0) ** 2,
             "hd512": 12.0 * (32.0 / 512.0) ** 2}
# vs_baseline provenance: the TF1-GPU figure itself remains an estimate
# (the reference publishes no throughput numbers and its TF1.8 GPU stack
# cannot run here), but it is now ANCHORED by a same-host measurement:
# tools/tf1_baseline.py times the reference's own sess.run train step on
# this host's CPU vs ours on the identical config (see BASELINE.md,
# "Measured software-stack anchor").
BASELINE_NOTE = ("assumed 12 steps/s TF1-GPU at 32x32, pixel-scaled; "
                 "anchored by the measured same-host CPU ratio "
                 "(tools/tf1_baseline.py, BASELINE.md)")

BATCH = 64
SCAN_K = 16     # steps fused per launch (lax.scan) — amortizes dispatch
WARMUP_CALLS = 2
MEASURE_STEPS = 512


def _arch_and_img(name):
    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)

    from experiments.architectures import hd_architecture

    builder, img = {
        "cifar": (cifar_architecture, 32),
        "stl": (stl_architecture, 48),
        "celeba": (celeba_architecture, 64),
        "lsun": (lsun_architecture, 64),
        "hd128": (lambda: hd_architecture(128), 128),
        "hd256": (lambda: hd_architecture(256), 256),
        "hd512": (lambda: hd_architecture(512), 512),
    }[name]
    return builder(), img


def bench_arch(name, dp, bf16_moments=False, loss="rep",
               measure_steps=None, data="noise"):
    """Synthetic-feed throughput for one architecture; returns the metric
    dict. Timings force a host fetch of final metric values —
    block_until_ready alone under-reports on tunneled backends.

    ``loss`` selects the GANLoss branch. The default noise-fed rep lines
    run in a degenerate regime (cifar saturates e_kxx->1, celeba/lsun
    collapse to 0 — near-zero gradients), so ``--arch all`` also emits
    rmb lines plus one ``data="blobs"`` line: the structured blob target
    (tools/quality_smoke.py) that every quality run LEARNS on — its loss
    moves mid-band during the measure window, so the rep-vs-rmb-vs-
    learning deltas measure regime-(in)sensitivity of the throughput
    record (VERDICT r4 weak #1)."""
    measure_steps = measure_steps or MEASURE_STEPS
    arch, img = _arch_and_img(name)
    model = SNGan(arch, num_class=0, loss_type=loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4], optimizer="adam",
                                    bf16_moments=bf16_moments)
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    from mmdgan_tpu.train.step import build_multi_step

    step = dp.compile_step(build_multi_step(model, opt_d, opt_g, SCAN_K))
    ts = dp.replicate(ts)

    if data == "blobs":
        from tools.quality_smoke import blob_batches

        it = blob_batches(BATCH, size=img, seed=0)
        x = np.stack([next(it)["x"] for _ in range(SCAN_K)])
    else:
        rng = np.random.RandomState(0)
        x = rng.randn(SCAN_K, BATCH, img, img, 3).astype(np.float32).clip(-1, 1)
    batches = dp.shard_multi_batch({"x": x, "y": None})
    t = jnp.asarray(True)

    for _ in range(WARMUP_CALLS):
        ts, m = step(ts, batches, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = measure_steps // SCAN_K
    start = time.perf_counter()
    for _ in range(n_calls):
        ts, m = step(ts, batches, t, t)
    final_loss = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - start
    # health scalar: e_kxx -> 1 means the saturated-rep collapse mode —
    # a numerics regression a pure-throughput line can't see
    e_kxx = float(np.asarray(jax.device_get(m["e_kxx"]))[-1])

    steps_per_sec = n_calls * SCAN_K / dur
    n_chips = dp.num_devices
    per_chip = steps_per_sec / max(n_chips, 1) if n_chips > 1 else steps_per_sec
    tag = name if str(img) in name else f"{name}{img}"
    dtag = "" if data == "noise" else f", {data}"
    print(
        f"[bench] {tag} ({loss}{dtag}): {steps_per_sec:.2f} steps/s total "
        f"on {n_chips} chip(s); loss_gen={final_loss:.4f} e_kxx={e_kxx:.4f}",
        file=sys.stderr,
    )
    label = {"cifar": "cifar10"}.get(name, None)
    if label is None:
        label = name if name.startswith("hd") else name + str(img)
    dsuffix = "" if data == "noise" else "_blobdata"
    return {
        "metric": f"{label}_sngan_{loss}_b64{dsuffix}"
                  "_train_steps_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "steps/sec",
        "vs_baseline": round(per_chip / BASELINES[name], 3),
        "baseline": BASELINE_NOTE,
        "loss_gen": round(final_loss, 4),
        "e_kxx": round(e_kxx, 4),
    }


def bench_hd512(dp, loss="rep", micro_batches=1, rows=256,
                measure_steps=128):
    """512² throughput line: HBM-resident uint8 dataset + on-device
    batch gather (build_device_data_step). The FUSED b64 step fits one
    chip after all (round-5 micro sweep, docs/SCALING.md: fused 7.3
    steps/s vs 2.5 at micro8 — small micros re-read the 58.3 M params
    from HBM per pass), so micro_batches=1 is the production
    configuration; the micro8 line stays benched as the
    exact-accumulation record for beyond-HBM regimes. Short measure
    window — the step is ~60x slower than cifar."""
    from mmdgan_tpu.train.step import build_device_data_step

    arch, img = _arch_and_img("hd512")
    model = SNGan(arch, num_class=0, loss_type=loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    fn = jax.jit(build_device_data_step(
        model, opt_d, opt_g, num_steps=SCAN_K, batch_size=BATCH,
        micro_batches=micro_batches))
    data = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (rows, img, img, 3), np.uint8))
    jax.block_until_ready(data)
    rng = jax.random.PRNGKey(1)
    t = jnp.asarray(True)
    for _ in range(WARMUP_CALLS):
        ts, rng, m = fn(ts, data, None, rng, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = max(measure_steps // SCAN_K, 1)
    start = time.perf_counter()
    for _ in range(n_calls):
        ts, rng, m = fn(ts, data, None, rng, t, t)
    final_loss = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - start
    e_kxx = float(np.asarray(jax.device_get(m["e_kxx"]))[-1])
    steps_per_sec = n_calls * SCAN_K / dur
    print(f"[bench] hd512 ({loss}, micro{micro_batches}): "
          f"{steps_per_sec:.2f} steps/s; loss_gen={final_loss:.4f} "
          f"e_kxx={e_kxx:.4f}", file=sys.stderr)
    return {
        "metric": f"hd512_sngan_{loss}_b64_micro{micro_batches}"
                  "_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / BASELINES["hd512"], 3),
        "baseline": BASELINE_NOTE,
        "loss_gen": round(final_loss, 4),
        "e_kxx": round(e_kxx, 4),
    }


def bench_hbm_dataset(dp, sampling="uniform"):
    """Real-data path: CIFAR-sized uint8 dataset resident in HBM, batches
    sampled on device (the content is synthetic; the measured cost —
    sampling + uint8 decode + train step, zero host link — is the same).
    ``sampling="shuffled_epochs"`` benches the epoch-slice sampler
    (tools/hbm_study.py); its once-per-781-steps epoch re-permutation is
    outside this 512-step window and costs ~one dataset pass of HBM
    bandwidth (<0.1% amortized)."""
    from mmdgan_tpu.train.step import build_device_data_step

    arch, img = _arch_and_img("cifar")
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4], optimizer="adam")
    ts = dp.replicate(init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g))
    builder = build_device_data_step(
        model, opt_d, opt_g, num_steps=SCAN_K, batch_size=BATCH,
        sampling=sampling)
    fn = jax.jit(builder)
    data = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (50000, img, img, 3), np.uint8))
    rng = jax.random.PRNGKey(1)
    t = jnp.asarray(True)
    for _ in range(WARMUP_CALLS):
        ts, rng, m = fn(ts, data, None, rng, t, t)
    float(np.asarray(jax.device_get(m["loss_gen"]))[-1])

    n_calls = MEASURE_STEPS // SCAN_K
    start = time.perf_counter()
    for _ in range(n_calls):
        ts, rng, m = fn(ts, data, None, rng, t, t)
    final_loss = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
    dur = time.perf_counter() - start
    e_kxx = float(np.asarray(jax.device_get(m["e_kxx"]))[-1])
    steps_per_sec = n_calls * SCAN_K / dur
    tag = "" if sampling == "uniform" else "_shuffled"
    print(f"[bench] cifar32 hbm-dataset{tag}: {steps_per_sec:.2f} steps/s "
          f"e_kxx={e_kxx:.4f}", file=sys.stderr)
    return {
        "metric": "cifar10_sngan_rep_b64_hbm_dataset"
                  f"{tag}_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / BASELINES["cifar"], 3),
        "baseline": BASELINE_NOTE,
        "loss_gen": round(final_loss, 4),
        "e_kxx": round(e_kxx, 4),
    }


def _backend_reachable(deadline_s: float = 1200.0, slice_s: float = 120.0):
    """Probe the default backend with a hard deadline, retrying.

    The tunneled dev chip sometimes goes down in a mode where backend
    init HANGS forever (CLAUDE.md gotcha; multi-hour outage observed
    2026-08-17) — a bench that hangs records nothing. Probe in killable
    subprocess slices (tools/preflight.py) until the deadline; a late
    recovery still benches."""
    import subprocess

    start = time.time()
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "preflight.py")
    while True:
        try:
            r = subprocess.run(
                [sys.executable, probe, "--timeout", str(slice_s), "--mb", "4"],
                capture_output=True, text=True, timeout=slice_s + 60)
            if r.returncode == 0:
                print(f"[bench] preflight: {r.stdout.strip()}",
                      file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - start
        if waited >= deadline_s:
            return False
        print(f"[bench] backend unreachable after {waited:.0f}s; retrying "
              f"(deadline {deadline_s:.0f}s)", file=sys.stderr)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="all",
                    choices=["all", "cifar", "stl", "celeba", "lsun",
                             "hd128", "hd256", "hd512"])
    ap.add_argument("--loss", default="rep", choices=["rep", "rmb"],
                    help="loss branch for single-arch mode (--arch all "
                         "emits rep AND rmb lines for cifar+celeba)")
    ap.add_argument("--skip-hbm", action="store_true",
                    help="skip the HBM-resident dataset metric in --arch all")
    ap.add_argument("--skip-hd", action="store_true",
                    help="skip the hd256/hd512 lines in --arch all "
                         "(~6 min: big compiles + a slow measure window)")
    ap.add_argument("--micro-batches", type=int, default=1,
                    help="hd512 single-arch mode: accumulation micro "
                         "count (1 = the fused production config; 8 = "
                         "the exact-accumulation record)")
    ap.add_argument("--bf16-moments", action="store_true",
                    help="bench with bfloat16 optimizer slots (the "
                         "--bf16-moments training flag); default off = "
                         "strict TF1-parity mode")
    args = ap.parse_args()

    if not _backend_reachable():
        # one honest, self-describing line instead of an infinite hang
        print(json.dumps({
            "metric": "cifar10_sngan_rep_b64_train_steps_per_sec_per_chip",
            "value": 0.0, "unit": "steps/sec", "vs_baseline": 0.0,
            "error": "TPU backend unreachable for 20 min at bench time "
                     "(tunnel outage — tools/preflight.py; see CLAUDE.md "
                     "gotchas); throughput NOT measured, prior recorded "
                     "figure: 459 steps/s (BENCH_r02.json)",
        }), flush=True)
        sys.exit(1)

    dp = DataParallel()
    if args.arch == "hd512":
        print(json.dumps(bench_hd512(dp, loss=args.loss,
                                     micro_batches=args.micro_batches)),
              flush=True)
        return
    if args.arch != "all":
        print(json.dumps(bench_arch(args.arch, dp, args.bf16_moments,
                                    loss=args.loss)), flush=True)
        return

    flagship = bench_arch("cifar", dp, args.bf16_moments)
    print(json.dumps(flagship), flush=True)
    # healthy-regime comparison lines (VERDICT r4 weak #1): the rmb
    # branch on the same feed, and rmb on the structured blob target the
    # quality runs learn on — loss mid-band, real gradients flowing
    print(json.dumps(bench_arch("cifar", dp, args.bf16_moments,
                                loss="rmb")), flush=True)
    print(json.dumps(bench_arch("cifar", dp, args.bf16_moments,
                                loss="rmb", data="blobs")), flush=True)
    if not args.skip_hbm:
        print(json.dumps(bench_hbm_dataset(dp)), flush=True)
        print(json.dumps(bench_hbm_dataset(dp, "shuffled_epochs")),
              flush=True)
    for name in ("stl", "celeba", "lsun", "hd128"):
        print(json.dumps(bench_arch(name, dp, args.bf16_moments)), flush=True)
    print(json.dumps(bench_arch("celeba", dp, args.bf16_moments,
                                loss="rmb")), flush=True)
    if not args.skip_hd:
        print(json.dumps(bench_arch("hd256", dp, args.bf16_moments)),
              flush=True)
        print(json.dumps(bench_hd512(dp)), flush=True)
        print(json.dumps(bench_hd512(dp, micro_batches=8)), flush=True)
    # repeat the flagship LAST for last-line parsers
    print(json.dumps(flagship), flush=True)


if __name__ == "__main__":
    main()
