#!/usr/bin/env python
"""Backend preflight: is the chip reachable, and how fast is the path?

One JSON line with backend identity, dispatch latency, matmul compute
rate, and host<->device link bandwidth. Run before long training /
benchmarking sessions — on shared or tunneled backends (this repo's dev
chip reaches JAX through a network tunnel) the failure mode is a HANG at
backend init or a silently degraded link, which then corrupts every
timing measured afterwards. The init probe runs in a subprocess with a
deadline so the tool itself never hangs.

Usage: python tools/preflight.py [--timeout 120] [--mb 32]
Exit code: 0 healthy, 1 backend unreachable/broken.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_PROBE = r"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import numpy as np
import jax, jax.numpy as jnp

if {PLATFORM!r}:
    from mmdgan_tpu.utils.backend import force_platform
    force_platform({PLATFORM!r})
t0 = time.perf_counter()
devs = jax.devices()
init_s = time.perf_counter() - t0
out = {"platform": devs[0].platform, "device": str(devs[0]),
       "n_devices": len(devs), "init_s": round(init_s, 2)}

# dispatch latency: tiny op, value-fetch fenced (block_until_ready
# under-reports on tunneled backends)
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros(())
float(jax.device_get(f(x)))
t0 = time.perf_counter()
for _ in range(10):
    x = f(x)
float(jax.device_get(x))
out["dispatch_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

# compute: bf16 matmul chains (MXU), value fenced. One matmul is ~1 ms
# of compute vs ~30 ms dispatch+fetch on a tunneled link, so a single
# timed call pins at the latency floor (same INNER rule as
# tools/conv_study.py). Two chain lengths are timed and DIFFERENCED —
# the per-call dispatch/fetch latency cancels, leaving pure compute.
n, inner = {MMN}, {MMI}
i1 = max(inner // 8, 1)
a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

def chain(k):
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, k, lambda i, x: jnp.tanh(x @ x), a))
    float(jax.device_get(f(a)[0, 0]))  # compile + warm
    t0 = time.perf_counter()
    float(jax.device_get(f(a)[0, 0]))
    return time.perf_counter() - t0

d_small, d_big = chain(i1), chain(inner)
out["matmul_tflops"] = round(
    (inner - i1) * 2 * n**3 / max(d_big - d_small, 1e-9) / 1e12, 1)

# link bandwidth, both directions
mb = {MB}
h = np.zeros((mb << 20,), np.uint8)
t0 = time.perf_counter()
d = jax.device_put(h)
jax.block_until_ready(d)
# fence the upload with a 1-byte consume (ordering guarantees the put landed)
int(jax.device_get(d[0]))
out["h2d_gbps"] = round(mb / 1024 / (time.perf_counter() - t0), 3)
t0 = time.perf_counter()
np.asarray(jax.device_get(d))
out["d2h_gbps"] = round(mb / 1024 / (time.perf_counter() - t0), 3)
print("PREFLIGHT " + json.dumps(out))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="deadline for the whole probe (a tunneled "
                         "backend that is down HANGS at init)")
    ap.add_argument("--mb", type=int, default=32,
                    help="transfer size for the bandwidth probe (MB); "
                         "keep small on slow links")
    ap.add_argument("--platform", default="",
                    help="force a backend (cpu/tpu); default = env default")
    ap.add_argument("--matmul-n", type=int, default=4096,
                    help="matmul probe matrix size (drop to ~512 on CPU "
                         "— bf16 there is emulated and slow)")
    ap.add_argument("--matmul-inner", type=int, default=64,
                    help="long-chain length for the differenced matmul "
                         "timing")
    args = ap.parse_args()

    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE.replace("{MB}", str(args.mb))
             .replace("{PLATFORM!r}", repr(args.platform))
             .replace("{MMN}", str(args.matmul_n))
             .replace("{MMI}", str(args.matmul_inner))
             .replace("{REPO!r}", repr(os.path.dirname(
                 os.path.dirname(os.path.abspath(__file__)))))],
            capture_output=True, text=True, timeout=args.timeout,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        print(json.dumps({"healthy": False,
                          "error": f"backend probe hung >{args.timeout}s "
                                   "(tunnel down or chip held?)"}))
        return 1
    line = [l for l in proc.stdout.splitlines() if l.startswith("PREFLIGHT ")]
    if proc.returncode != 0 or not line:
        print(json.dumps({"healthy": False,
                          "error": (proc.stderr or proc.stdout)[-400:]}))
        return 1
    out = json.loads(line[0][len("PREFLIGHT "):])
    out["healthy"] = True
    out["probe_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
