#!/usr/bin/env python
"""Conv-bound-regime study (VERDICT r2 item 8): can any alternative
formulation of the 64x64 discriminator's hot convs beat XLA's direct
convolution on TPU?

The celeba/lsun profile (CLAUDE.md, tools/profile_step.py) shows ~80% of
step time in conv fwd/bwd at ~46% MXU. Three mathematically-exact
formulations of the same op are timed, fwd and fwd+bwd, per hot shape:

- ``direct``: ``lax.conv_general_dilated`` (what ``models/ops.py`` emits)
- ``s2d``: space-to-depth(2) + 2x2/s1 conv — exact for even-kernel
  stride-2 convs (kernel taps regrouped per 2x2 input phase); the MLPerf
  ResNet trick that trades spatial extent for channel (lane) depth
- ``im2col``: ``conv_general_dilated_patches`` + one matmul — forces the
  implicit GEMM to be an explicit MXU dot

plus the 3x3/s1 "same" convs and the lane-starved 3-channel first conv
(3->64 at 64x64) with an 8-channel zero-pad variant (``pad8``).

Methodology follows docs/pallas_study.md: jitted, warmed up, value-fetch
fenced (block_until_ready under-reports on tunneled backends), median of
R repeats. Output: a go/no-go table for docs/conv_study.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
REPEAT = 7
COMPUTE_DTYPE = jnp.bfloat16

# (name, H, W, Cin, Cout, kernel, stride) — the celeba/lsun discriminator
# hot shapes (experiments/architectures.py::_arch_64)
SHAPES = [
    ("l1_f64 3x3/s1 3->64", 64, 64, 3, 64, 3, 1),
    ("l2_ds 4x4/s2 64->128", 64, 64, 64, 128, 4, 2),
    ("l3   3x3/s1 128->128", 32, 32, 128, 128, 3, 1),
    ("l4_ds 4x4/s2 128->256", 32, 32, 128, 256, 4, 2),
    ("l5   3x3/s1 256->256", 16, 16, 256, 256, 3, 1),
    ("l6_ds 4x4/s2 256->512", 16, 16, 256, 512, 4, 2),
    ("l7   3x3/s1 512->512", 8, 8, 512, 512, 3, 1),
    ("l8_ds 4x4/s2 512->1024", 8, 8, 512, 1024, 4, 2),
]

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def direct(x, w, stride):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=DN)


def s2d(x, w, stride):
    """Space-to-depth(2) + 2x2/s1 VALID conv == 4x4/s2 SAME conv, exactly.

    SAME pads (1,1), so output (i,j) reads input rows 2i-1..2i+2 — which
    spans THREE 2x2 phase blocks. Pre-padding by 1 on every side aligns
    the window to padded rows 2i..2i+3 = exactly blocks i and i+1, so the
    op becomes a 2x2 VALID conv over the 4C phase channels with kernel
    taps regrouped as ws[by, bx, (ph, pw, c)] = w[2*by+ph, 2*bx+pw].
    Trades spatial extent for channel (lane) depth — the MLPerf-ResNet
    space-to-depth trick.
    """
    n, h, wdt, c = x.shape
    kh, kw, _, co = w.shape
    assert stride == 2 and kh == kw == 4 and h % 2 == 0 and wdt % 2 == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h2, w2 = (h + 2) // 2, (wdt + 2) // 2
    # -> [N, h2, w2, 4C] with channel order (ph, pw, c)
    xs = xp.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h2, w2, 4 * c)
    # w[dy, dx] with dy = 2*by + ph, dx = 2*bx + pw
    ws = w.reshape(2, 2, 2, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    ws = ws.reshape(2, 2, 4 * c, co)
    return lax.conv_general_dilated(
        xs, ws, (1, 1), "VALID", dimension_numbers=DN)


def im2col(x, w, stride):
    n, h, wdt, c = x.shape
    kh, kw, _, co = w.shape
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), "SAME",
        dimension_numbers=DN)  # [N, Ho, Wo, C*kh*kw]
    # patches channel order is (c, kh, kw); reorder w to match
    wr = w.transpose(2, 0, 1, 3).reshape(c * kh * kw, co)
    return jnp.einsum("nhwk,ko->nhwo", patches, wr)


def pad8(x, w, stride):
    """Zero-pad the 3-channel image (and kernel input dim) to 8 lanes."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
    return lax.conv_general_dilated(
        xp, wp, (stride, stride), "SAME", dimension_numbers=DN)


INNER = 200  # ops per launch: the tunnel dispatch is ~28 ms, so the
# chained-op count must push per-launch op time well past it (at 20 the
# readings pinned at dispatch/20 = 1.4 ms for every shape)


def timed(fn, *args):
    """fn must return a SCALAR (the value fetch is the only reliable
    fence on this backend, and fetching tensor outputs through the
    ~0.08 GB/s tunnel would time the transfer, not the op). The op is
    looped INNER times inside one jit with a data dependency, so
    dispatch latency amortizes."""
    out = fn(*args)
    float(np.asarray(jax.device_get(out)))
    ts = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.device_get(out)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / INNER


def main():
    rows = []
    for name, h, wdt, cin, cout, k, s in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, h, wdt, cin), COMPUTE_DTYPE)
        w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, COMPUTE_DTYPE)

        variants = {"direct": direct, "im2col": im2col}
        if k == 4 and s == 2:
            variants["s2d"] = s2d
        if cin == 3:
            variants["pad8"] = pad8

        # correctness first (f32, vs direct; jitted — eager op-by-op
        # dispatch through a tunneled chip is prohibitively slow)
        xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
        ref = np.asarray(jax.jit(lambda a, b: direct(a, b, s))(xf, wf),
                         np.float32)
        for vname, fn in variants.items():
            if vname == "direct":
                continue
            got = np.asarray(jax.jit(lambda a, b, fn=fn: fn(a, b, s))(xf, wf),
                             np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            assert err < 1e-5, f"{name} {vname}: rel err {err}"
        print(f"[{name}] exact", flush=True)

        res = {}
        for vname, fn in variants.items():
            # fwd: INNER chained convs (output feeds a cheap rescale back
            # into the next input so XLA cannot DCE or hoist), sum-fenced
            def fwd(x, w, fn=fn):
                def body(i, acc):
                    x, _ = acc
                    y = fn(x, w, s)
                    probe = jnp.sum(y.astype(jnp.float32))
                    return x * (1.0 + 1e-12 * probe).astype(x.dtype), probe
                _, probe = lax.fori_loop(0, INNER, body, (x, jnp.float32(0)))
                return probe

            t_f = timed(jax.jit(fwd), x, w)

            def loss(x, w, fn=fn):
                return jnp.sum(fn(x, w, s).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1))

            def fb(x, w, g=g):
                def body(i, acc):
                    x, _ = acc
                    dx, dw = g(x, w)
                    probe = (jnp.sum(dx.astype(jnp.float32))
                             + jnp.sum(dw.astype(jnp.float32)))
                    return x * (1.0 + 1e-12 * probe).astype(x.dtype), probe
                _, probe = lax.fori_loop(0, INNER, body, (x, jnp.float32(0)))
                return probe

            t_b = timed(jax.jit(fb), x, w)
            res[vname] = (t_f, t_b)
        base_f, base_b = res["direct"]
        line = {"shape": name, **{
            vn: {"fwd_us": round(tf * 1e6, 1), "fwdbwd_us": round(tb * 1e6, 1),
                 "fwd_speedup": round(base_f / tf, 3),
                 "fwdbwd_speedup": round(base_b / tb, 3)}
            for vn, (tf, tb) in res.items()}}
        rows.append(line)
        print(name, {vn: (f"{v['fwd_us']}us x{v['fwd_speedup']}",
                          f"{v['fwdbwd_us']}us x{v['fwdbwd_speedup']}")
                     for vn, v in line.items() if vn != "shape"}, flush=True)

    print("\n| shape | variant | fwd us | fwd vs direct | fwd+bwd us | "
          "fwd+bwd vs direct |")
    print("|---|---|---|---|---|---|")
    for line in rows:
        for vn in ("direct", "s2d", "im2col", "pad8"):
            if vn not in line:
                continue
            v = line[vn]
            print(f"| {line['shape']} | {vn} | {v['fwd_us']} | "
                  f"x{v['fwd_speedup']} | {v['fwdbwd_us']} | "
                  f"x{v['fwdbwd_speedup']} |")


if __name__ == "__main__":
    main()
