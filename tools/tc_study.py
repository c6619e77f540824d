#!/usr/bin/env python
"""Transposed-conv regime study (VERDICT r3 item 8): can the generator's
hot ``tc 4x4/s2`` layers (13% of the CIFAR step per tools/profile_step.py)
beat XLA's ``lax.conv_transpose`` via an exact periodic-shuffling
reformulation?

Background: ``lax.conv_transpose(x, W, strides=2, padding='SAME')`` lowers
to a conv over the 2x-dilated input — 3/4 of the dilated pixels are zeros,
so a dense emitter wastes 75% of its MACs. The reference's own
ImageScaling trick (layer_func.py:197-244) avoids this with periodic
shuffling. The exact decomposition for k=4, s=2, SAME (lhs_dilation=2,
pad 2/2 per dim — jax's _conv_transpose_padding): output phase
(p, q) in {0,1}^2 is a 2x2/s1 conv of x with the parity-matched kernel
taps,

  y[2i+p, 2j+q] = sum_{a,b in {0,1}} x[i+a-(1-p), j+b-(1-q)]
                  * W[2a+p... ] (taps u=p,p+2 / v=q,q+2),

then the four phase outputs interleave (depth-to-space). Variants timed,
all verified exact (<2e-5 rel) against direct in f32 first:

- ``direct``  — ``lax.conv_transpose`` (what ``models/ops.py`` emits)
- ``ps2``     — four 2x2/s1 phase convs (25% of the dense-emitter MACs,
                zero wasted taps) + an interleaving reshape
- ``ps3``     — ONE 3x3/s1 conv to 4*Cout channels (phase kernels embedded
                with zero taps, 16/36 useful) + depth-to-space; trades
                wasted MACs for a single fused MXU op
- ``grad``    — the adjoint formulation: transpose-conv expressed as the
                VJP of the matching strided conv (kernel spatially
                flipped, in/out channels swapped) — probes whether XLA's
                *gradient* path picks a different emitter

Methodology follows docs/conv_study.md: INNER=200 data-dependent chained
ops inside one jit (tunnel dispatch ~28 ms would otherwise pin readings),
value-fetch fenced, median of 7 repeats, fwd and fwd+bwd.
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
INNER = 200
REPEAT = 7
COMPUTE_DTYPE = jnp.bfloat16

# (name, H, Cin, Cout) — generator tc 4x4/s2 hot shapes:
# 64x64 arch (celeba/lsun, _arch_64) + the CIFAR trio + hd128's last
# feature-to-image upsampler (lane-starved 3-channel output)
SHAPES = [
    ("g2 4x4 1024->512 (64sq)", 4, 1024, 512),
    ("g3 8x8 512->256 (64sq)", 8, 512, 256),
    ("g4 16x16 256->128 (64sq)", 16, 256, 128),
    ("g5 32x32 128->64 (64sq)", 32, 128, 64),
    ("g2 4x4 512->256 (cifar)", 4, 512, 256),
    ("g3 8x8 256->128 (cifar)", 8, 256, 128),
    ("g4 16x16 128->64 (cifar)", 16, 128, 64),
    ("g6 64x64 64->3 (hd128)", 64, 64, 3),
    # hd256/hd512 late layers (VERDICT r4 item 7: the lane-starved
    # image-resolution layers are a larger step fraction at 512²; the
    # one measured ps3 win at 64² gets re-judged where it matters)
    ("g7 128x128 32->3 (hd256)", 128, 32, 3),
    ("g7 128x128 32->32 (hd512)", 128, 32, 32),
    ("g8 256x256 32->3 (hd512)", 256, 32, 3),
]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def direct(x, w):
    return lax.conv_transpose(x, w, strides=(2, 2), padding="SAME",
                              dimension_numbers=_DIMSPEC)


def _phase_kernel_2x2(w, p, q):
    """The 2x2 kernel for output phase (p, q): taps u in {p, p+2},
    v in {q, q+2} of the 4x4 kernel, in window order."""
    return jnp.stack([
        jnp.stack([w[p + 0, q + 0], w[p + 0, q + 2]], axis=0),
        jnp.stack([w[p + 2, q + 0], w[p + 2, q + 2]], axis=0),
    ], axis=0)  # [2, 2, Cin, Cout]


def ps2(x, w):
    """Four 2x2/s1 phase convs + interleave. Phase p reads rows
    {i-1, i} (pad (1,0)) ; phase p=1 reads {i, i+1} (pad (0,1))."""
    outs = {}
    for p in (0, 1):
        for q in (0, 1):
            k = _phase_kernel_2x2(w, p, q)
            pad = ((1 - p, p), (1 - q, q))
            outs[(p, q)] = lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=pad,
                dimension_numbers=_DIMSPEC)
    b, h, wd, c = outs[(0, 0)].shape
    # y[2i+p, 2j+q] = outs[(p,q)][i, j]
    z = jnp.stack([jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3),
                   jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)],
                  axis=2)  # [B, H, p, W, q, C]
    return z.reshape(b, 2 * h, 2 * wd, c)


def _ps3_kernel(w):
    """One 3x3 kernel producing 4*Cout channels: channel block
    (p*2+q)*Cout holds phase (p,q)'s taps at window offsets shifted so
    every phase shares pad (1,1)."""
    wn = np.asarray(w)
    cin, cout = wn.shape[2], wn.shape[3]
    k = np.zeros((3, 3, cin, 4 * cout), dtype=wn.dtype)
    for p in (0, 1):
        for q in (0, 1):
            blk = slice((p * 2 + q) * cout, (p * 2 + q + 1) * cout)
            # phase p window {i-1, i} sits at 3-window offsets {0, 1};
            # phase p=1 window {i, i+1} at offsets {1, 2}
            for a in (0, 1):
                for b_ in (0, 1):
                    k[a + p, b_ + q, :, blk] = wn[2 * a + p, 2 * b_ + q]
    return jnp.asarray(k)


def ps3(x, w3):
    z = lax.conv_general_dilated(
        x, w3, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMSPEC)
    b, h, wd, c4 = z.shape
    c = c4 // 4
    z = z.reshape(b, h, wd, 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, c)


def grad_form(x, w):
    """conv_transpose == VJP of the matching strided conv: flip the
    kernel spatially, swap in/out channels, and pull the cotangent x
    through conv 4x4/s2 SAME on the 2x-size output."""
    cout = w.shape[3]
    b, h, wd, _ = x.shape
    wf = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # [4,4,Cout,Cin]

    def fwd_conv(y):
        return lax.conv_general_dilated(
            y, wf, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_DIMSPEC)

    y0 = jnp.zeros((b, 2 * h, 2 * wd, cout), dtype=x.dtype)
    _, vjp = jax.vjp(fwd_conv, y0)
    return vjp(x)[0]


def _bench(fn, args, label):
    """INNER chained ops per launch, value-fetch fenced, median of
    REPEAT. Returns us/op."""
    def chained(*a):
        def body(i, carry):
            out = fn(carry, *a[1:])
            # data dependence: feed a scalar probe back into the input
            return a[0] * (1 + 0 * out.mean().astype(a[0].dtype))
        x = lax.fori_loop(0, INNER, body, a[0])
        return fn(x, *a[1:]).mean()

    jfn = jax.jit(chained)
    probe = jfn(*args)
    float(jax.device_get(probe))  # warm + fence
    times = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        float(jax.device_get(jfn(*args)))
        times.append((time.perf_counter() - t0) / (INNER + 1) * 1e6)
    return float(np.median(times))


def _bench_bwd(fn, args):
    def loss(*a):
        return (fn(*a).astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss, argnums=(0, 1))

    def chained(x, w):
        def body(i, carry):
            gx, gw = g(carry, w)
            return x * (1 + 0 * (gx.mean() + gw.mean()).astype(x.dtype))
        xx = lax.fori_loop(0, INNER, body, x)
        return loss(xx, w)

    jfn = jax.jit(chained)
    float(jax.device_get(jfn(*args)))
    times = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        float(jax.device_get(jfn(*args)))
        times.append((time.perf_counter() - t0) / INNER * 1e6)
    return float(np.median(times))


def main():
    global INNER
    print(f"# tc study: backend={jax.default_backend()} B={B} "
          f"INNER={INNER} dtype={COMPUTE_DTYPE.__name__}")
    rows = []
    inner_default = INNER
    for name, h, cin, cout in SHAPES:
        # the hd-family image-resolution shapes are ~100x the work of the
        # 4x4 trunk shapes: fewer chained ops keep a shape under ~1 min
        # while staying far above the ~28 ms dispatch floor
        INNER = inner_default if h < 128 else 25
        rng = np.random.RandomState(0)
        xf = jnp.asarray(rng.randn(B, h, h, cin), jnp.float32)
        wf = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.05, jnp.float32)

        # exactness gate in f32 — CPU only: on the tunneled TPU every
        # eager op here pays a compile round-trip (minutes of overhead),
        # and TPU f32 convs run multi-pass bf16 so the 2e-5 bar is the
        # wrong instrument anyway. Run `JAX_PLATFORMS=cpu` once first.
        if jax.default_backend() == "cpu" and h < 128:
            # (h >= 128 skipped: the transforms are shape-generic and
            # proven exact on the smaller shapes; a 256x256 b64 conv
            # quartet takes minutes per variant on this 1-core host)
            ref = np.asarray(direct(xf, wf))
            for vname, out in (("ps2", np.asarray(ps2(xf, wf))),
                               ("ps3", np.asarray(ps3(xf, _ps3_kernel(wf)))),
                               ("grad", np.asarray(grad_form(xf, wf)))):
                rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
                assert rel < 2e-5, (name, vname, rel)
            print(f"## {name}: exactness ok (ps2/ps3/grad vs direct, f32)")

        x = xf.astype(COMPUTE_DTYPE)
        w = wf.astype(COMPUTE_DTYPE)
        w3 = _ps3_kernel(wf).astype(COMPUTE_DTYPE)
        res = {}
        for vname, fn, args in (("direct", direct, (x, w)),
                                ("ps2", ps2, (x, w)),
                                ("ps3", ps3, (x, w3)),
                                ("grad", grad_form, (x, w))):
            fwd = _bench(fn, args, vname)
            fb = _bench_bwd(fn, args)
            res[vname] = (fwd, fb)
            base = res["direct"]
            print(f"| {name} | {vname} | {fwd:.1f} | "
                  f"x{base[0] / fwd:.3g} | {fb:.1f} | "
                  f"x{base[1] / fb:.3g} |", flush=True)
            rows.append((name, vname, fwd, base[0] / fwd, fb,
                         base[1] / fb))
    print("\n# summary (speedup vs direct, >1 = faster)")
    for name, vname, fwd, sf, fb, sb in rows:
        if vname != "direct":
            print(f"{name:28s} {vname:6s} fwd x{sf:.3f}  fwd+bwd x{sb:.3f}")


if __name__ == "__main__":
    main()
