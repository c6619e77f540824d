#!/usr/bin/env python
"""Quality smoke: does the full stack actually LEARN on hardware?

Trains the CIFAR-architecture SNGAN (scaled to 32x32) on a structured
synthetic image distribution (colored Gaussian blobs on gradients — enough
structure for FID-style metrics to move), then reports the
random-feature-FID between generated and held-out real samples at several
checkpoints. The FID values are not comparable to published numbers (no
inception weights in this environment) but their TREND demonstrates
end-to-end learning: data pipeline -> fused train step -> eval stack.

  python tools/quality_smoke.py --steps 3000 --eval-every 1000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def blob_batches(batch, size=32, seed=0, n_blobs=3):
    """Structured synthetic images: colored blobs on smooth gradients
    (vectorized over the batch)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    while True:
        g = (rng.rand(batch, 3) * 0.6 - 0.3).astype(np.float32)
        base = (xx[None] * g[:, 0, None, None]
                + yy[None] * g[:, 1, None, None]
                + g[:, 2, None, None])                       # [B, H, W]
        img = np.repeat(base[..., None], 3, axis=-1)         # [B, H, W, 3]
        centers = rng.rand(batch, n_blobs, 2).astype(np.float32)
        sig = (0.05 + rng.rand(batch, n_blobs) * 0.1).astype(np.float32)
        colors = (rng.rand(batch, n_blobs, 3) * 2 - 1).astype(np.float32)
        d2 = ((xx[None, None] - centers[..., 0, None, None]) ** 2
              + (yy[None, None] - centers[..., 1, None, None]) ** 2)
        blobs = np.exp(-d2 / (2 * sig[..., None, None] ** 2))  # [B, K, H, W]
        img = img + np.einsum("bkhw,bkc->bhwc", blobs, colors)
        yield {"x": np.tanh(img).astype(np.float32), "y": None}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--scan-k", type=int, default=16)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--out", default="/tmp/quality_smoke")
    p.add_argument("--loss", default="rep")
    p.add_argument("--lr-dis", type=float, default=5e-4)
    p.add_argument("--lr-gen", type=float, default=2e-4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.metrics.fid import fid_from_activations
    from mmdgan_tpu.metrics.inception import RandomFeatureClassifier
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_multi_step
    from mmdgan_tpu.utils.sprite import write_sprite_wrapper

    os.makedirs(args.out, exist_ok=True)
    model = SNGan(cifar_architecture(), num_class=0, loss_type=args.loss)
    opt_d, opt_g = multi_opt_config([args.lr_dis, args.lr_gen])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    step = jax.jit(build_multi_step(model, opt_d, opt_g, args.scan_k))
    data = blob_batches(args.batch)
    clf = RandomFeatureClassifier(seed=0)

    # held-out real activations
    real_pool = np.concatenate([
        clf(next(data)["x"])[1] for _ in range(args.eval_batches)])

    def eval_fid(ts):
        host = jax.device_get(ts)
        pools = []
        for i in range(args.eval_batches):
            g = np.asarray(jax.device_get(model.generate(
                host.params, host.net_state, rng=jax.random.PRNGKey(500 + i),
                batch_size=args.batch)))
            pools.append(clf(g)[1])
        return fid_from_activations(real_pool, np.concatenate(pools)), g

    t_flag = jnp.asarray(True)
    fid0, g = eval_fid(ts)
    print(f"step 0: random-feature FID = {fid0:.4f}", flush=True)
    write_sprite_wrapper(g[:64], (8, 8), "samples", args.out, "_step0")

    done = 0
    start = time.time()
    while done < args.steps:
        host = [next(data) for _ in range(args.scan_k)]
        batches = {"x": jnp.asarray(np.stack([b["x"] for b in host])), "y": None}
        ts, m = step(ts, batches, t_flag, t_flag)
        done += args.scan_k
        if done % args.eval_every < args.scan_k:
            fid, g = eval_fid(ts)
            mm = {k: float(np.asarray(jax.device_get(v))[-1]) for k, v in m.items()}
            speed = done / (time.time() - start)
            print(f"step {done}: FID = {fid:.4f} loss_gen={mm['loss_gen']:.4f} "
                  f"loss_dis={mm['loss_dis']:.4f} s_x={mm['s_x_mean']:.3f} "
                  f"s_g={mm['s_gen_mean']:.3f} "
                  f"({speed:.1f} steps/s incl. host data)", flush=True)
            write_sprite_wrapper(g[:64], (8, 8), "samples", args.out, f"_step{done}")
    print(f"FID {fid0:.3f} -> {fid:.3f} "
          f"({'LEARNING' if fid < 0.5 * fid0 else 'check dynamics'})")


if __name__ == "__main__":
    main()
