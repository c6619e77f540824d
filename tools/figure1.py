#!/usr/bin/env python
"""Reproduce the reference's loss-geometry figures (Figures/figure1.ipynb,
the README GIFs): free particles optimized directly under attractive
(mmd_g) vs repulsive (rep) MMD gradients against a fixed target sample.

Writes a PNG frame sequence (and a GIF when PIL supports it) per loss,
visualizing how the repulsive discriminator loss spreads real-data scores
while the generator loss pulls the fake particles onto the target.

Usage:
  python tools/figure1.py --loss rep --steps 600 --out /tmp/fig1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--loss", default="rep", choices=["rep", "rmb", "mmd_g"])
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--lr", type=float, default=2.0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--target", default="shell",
                   choices=["shell", "shell2", "star"])
    p.add_argument("--out", default="./figure1_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a JAX backend (the env default here is a "
                        "tunneled TPU; particle updates are tiny, cpu is "
                        "fine and leaves the chip free)")
    args = p.parse_args()

    import jax

    if args.platform:
        from mmdgan_tpu.utils.backend import force_platform

        force_platform(args.platform)
    import jax.numpy as jnp

    from mmdgan_tpu.data import SimData
    from mmdgan_tpu.ops import gan_loss
    from mmdgan_tpu.utils.fig import Fig

    os.makedirs(args.out, exist_ok=True)
    sim = SimData(args.target, batch_size=args.batch, seed=args.seed)
    target = jnp.asarray(sim(args.batch))
    key = jax.random.PRNGKey(args.seed)
    particles = jax.random.normal(key, (args.batch, 2)) * 0.05

    @jax.jit
    def step(particles):
        def loss_fn(pt):
            lg, ld, _, _ = gan_loss(pt, target, args.loss, batch_size=args.batch)
            return lg
        l, g = jax.value_and_grad(loss_fn)(particles)
        return particles - args.lr * g, l

    fig = Fig(fig_folder=args.out)
    frame_every = max(args.steps // args.frames, 1)
    frames = []
    for i in range(args.steps + 1):
        if i % frame_every == 0:
            pts = np.concatenate([np.asarray(target), np.asarray(particles)])
            labels = np.concatenate([
                np.zeros(args.batch, int), np.ones(args.batch, int)])
            path = fig.scatter(
                pts, labels=labels, filename=f"frame_{i:05d}",
                title=f"{args.loss} step {i}", s=6.0)
            frames.append(path)
        particles, l = step(particles)
    print(f"final generator-side loss: {float(l):.5f}")

    # assemble a GIF if PIL is available
    try:
        from PIL import Image

        imgs = [Image.open(f) for f in frames]
        gif = os.path.join(args.out, f"figure1_{args.loss}.gif")
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=120, loop=0)
        print(f"wrote {gif}")
    except Exception as e:  # pragma: no cover
        print(f"(gif skipped: {e})")


if __name__ == "__main__":
    main()
