#!/usr/bin/env python
"""Fixed-seed parity / reproducibility harness (SURVEY.md §7 stage 8).

Runs N deterministic train steps of the CIFAR SNGAN on synthetic data and
writes the full loss curve + score statistics to JSON. Two uses:

1. **Reproducibility tracking**: re-running with the same seed on the same
   backend must reproduce the curve bit-for-bit (or to float tolerance
   across backends); compare two runs with --compare.
2. **Reference-formula parity**: at every k-th step the losses are
   recomputed from the discriminator scores with an independent numpy
   implementation of the reference formulas (math_func.py:1288-1431) and
   the deviation is recorded.

Usage:
  python tools/parity_run.py --steps 50 --out run_a.json
  python tools/parity_run.py --steps 50 --out run_b.json
  python tools/parity_run.py --compare run_a.json run_b.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def np_rep_loss(s_gen, s_x, sigma=1.0, w=(0.0, -1.0)):
    """Independent numpy implementation of the rep loss pair."""
    def pd(a, b):
        return np.maximum(
            (a * a).sum(1)[:, None] - 2 * a @ b.T + (b * b).sum(1)[None, :], 0.0)

    def offdiag(m):
        n = m.shape[0]
        return (m.sum() - np.trace(m)) / (n * (n - 1))

    t = 2 * sigma ** 2
    e_xx = offdiag(np.exp(-pd(s_gen, s_gen) / t))
    e_xy = offdiag(np.exp(-pd(s_gen, s_x) / t))
    e_yy = offdiag(np.exp(-pd(s_x, s_x) / t))
    return (e_xx + e_yy - 2 * e_xy, w[0] * e_xy - e_xx - w[1] * e_yy)


def run(steps: int, seed: int, out_path: str, check_every: int = 10):
    import jax
    import jax.numpy as jnp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import build_train_step, init_train_state, multi_opt_config

    model = SNGan(cifar_architecture(), num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(seed), opt_d, opt_g)
    step = jax.jit(build_train_step(model, opt_d, opt_g))
    rng = np.random.RandomState(seed)
    t = jnp.asarray(True)

    curve = []
    max_formula_err = 0.0
    for i in range(steps):
        batch = {"x": jnp.asarray(
            rng.randn(64, 32, 32, 3).astype(np.float32).clip(-1, 1)), "y": None}
        ts, m = step(ts, batch, t, t)
        vals = {k: float(v) for k, v in jax.device_get(m).items()
                if not k.startswith("hist/")}
        curve.append(vals)
        if i % check_every == 0:
            # recompute losses from scores via the independent numpy path
            host = jax.device_get(ts)
            data = np.asarray(jax.device_get(batch["x"]))
            lg, ld, _, _, _ = model.compute_losses(
                host.params, host.net_state, host.loss_state,
                jax.random.PRNGKey(0), {"x": jnp.asarray(data), "y": None},
                train=False)
            # formula check on standalone scores
            key = jax.random.PRNGKey(7)
            s_gen = np.asarray(model.discriminate(
                host.params, host.net_state,
                {"x": model.generate(host.params, host.net_state, rng=key,
                                     batch_size=64), "y": None}))
            s_x = np.asarray(model.discriminate(
                host.params, host.net_state, {"x": jnp.asarray(data), "y": None}))
            from mmdgan_tpu.ops.losses import gan_loss
            lg_jax, ld_jax, _, _ = gan_loss(
                jnp.asarray(s_gen), jnp.asarray(s_x), "rep", batch_size=64)
            lg_np, ld_np = np_rep_loss(s_gen, s_x)
            err = max(abs(float(lg_jax) - lg_np), abs(float(ld_jax) - ld_np))
            max_formula_err = max(max_formula_err, err)

    result = {
        "seed": seed,
        "steps": steps,
        "backend": __import__("jax").default_backend(),
        "curve": curve,
        "max_reference_formula_error": max_formula_err,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"wrote {out_path}; final loss_gen={curve[-1]['loss_gen']:.6f} "
          f"max formula err={max_formula_err:.2e}")


def compare(path_a: str, path_b: str, rtol: float = 1e-5):
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    ca = np.asarray([v["loss_gen"] for v in a["curve"]])
    cb = np.asarray([v["loss_gen"] for v in b["curve"]])
    n = min(len(ca), len(cb))
    diff = np.abs(ca[:n] - cb[:n]).max()
    print(f"loss curves: max |diff| over {n} steps = {diff:.3e}")
    ok = np.allclose(ca[:n], cb[:n], rtol=rtol, atol=1e-7)
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="parity_run.json")
    p.add_argument("--compare", nargs=2, default=None)
    args = p.parse_args()
    if args.compare:
        sys.exit(compare(*args.compare))
    run(args.steps, args.seed, args.out)


if __name__ == "__main__":
    main()
