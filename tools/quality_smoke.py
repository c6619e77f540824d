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


def blob_batches(batch, size=32, seed=0, n_blobs=3, num_class=0):
    """Structured synthetic images: colored blobs on smooth gradients
    (vectorized over the batch).

    With ``num_class`` >= 2 each sample gets a class label and the class
    deterministically sets the base-gradient color and the blob palette
    center (fixed per-class directions, sampled once from a fixed seed) —
    classes are visually distinct, so per-class FID can only drop if the
    generator actually uses its conditioning."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    if num_class >= 2:
        crng = np.random.RandomState(12345)
        class_grad = (crng.rand(num_class, 3) * 0.6 - 0.3).astype(np.float32)
        class_color = (crng.rand(num_class, 3) * 2 - 1).astype(np.float32)
    while True:
        if num_class >= 2:
            y = rng.randint(0, num_class, size=batch)
            g = (class_grad[y]
                 + (rng.rand(batch, 3) * 0.2 - 0.1)).astype(np.float32)
        else:
            y = None
            g = (rng.rand(batch, 3) * 0.6 - 0.3).astype(np.float32)
        base = (xx[None] * g[:, 0, None, None]
                + yy[None] * g[:, 1, None, None]
                + g[:, 2, None, None])                       # [B, H, W]
        img = np.repeat(base[..., None], 3, axis=-1)         # [B, H, W, 3]
        centers = rng.rand(batch, n_blobs, 2).astype(np.float32)
        sig = (0.05 + rng.rand(batch, n_blobs) * 0.1).astype(np.float32)
        colors = (rng.rand(batch, n_blobs, 3) * 2 - 1).astype(np.float32)
        if num_class >= 2:
            colors = (0.3 * colors + 0.7 * class_color[y][:, None, :]).astype(
                np.float32)
        d2 = ((xx[None, None] - centers[..., 0, None, None]) ** 2
              + (yy[None, None] - centers[..., 1, None, None]) ** 2)
        blobs = np.exp(-d2 / (2 * sig[..., None, None] ** 2))  # [B, K, H, W]
        img = img + np.einsum("bkhw,bkc->bhwc", blobs, colors)
        yield {"x": np.tanh(img).astype(np.float32),
               "y": None if y is None else y.reshape(-1, 1).astype(np.int64)}


# every dispatcher branch (math_func.py:2600-2651) — the sweep trains each
# for a couple thousand scanned steps and checks dynamics, not just values
SWEEP_LOSSES = [
    "logistic", "hinge", "wasserstein",
    "mmd_g", "mmd_t", "mgb", "cramer",
    "mmd_g_mix", "sgm", "rand_g", "rgb", "rand_g_mix", "sym_rg_mix",
    "sym_rg", "instance_noise",
    "rep", "rep_ds", "rep_gp", "rmb", "rmb_ds", "rmb_gp",
]
STATEFUL_LOSSES = {"mmd_g_mix", "sgm", "rand_g_mix", "sym_rg_mix",
                   "instance_noise"}


def run_sweep(args):
    """Full-catalogue training sweep (VERDICT r2 item 4): every GANLoss
    dispatcher branch trains ``--steps`` scanned steps on the blob
    harness (HBM-resident f32 dataset). Asserts finite losses end-to-end
    and, for the stateful families, that LossState actually EVOLVES
    through the scan (coin moving average / instance-noise sigma) — the
    state-threading property value-level unit tests cannot catch."""
    import jax
    import jax.numpy as jnp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.metrics.fid import fid_from_activations
    from mmdgan_tpu.metrics.inception import RandomFeatureClassifier
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_device_data_step

    n = args.device_dataset or 4096
    data = blob_batches(args.batch, size=32)
    chunks, got = [], 0
    while got < n:
        x = next(data)["x"]  # keep f32: quantized synthetic targets are
        chunks.append(x)     # adversarially separable (CLAUDE.md gotcha)
        got += x.shape[0]
    host_ds = np.concatenate(chunks)[:n]
    data_x = jnp.asarray(host_ds)
    jax.block_until_ready(data_x)
    clf = RandomFeatureClassifier(seed=0)
    real_pool = np.concatenate([
        clf(host_ds[i:i + args.batch])[1]
        for i in range(0, args.eval_batches * args.batch, args.batch)])

    t_flag = jnp.asarray(True)
    rows = []
    for loss in SWEEP_LOSSES:
        t0 = time.time()
        model = SNGan(cifar_architecture(), num_class=0, loss_type=loss)
        opt_d, opt_g = multi_opt_config([args.lr_dis, args.lr_gen])
        ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
        step = jax.jit(build_device_data_step(
            model, opt_d, opt_g, num_steps=args.scan_k,
            batch_size=args.batch))
        rng_dev = jax.random.PRNGKey(1)

        def eval_fid(ts):
            host = jax.device_get(ts)
            pools = []
            for i in range(args.eval_batches):
                g = np.asarray(jax.device_get(model.generate(
                    host.params, host.net_state,
                    rng=jax.random.PRNGKey(500 + i), batch_size=args.batch)))
                pools.append(clf(g)[1])
            return fid_from_activations(real_pool, np.concatenate(pools))

        fid0 = eval_fid(ts)
        done, m = 0, None
        ok, err = True, ""
        try:
            while done < args.steps:
                ts, rng_dev, m = step(ts, data_x, None, rng_dev,
                                      t_flag, t_flag)
                done += args.scan_k
                if done % 512 < args.scan_k:  # periodic NaN guard
                    lg = float(np.asarray(jax.device_get(m["loss_gen"]))[-1])
                    if not np.isfinite(lg):
                        raise FloatingPointError(f"loss_gen={lg} @ {done}")
            mm = {k: float(np.asarray(jax.device_get(v))[-1])
                  for k, v in m.items() if not k.startswith("hist/")}
            assert np.isfinite(mm["loss_gen"]), mm
            assert np.isfinite(mm["loss_dis"]), mm
            fid1 = eval_fid(ts)
            state = jax.device_get(ts.loss_state)
            if loss in STATEFUL_LOSSES:
                # the EMA moves off its zero init on step 1 and keeps
                # tracking the loss — if LossState were dropped anywhere
                # in the scan carry it would read 0.0 here
                assert float(state.loss_average) != 0.0, (
                    f"{loss}: LossState.loss_average did not evolve")
                assert mm["state/loss_average"] == float(state.loss_average)
        except Exception as e:  # keep sweeping; report at the end
            ok, err, fid1 = False, f"{type(e).__name__}: {e}", float("nan")
            mm, state = {}, None
        rows.append({
            "loss": loss, "ok": ok, "err": err,
            "steps": done, "fid0": float(fid0), "fid1": float(fid1),
            "loss_gen": mm.get("loss_gen", float("nan")),
            "loss_dis": mm.get("loss_dis", float("nan")),
            "e_kxx": mm.get("e_kxx"),
            "coin_avg": (None if state is None or loss not in STATEFUL_LOSSES
                         else float(state.loss_average)),
            "mix_prob": (None if state is None or loss not in STATEFUL_LOSSES
                         else float(state.mix_prob)),
            "ins_sigma": (None if state is None or loss != "instance_noise"
                          else float(state.ins_sigma)),
            "sec": round(time.time() - t0, 1),
        })
        r = rows[-1]
        print(f"[sweep] {loss:>14s}: {'OK ' if ok else 'FAIL '} "
              f"fid {r['fid0']:.2f}->{r['fid1']:.2f} "
              f"lg={r['loss_gen']:.4f} ld={r['loss_dis']:.4f} "
              f"coin_avg={r['coin_avg']} ins_sigma={r['ins_sigma']} "
              f"({r['sec']}s) {err}", flush=True)

    print("\n| loss | steps | FID 0 -> end | loss_gen | loss_dis | e_kxx "
          "| coin avg | mix prob | ins sigma |")
    print("|---|---|---|---|---|---|---|---|---|")
    fmt = lambda v: "—" if v is None else f"{v:.4f}"
    for r in rows:
        print(f"| {r['loss']} | {r['steps']} | {r['fid0']:.2f} -> "
              f"{r['fid1']:.2f} | {r['loss_gen']:.4f} | {r['loss_dis']:.4f} "
              f"| {fmt(r['e_kxx'])} | {fmt(r['coin_avg'])} "
              f"| {fmt(r['mix_prob'])} | {fmt(r['ins_sigma'])} |")
    failed = [r["loss"] for r in rows if not r["ok"]]
    print(f"\nsweep: {len(rows) - len(failed)}/{len(rows)} branches OK"
          + (f"; FAILED: {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--scan-k", type=int, default=16)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--out", default="/tmp/quality_smoke")
    p.add_argument("--arch", default="cifar",
                   choices=["cifar", "stl", "celeba", "lsun", "hd128",
                            "hd256", "hd512"],
                   help="cifar: 32x32 (my_test_cifar.py); stl: 48x48 "
                        "(my_test_stl.py); celeba/lsun: the 64x64 "
                        "10-layer archs (my_test_celebA.py / "
                        "my_test_lsun.py) — the conv-compute-bound "
                        "regime; hd128/hd256/hd512: the beyond-reference "
                        "hd_architecture family (the reference caps at "
                        "64x64; hd512 trains FUSED on the v5e — pair "
                        "it with --device-dataset since 201 MB f32 "
                        "batches can't ride the tunnel; --micro-batches "
                        "is the beyond-HBM escape hatch only)")
    p.add_argument("--sweep", action="store_true",
                   help="full loss-catalogue training sweep: every "
                        "dispatcher branch trains --steps scanned steps "
                        "on the blob harness; asserts finite losses and "
                        "that stateful losses' LossState evolves "
                        "(results table on stdout)")
    p.add_argument("--loss", default="rep")
    p.add_argument("--lr-dis", type=float, default=5e-4)
    p.add_argument("--lr-gen", type=float, default=2e-4)
    p.add_argument("--ckpt-dir", default=None,
                   help="orbax checkpoint dir: resume from it at start if "
                        "non-empty, save at each eval, and prove "
                        "save->restore bitwise equality at the end")
    p.add_argument("--device-dataset", type=int, default=0, metavar="N",
                   help="pregenerate a FIXED N-image uint8 dataset, upload "
                        "it to HBM once, and train via the on-device "
                        "batch-gather path (build_device_data_step) — "
                        "mirrors the reference's fixed-dataset protocol "
                        "and removes the host data link (~50 steps/s host "
                        "feed vs ~400 steps/s HBM-resident)")
    p.add_argument("--device-dataset-dtype", default="uint8",
                   choices=["uint8", "f32"],
                   help="uint8 mirrors the real tfrecord path (quantized, "
                        "device-decoded); f32 stores the raw continuous "
                        "values (4x HBM, no quantization)")
    p.add_argument("--sampling", default="uniform",
                   choices=["uniform", "shuffled_epochs"],
                   help="HBM-dataset batch draw: 'uniform' gathers 64 "
                        "random rows per step; 'shuffled_epochs' walks "
                        "contiguous slices of a per-epoch permuted "
                        "dataset (without-replacement epochs at the "
                        "synthetic-feed ceiling, "
                        "docs/hbm_sampling_study.md). Needs "
                        "--device-dataset. With --num-class the batches "
                        "ride a deterministic global class schedule with "
                        "per-class epoch streams (train/step.py).")
    p.add_argument("--num-class", type=int, default=0,
                   help=">=2: class-conditional run — cbn generator + "
                        "dck score head, class-colored blobs, "
                        "same-class batches (reference conditional path), "
                        "reported metric is mean per-class (intra) FID. "
                        "Requires --device-dataset and --arch cifar.")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="network compute dtype; bfloat16 (the TPU MXU "
                        "default and the dtype every recorded run used) "
                        "is EMULATED and ~10x slower on the CPU backend "
                        "— pass float32 with --platform cpu")
    p.add_argument("--micro-batches", type=int, default=1,
                   help="gradient accumulation: process the batch in M "
                        "exact micro-chunks (build_grad_accum_step) at "
                        "1/M activation memory — required for hd512 on "
                        "one chip; needs --device-dataset (the HBM-"
                        "resident path; the host-feed path stays fused)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a JAX backend (default: env default — the "
                        "tunneled TPU here); cpu is a fallback when the "
                        "chip/tunnel is unavailable (tools/preflight.py)")
    args = p.parse_args()

    if args.platform:
        from mmdgan_tpu.utils.backend import force_platform

        force_platform(args.platform)

    if args.sweep:
        if args.steps == 3000:
            args.steps = 2000  # sweep default: 2k steps per branch
        run_sweep(args)
        return

    import jax
    import jax.numpy as jnp

    from experiments.architectures import (
        celeba_architecture, cifar_architecture, lsun_architecture,
        stl_architecture)
    from mmdgan_tpu.metrics.fid import fid_from_activations
    from mmdgan_tpu.metrics.inception import RandomFeatureClassifier
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_multi_step
    from mmdgan_tpu.utils.sprite import write_sprite_wrapper

    os.makedirs(args.out, exist_ok=True)
    cond = args.num_class >= 2
    if cond:
        assert args.device_dataset, "conditional mode needs --device-dataset"
        if args.arch == "cifar":
            arch, size = cifar_architecture(conditional=True), 32
        elif args.arch.startswith("hd"):
            # conditional x hd: cbn/dck composed with the extrapolated
            # family (VERDICT r4 item 5)
            from experiments.architectures import hd_architecture

            size = int(args.arch[2:])
            arch = hd_architecture(size, conditional=True)
        else:
            raise SystemExit("conditional mode supports --arch cifar or "
                             "the hd family")
        model = SNGan(arch, num_class=args.num_class, loss_type=args.loss,
                      compute_dtype=jnp.bfloat16
                      if args.compute_dtype == "bfloat16" else jnp.float32)
        model.sample_same_class = True  # whole batch one class (reference)
    else:
        from experiments.architectures import hd_architecture

        arch_fn, size = {"cifar": (cifar_architecture, 32),
                         "stl": (stl_architecture, 48),
                         "celeba": (celeba_architecture, 64),
                         "lsun": (lsun_architecture, 64),
                         "hd128": (lambda: hd_architecture(128), 128),
                         "hd256": (lambda: hd_architecture(256), 256),
                         "hd512": (lambda: hd_architecture(512), 512),
                         }[args.arch]
        import jax.numpy as _jnp

        model = SNGan(arch_fn(), num_class=0, loss_type=args.loss,
                      compute_dtype=_jnp.bfloat16
                      if args.compute_dtype == "bfloat16" else _jnp.float32)
    opt_d, opt_g = multi_opt_config([args.lr_dis, args.lr_gen])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    data = blob_batches(args.batch, size=size, num_class=args.num_class)
    clf = RandomFeatureClassifier(seed=0)

    data_x = data_y = None
    host_y = None
    if args.device_dataset:
        from mmdgan_tpu.train.step import build_device_data_step, same_class_tables

        n = args.device_dataset
        print(f"pregenerating fixed {n}-image dataset ...", flush=True)
        chunks, ychunks = [], []
        got = 0
        while got < n:
            b = next(data)
            x = b["x"]
            if args.device_dataset_dtype == "uint8":
                x = np.round((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            chunks.append(x)
            if b["y"] is not None:
                ychunks.append(b["y"])
            got += x.shape[0]
        host_ds = np.concatenate(chunks)[:n]
        data_x = jnp.asarray(host_ds)  # one-time upload to HBM
        jax.block_until_ready(data_x)
        print(f"uploaded {data_x.nbytes / 1e6:.0f} MB to HBM", flush=True)
        sc_kwargs = {}
        if cond:
            host_y = np.concatenate(ychunks)[:n]
            data_y = jnp.asarray(host_y)
            table, counts = same_class_tables(host_y, args.num_class)
            sc_kwargs = dict(same_class=True, class_table=table,
                             class_counts=counts)
        if args.sampling != "uniform":
            assert data_x.shape[0] >= args.batch, (
                f"--sampling shuffled_epochs needs at least one full "
                f"batch in the device dataset (rows={data_x.shape[0]} "
                f"< batch={args.batch})")
        step = jax.jit(build_device_data_step(
            model, opt_d, opt_g, num_steps=args.scan_k,
            batch_size=args.batch, sampling=args.sampling,
            micro_batches=args.micro_batches, **sc_kwargs))
        # the held-out "real" pool sees the same uint8 quantization the
        # training path decodes on device
        real_iter = iter(
            (host_ds[i:i + args.batch].astype(np.float32) / 127.5 - 1.0
             if host_ds.dtype == np.uint8 else host_ds[i:i + args.batch])
            for i in range(0, n, args.batch))
    else:
        if args.micro_batches > 1:
            raise SystemExit("--micro-batches needs --device-dataset "
                             "(the HBM-resident path)")
        step = jax.jit(build_multi_step(model, opt_d, opt_g, args.scan_k))
        real_iter = None

    mgr = None
    if args.ckpt_dir:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(
            os.path.abspath(args.ckpt_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True))
        if mgr.latest_step() is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, ts)
            ts = mgr.restore(mgr.latest_step(),
                             args=ocp.args.StandardRestore(abstract))
            print(f"resumed from step {int(ts.step)}", flush=True)

    if cond:
        # per-class held-out pools -> mean per-class (intra) FID: it only
        # drops if the generator actually uses its class conditioning
        per_class = max((args.eval_batches * args.batch) // args.num_class,
                        args.batch)
        real_pool_c = []
        for c in range(args.num_class):
            rows = np.where(host_y.reshape(-1) == c)[0][:per_class]
            imgs = host_ds[rows]
            if imgs.dtype == np.uint8:
                imgs = imgs.astype(np.float32) / 127.5 - 1.0
            real_pool_c.append(np.concatenate([
                clf(imgs[i:i + args.batch])[1]
                for i in range(0, len(imgs), args.batch)]))

        def eval_fid(ts):
            host = jax.device_get(ts)
            fids = []
            for c in range(args.num_class):
                pools = []
                for i in range(0, per_class, args.batch):
                    bsz = min(args.batch, per_class - i)
                    g = np.asarray(jax.device_get(model.generate(
                        host.params, host.net_state,
                        rng=jax.random.PRNGKey(500 + 97 * c + i),
                        labels=np.full((bsz,), c, np.int64))))
                    pools.append(clf(g)[1])
                fids.append(fid_from_activations(
                    real_pool_c[c], np.concatenate(pools)))
            return float(np.mean(fids)), g
    else:
        # held-out real activations
        real_pool = np.concatenate([
            clf(next(real_iter) if real_iter is not None else next(data)["x"])[1]
            for _ in range(args.eval_batches)])

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

    done = int(jax.device_get(ts.step))
    permuter = None
    sched = None
    if args.sampling != "uniform" and data_x is None:
        raise SystemExit("--sampling shuffled_epochs needs "
                         "--device-dataset (HBM-resident path)")
    if data_x is not None and args.sampling == "shuffled_epochs":
        if cond:
            # conditional shuffled epochs: deterministic global class
            # schedule + per-class on-device epoch streams (no permuter)
            from mmdgan_tpu.train.step import class_schedule

            sched = class_schedule(args.num_class, args.steps, seed=0)
        else:
            from mmdgan_tpu.train.step import EpochPermuter

            n_batches = data_x.shape[0] // args.batch
            permuter = EpochPermuter.single_device(data_x.shape[0], seed=0)
            # resume-safe: jump straight to this epoch's layout
            data_x, data_y = permuter.advance(done // n_batches,
                                              [data_x, data_y])
    start = time.time()
    start_step = done
    fid = fid0
    rng_dev = jax.random.PRNGKey(start_step + 1)
    while done < args.steps:
        if data_x is not None:
            if permuter is not None:
                data_x, data_y = permuter.advance(
                    done // n_batches, [data_x, data_y])
            if sched is not None:
                ts, rng_dev, m = step(
                    ts, data_x, data_y, rng_dev, t_flag, t_flag,
                    jnp.asarray(sched[done:done + args.scan_k]))
            else:
                ts, rng_dev, m = step(
                    ts, data_x, data_y, rng_dev, t_flag, t_flag)
        else:
            host = [next(data) for _ in range(args.scan_k)]
            batches = {"x": jnp.asarray(np.stack([b["x"] for b in host])),
                       "y": None}
            ts, m = step(ts, batches, t_flag, t_flag)
        done += args.scan_k
        if done % args.eval_every < args.scan_k:
            fid, g = eval_fid(ts)
            mm = {k: float(np.asarray(jax.device_get(v))[-1])
                  for k, v in m.items() if not k.startswith("hist/")}
            speed = (done - start_step) / (time.time() - start)
            print(f"step {done}: FID = {fid:.4f} loss_gen={mm['loss_gen']:.4f} "
                  f"loss_dis={mm['loss_dis']:.4f} s_x={mm['s_x_mean']:.3f} "
                  f"s_g={mm['s_gen_mean']:.3f} "
                  f"({speed:.1f} steps/s incl. host data)", flush=True)
            write_sprite_wrapper(g[:64], (8, 8), "samples", args.out, f"_step{done}")
            if mgr is not None:
                import orbax.checkpoint as ocp

                mgr.save(done, args=ocp.args.StandardSave(ts))
                mgr.wait_until_finished()
    print(f"FID {fid0:.3f} -> {fid:.3f} "
          f"({'LEARNING' if fid < 0.5 * fid0 else 'check dynamics'})")

    if mgr is not None:
        # prove the final checkpoint is resumable: save, restore into a
        # fresh abstract tree, assert bitwise equality of every leaf
        import orbax.checkpoint as ocp

        mgr.save(done, args=ocp.args.StandardSave(ts))
        mgr.wait_until_finished()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, ts)
        restored = mgr.restore(done, args=ocp.args.StandardRestore(abstract))
        host_a = jax.device_get(ts)
        host_b = jax.device_get(restored)
        mismatch = [
            jax.tree_util.keystr(path)
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(host_a),
                jax.tree.leaves(host_b))
            if not np.array_equal(np.asarray(a), np.asarray(b))
        ]
        assert not mismatch, f"restore mismatch at {mismatch[:5]}"
        # one more fused call from the restored state must run clean
        if data_x is not None:
            restored, _, m2 = step(restored, data_x, data_y, rng_dev,
                                   t_flag, t_flag)
        else:
            host = [next(data) for _ in range(args.scan_k)]
            batches = {"x": jnp.asarray(np.stack([b["x"] for b in host])),
                       "y": None}
            restored, m2 = step(restored, batches, t_flag, t_flag)
        lg = float(np.asarray(jax.device_get(m2["loss_gen"]))[-1])
        assert np.isfinite(lg)
        print(f"checkpoint at step {done}: restore bitwise-equal, "
              f"resumed step loss_gen={lg:.4f} — RESUMABLE", flush=True)


if __name__ == "__main__":
    main()
