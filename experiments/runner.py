"""Shared experiment runner: the my_test_*.py training/eval protocol as a
config-driven CLI (train N chunks -> sample grid -> IS/FID each chunk;
my_test_cifar.py:83-94), with proper argparse instead of the reference's
hard-coded script constants.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from typing import Optional, Sequence

import numpy as np


def build_arg_parser(dataset: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=f"Train MMD-GAN ({dataset}) — TPU-native rebuild of "
                    f"the reference my_test_{dataset}.py")
    p.add_argument("--loss", default="rep",
                   help="loss type: rep | rmb | hinge | mmd_g | mmd_t | rand_g | ... ")
    p.add_argument("--lr-dis", type=float, default=5e-4)
    p.add_argument("--lr-gen", type=float, default=2e-4)
    p.add_argument("--end-lr", type=float, default=1e-7)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--bf16-moments", action="store_true",
                   help="store optimizer slots (Adam m/v) in bfloat16 — "
                        "~6%% faster step, breaks strict TF1 parity")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--act-k", type=float, default=None,
                   help="activation compensation multiplier (default per dataset)")
    p.add_argument("--rep-w0", type=float, default=0.0)
    p.add_argument("--rep-w1", type=float, default=-1.0)
    p.add_argument("--chunks", type=int, default=8,
                   help="number of train->eval rounds (reference: 8)")
    p.add_argument("--steps-per-chunk", type=int, default=12500)
    p.add_argument("--num-class", type=int, default=0)
    p.add_argument("--sample-same-class", action="store_true")
    p.add_argument("--imbalanced-update", default=None,
                   help="'d,g' period list (e.g. '1,5'), or 'dynamic'")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--synthetic-data", action="store_true",
                   help="train on synthetic images (no dataset needed)")
    p.add_argument("--debug-mode", default="false",
                   choices=["false", "true", "none"],
                   help="false: full run; true: short debug run; none: print model only")
    p.add_argument("--debug-step", type=int, default=400)
    p.add_argument("--query-step", type=int, default=1000)
    p.add_argument("--trace", action="store_true", help="profile last 5 steps")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--load-ckpt", action="store_true", default=True)
    p.add_argument("--fresh", dest="load_ckpt", action="store_false")
    p.add_argument("--eval-batches", type=int, default=781,
                   help="metric batches per eval (781*64 ~ 50k samples)")
    p.add_argument("--skip-metrics", action="store_true")
    p.add_argument("--skip-sampling", action="store_true")
    p.add_argument("--inception-pb", default=None,
                   help="path to frozen inception .pb for exact IS/FID parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--steps-per-call", type=int, default=16,
                   help="fuse K train steps per device launch (lax.scan); "
                        "amortizes dispatch latency, requires a constant "
                        "update schedule")
    p.add_argument("--device-dataset", action="store_true",
                   help="upload the whole dataset to HBM once and sample "
                        "batches on device (zero per-step host transfer; "
                        "for datasets that fit, e.g. CIFAR/CelebA)")
    p.add_argument("--sampling", default="uniform",
                   choices=["uniform", "shuffled_epochs"],
                   help="HBM-dataset batch strategy: uniform "
                        "with-replacement gather, or shuffled_epochs "
                        "(without-replacement epoch slices, re-permuted "
                        "per epoch; removes the gather cost — CIFAR b64 "
                        "412 -> 459 steps/s, tools/hbm_study.py; not "
                        "combinable with --sample-same-class)")
    p.add_argument("--host-decode", action="store_true",
                   help="scale images to f32 on the host instead of the "
                        "device (device decode moves 4x fewer bytes)")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas MMD loss kernel (TPU)")
    p.add_argument("--summary-histograms", action="store_true",
                   help="emit hist/* distance/score histograms from "
                        "inside the train step (measured ~6%% step cost "
                        "on CIFAR; loss-internals scalars are always on)")
    p.add_argument("--param-hist-step", type=int, default=0,
                   help="write per-variable parameter histograms every N "
                        "steps (host-side fetch; 0 = off)")
    p.add_argument("--micro-batches", type=int, default=1, metavar="M",
                   help="gradient accumulation: run each optimizer step "
                        "in M micro-batch chunks at 1/M activation "
                        "memory with EXACT global-batch MMD semantics, "
                        "incl. penalty/scale losses (docs/SCALING.md; "
                        "~2x forward FLOPs; composes with "
                        "--device-dataset — the 512-scale configuration)")
    p.add_argument("--compilation-cache", default="", metavar="DIR",
                   help="persistent XLA compilation cache directory: a "
                        "restarted process (resume / next chunk / serving "
                        "worker) skips recompiling the train step "
                        "(measured 5x faster restart compiles on the v5e; "
                        "utils/compilation_cache.py)")
    return p


def run_experiment(
    args,
    architecture: dict,
    filename,
    num_instance: int,
    input_chw: Sequence[int],
):
    import jax
    import jax.numpy as jnp

    from mmdgan_tpu.config import get_config, set_config
    from mmdgan_tpu.data import ReadTFRecords, synthetic_image_batches
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.parallel import DataParallel
    from mmdgan_tpu.train import (
        Agent,
        build_train_step,
        init_train_state,
        multi_opt_config,
    )

    cfg = get_config()
    if args.data_dir:
        cfg = cfg.with_updates(data_dir=args.data_dir)
    if args.out_dir:
        cfg = cfg.with_updates(output_dir=args.out_dir)
    if args.inception_pb:
        cfg = cfg.with_updates(inception_npz=args.inception_pb)
    set_config(cfg)

    if args.compilation_cache:
        from mmdgan_tpu.utils.compilation_cache import enable_compilation_cache

        print(f"Compilation cache: "
              f"{enable_compilation_cache(args.compilation_cache)}")

    c, h, w = input_chw
    loss_type = args.loss
    lr_list = [args.lr_dis, args.lr_gen]
    rep_weights = [args.rep_w0, args.rep_w1]
    act_k = architecture["discriminator"][-1].get("act_k", 1.0)
    if loss_type in ("rep", "rmb"):
        sub_folder = "sngan_{}_{:.0e}_{:.0e}_k{:.3g}_{:.1f}_{:.1f}".format(
            loss_type, lr_list[0], lr_list[1], act_k, rep_weights[0], rep_weights[1])
    else:
        sub_folder = "sngan_{}_{:.0e}_{:.0e}_k{:.3g}".format(
            loss_type, lr_list[0], lr_list[1], act_k)

    debug_mode = {"false": False, "true": True, "none": None}[args.debug_mode]
    imbalanced = args.imbalanced_update
    if imbalanced and imbalanced != "dynamic":
        imbalanced = [int(v) for v in imbalanced.split(",")]

    agent = Agent(
        filename if isinstance(filename, str) else filename[0].split("_")[0],
        sub_folder,
        load_ckpt=args.load_ckpt,
        do_trace=args.trace,
        do_save=not args.no_save,
        debug_mode=debug_mode,
        debug_step=args.debug_step,
        query_step=args.query_step,
        imbalanced_update=imbalanced,
        print_loss=True,
        output_dir=cfg.output_dir,
        param_hist_step=args.param_hist_step,
    )

    model = SNGan(
        architecture,
        num_class=args.num_class,
        loss_type=loss_type,
        optimizer=args.optimizer,
        rep_weights=rep_weights,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
        use_pallas=args.use_pallas,
        summary_histograms=args.summary_histograms,
    )
    model.sample_same_class = args.sample_same_class

    step_per_epoch = int(np.floor(num_instance / args.batch_size))
    # file_repeat gcd trick (my_sngan.py:381-397)
    if args.steps_per_chunk >= step_per_epoch or isinstance(filename, str):
        file_repeat = (
            int(args.batch_size / math.gcd(num_instance, args.batch_size))
            if args.num_class < 2 else
            int(args.batch_size / math.gcd(
                int(num_instance / max(args.num_class, 1)), args.batch_size))
        )
        shuffle_file = False
    else:
        file_repeat = 1
        shuffle_file = True

    def make_data_iter():
        if args.synthetic_data:
            return synthetic_image_batches(
                args.batch_size, h, w, c, num_class=args.num_class, seed=args.seed)
        pipe = ReadTFRecords(
            filename,
            num_labels=0 if args.num_class < 2 else 1,
            batch_size=args.batch_size,
            file_repeat=file_repeat,
            shuffle_file=shuffle_file,
            device_decode=not args.host_decode,
        ).shape2image(c, h, w)
        return pipe.next_batch(args.sample_same_class)

    opt_d, opt_g = multi_opt_config(
        lr_list, end_lr=args.end_lr, optimizer=args.optimizer,
        target_step=args.chunks * args.steps_per_chunk,
        bf16_moments=args.bf16_moments)
    ts = init_train_state(model, jax.random.PRNGKey(args.seed), opt_d, opt_g)
    # the HBM-resident path builds its own step inside train_device_data
    # (build_device_data_step composes the on-device sampler with the
    # accumulated step — the 512² config); only the host-fed/synthetic
    # path needs a step_fn here
    use_device_data = args.device_dataset and not args.synthetic_data
    step_fn = None
    if not use_device_data:
        if args.micro_batches > 1:
            from mmdgan_tpu.train.step import build_grad_accum_step

            step_fn = build_grad_accum_step(
                model, opt_d, opt_g, args.micro_batches)
        else:
            step_fn = build_train_step(model, opt_d, opt_g)
    dp = DataParallel()
    print(f"Devices: {dp.num_devices}; Num instance: {num_instance}; "
          f"Num class: {args.num_class}; Batch: {args.batch_size}; "
          f"File_repeat: {file_repeat}")

    code_x = np.random.RandomState(args.seed).randn(400, model.code_size).astype(np.float32)

    if args.sampling != "uniform":
        assert args.device_dataset and not args.synthetic_data, (
            "--sampling shuffled_epochs only applies to the HBM-resident "
            "dataset path: pass --device-dataset (without "
            "--synthetic-data), or the flag would be silently ignored")

    device_data = None
    if use_device_data:
        pipe = ReadTFRecords(
            filename, num_labels=0 if args.num_class < 2 else 1,
            batch_size=args.batch_size, device_decode=True,
        ).shape2image(c, h, w)
        device_data = pipe.load_all()
        print(f"Device-resident dataset: x{device_data['x'].shape} "
              f"{device_data['x'].dtype} "
              f"({device_data['x'].nbytes / 1e6:.0f} MB to HBM)")

    # assumed TF1-GPU reference throughput at this resolution (bench.py
    # BASELINES: 12 steps/s at 32x32, scaled by pixel count)
    baseline_sps = 12.0 * (32.0 / max(h, w)) ** 2
    train_seconds = 0.0
    train_steps = 0

    for chunk in range(args.chunks):
        step_before = int(jax.device_get(ts.step))
        t_train = time.time()
        if device_data is not None:
            ts = agent.train_device_data(
                model, opt_d, opt_g, ts, device_data,
                max_step=args.steps_per_chunk if debug_mode is not True else args.debug_step,
                step_per_epoch=step_per_epoch,
                batch_size=args.batch_size,
                steps_per_call=max(args.steps_per_call, 16),
                summary_image_fn=lambda ts: model.generate(
                    ts.params, ts.net_state, rng=jax.random.PRNGKey(chunk), batch_size=8),
                seed=args.seed + chunk,
                sample_same_class=args.sample_same_class,
                sampling=args.sampling,
                # per-chunk seed varies the noise stream; the epoch
                # permutation family must NOT change at chunk boundaries
                # (an epoch straddling one would lose the
                # without-replacement guarantee)
                sampling_seed=args.seed,
                micro_batches=args.micro_batches,
            )
        else:
            ts = agent.train(
                step_fn, ts, make_data_iter(),
                max_step=args.steps_per_chunk if debug_mode is not True else args.debug_step,
                step_per_epoch=step_per_epoch,
                dp=dp,
                summary_image_fn=lambda ts: model.generate(
                    ts.params, ts.net_state, rng=jax.random.PRNGKey(chunk), batch_size=8),
                steps_per_call=args.steps_per_call,
            )
        if debug_mode is None:
            return ts
        host_ts = jax.device_get(ts)
        gstep = int(host_ts.step)
        train_seconds += time.time() - t_train
        train_steps += gstep - step_before
        # per-layer spectral norms (reference kernel_norm summaries)
        norms = model.Dis.kernel_norms(
            host_ts.params["dis"], host_ts.net_state["dis"])
        agent.writer.scalars(gstep, {
            f"sigma/{k}": float(v) for k, v in norms.items()
            if np.ndim(v) == 0 or np.size(v) == 1
        })
        if not args.skip_sampling:
            model.eval_sampling(
                host_ts.params, host_ts.net_state, agent.filename, sub_folder,
                mesh_num=(20, 20), mesh_mode=0, code_x=code_x,
                do_sprite=True, do_embedding=False, get_dis_score=False,
                output_dir=cfg.output_dir, global_step=gstep,
            )
        if debug_mode is False and not args.skip_metrics:
            scores = model.mdl_score(
                host_ts.params, host_ts.net_state, make_data_iter(),
                batch_size=args.batch_size, num_batch=args.eval_batches,
                model="v1", model_path=cfg.inception_npz,
                key=jax.random.PRNGKey(1000 + chunk),
            )
            print(f"Chunk {chunk} scores (inc_x, inc_g, fid_xx, fid_xg): {scores}")
            agent.writer.scalars(gstep, {
                "eval/inception_real": scores[0],
                "eval/inception_gen": scores[1],
                "eval/fid_xx": scores[2],
                "eval/fid_xg": scores[3],
            })
    if train_steps > 0 and train_seconds > 0:
        sps = train_steps / train_seconds
        # driver-style machine-readable perf record: long quality runs
        # double as throughput records (same schema as bench.py)
        print(json.dumps({
            "metric": f"train_steps_per_sec_{agent.filename}",
            "value": round(sps, 2),
            "unit": "steps/sec",
            "vs_baseline": round(sps / baseline_sps, 3),
        }), flush=True)
    print("Chunk of code finished.")
    return ts
