#!/usr/bin/env python
"""End-to-end rehearsal of the real-inception FID/IS parity path
(VERDICT r3 next #6).

The ONLY artifact of the reference's metric protocol that this
zero-egress environment cannot provide is the frozen inception weights
file. This tool drives every other link of the chain, exactly as
`experiments/runner.py` would with `--inception-pb`:

1. synthesize the inception-shaped random-weight .pb
   (`tools/make_fake_inception.py`: Mul:0 -> pool_3:0 [N,1,1,2048] /
   logits:0 [N,1008], legacy BNWGN/LRN/Concat op set, producer=8);
2. CROSS-CHECK the GraphDef->JAX executor against TensorFlow's own
   execution of the identical graph (BNWGN rewritten to its defining
   primitives for TF only — modern TF refuses the legacy op);
3. restore a TRAINED checkpoint (any `tools/quality_smoke.py --ckpt-dir`
   run of the CIFAR arch), then run the reference evaluation protocol
   (graph_func.py:1748-1799): ``--eval-batches`` x ``--batch`` real and
   generated batches through the classifier ->
   IS(x), IS(g), FID(x half vs half), FID(x, g).

The heavy flow runs on whatever `jax.devices()` provides (the tunneled
TPU chip by default — batched TPU-resident inference, the BASELINE
north-star); the TF cross-check always runs on host CPU. With the real
`inception_v1_2015_12_05` weights this same command produces
publication-comparable numbers: pass ``--pb /path/to/real.pb
--no-crosscheck`` (the real pb needs no synthesis and TF cross-checking
it requires the same BNWGN rewrite, which `make_fake_inception.debnwgn`
performs on any GraphDef).

Usage:
  python tools/inception_rehearsal.py --ckpt-dir /path/to/ckpt \
      --eval-batches 781 --batch 64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def crosscheck(pb: str, twin: str, batch: int, n_batches: int) -> float:
    """JAX-executor(original pb) vs TF(twin pb) on random images."""
    from mmdgan_tpu.metrics.inception import FrozenGraphClassifier

    rng = np.random.RandomState(7)
    worst = 0.0
    jx = FrozenGraphClassifier(pb, backend="jax")
    tfc = FrozenGraphClassifier(twin, backend="tf")
    for i in range(n_batches):
        imgs = rng.rand(batch, 32, 32, 3).astype(np.float32) * 2 - 1
        lj, pj = jx(imgs)
        lt, pt = tfc(imgs)
        rl = float(np.abs(lj - lt).max() / (np.abs(lt).max() + 1e-9))
        rp = float(np.abs(pj - pt).max() / (np.abs(pt).max() + 1e-9))
        worst = max(worst, rl, rp)
    return worst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pb", default="/tmp/fake_inception_v1.pb",
                   help="frozen graph; synthesized if missing")
    p.add_argument("--ckpt-dir", required=True,
                   help="orbax dir of a trained CIFAR-arch run "
                        "(tools/quality_smoke.py --ckpt-dir)")
    p.add_argument("--loss", default="rmb",
                   help="loss the checkpointed run used (opt-state shape)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--eval-batches", type=int, default=781,
                   help="reference protocol: 781*64 ~ 50k samples")
    p.add_argument("--crosscheck-batches", type=int, default=2)
    p.add_argument("--no-crosscheck", action="store_true")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if not os.path.isfile(args.pb):
        from tools.make_fake_inception import build_graph_def, debnwgn

        gd = build_graph_def(seed=0)
        with open(args.pb, "wb") as f:
            f.write(gd.SerializeToString())
        twin = os.path.splitext(args.pb)[0] + "_tfexec.pb"
        with open(twin, "wb") as f:
            f.write(debnwgn(gd).SerializeToString())
        print(f"synthesized {args.pb} + twin", flush=True)
    else:
        twin = os.path.splitext(args.pb)[0] + "_tfexec.pb"

    worst = None
    if not args.no_crosscheck:
        worst = crosscheck(args.pb, twin, min(args.batch, 32),
                           args.crosscheck_batches)
        print(f"executor vs TF cross-check: max rel diff {worst:.2e}",
              flush=True)
        assert worst < 1e-4, worst

    # --- restore the trained model (quality_smoke checkpoint layout) ---
    import orbax.checkpoint as ocp

    from experiments.architectures import cifar_architecture
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from tools.quality_smoke import blob_batches

    model = SNGan(cifar_architecture(), num_class=0, loss_type=args.loss)
    opt_d, opt_g = multi_opt_config([5e-4, 2e-4])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {args.ckpt_dir}"
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, ts)
    ts = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    print(f"restored trained checkpoint at step {step}", flush=True)

    # --- the reference evaluation protocol -----------------------------
    from mmdgan_tpu.metrics.inception import FrozenGraphClassifier
    from mmdgan_tpu.metrics.scores import GenerativeModelMetric

    metric = GenerativeModelMetric(
        classifier=FrozenGraphClassifier(args.pb, backend="jax"))
    host = jax.device_get(ts)
    # blob_batches yields {"x": images, "y": labels} training batches;
    # the metric protocol consumes bare image arrays
    data = (b["x"] for b in blob_batches(args.batch, size=32))

    def gen_batches():
        i = 0
        while True:
            g = model.generate(host.params, host.net_state,
                               rng=jax.random.PRNGKey(1000 + i),
                               batch_size=args.batch)
            yield np.asarray(jax.device_get(g))
            i += 1

    t0 = time.time()
    inc_x, inc_g, fid_xx, fid_xg = metric.inception_score_and_fid(
        data, gen_batches(), num_batch=args.eval_batches)
    dt = time.time() - t0
    n = args.eval_batches * args.batch
    line = {
        "metric": "inception_rehearsal",
        "pb": args.pb,
        "ckpt_step": int(step),
        "samples": n,
        "is_x": round(float(inc_x), 4),
        "is_g": round(float(inc_g), 4),
        "fid_xx": round(float(fid_xx), 4),
        "fid_xg": round(float(fid_xg), 4),
        "crosscheck_max_rel_diff": worst,
        "eval_seconds": round(dt, 1),
        "images_per_sec": round(2 * n / dt, 1),
        "note": ("random-weight inception-SHAPED graph — numbers are not "
                 "publication-comparable; swap --pb for the real "
                 "inception_v1_2015_12_05 .pb for parity"),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
