"""Worker for test_trainer.py::test_sigterm_preemption_checkpoints.

Trains a tiny model on the HBM-dataset path for a deliberately huge
max_step; the parent sends SIGTERM mid-run and asserts the run stops at
a step-window boundary with a checkpoint on disk. Run with ``python -u``
so the parent sees the query-step lines promptly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mmdgan_tpu.models import SNGan
from mmdgan_tpu.train import init_train_state, multi_opt_config
from mmdgan_tpu.train.trainer import Agent

ARCH = {
    "input": [(1, 8, 8)],
    "code": [(8, "linear")],
    "generator": [
        {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
         "act_nm": None, "out_reshape": [1, 8, 8]}],
    "discriminator": [
        {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
         "act_k": 1.0, "in_reshape": [8 * 8]}],
}


def main():
    out_dir = sys.argv[1]
    model = SNGan(ARCH, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    ts = init_train_state(model, jax.random.PRNGKey(0), opt_d, opt_g)
    data = {"x": np.random.RandomState(0).randint(
        0, 256, size=(64, 8, 8, 1), dtype=np.uint8), "y": None}
    agent = Agent("preempt", "t", output_dir=out_dir, query_step=64,
                  do_save=True, use_tensorboard=False)
    ts = agent.train_device_data(
        model, opt_d, opt_g, ts, data, max_step=200000, step_per_epoch=4,
        batch_size=16, steps_per_call=8, seed=0)
    print("FINAL", int(jax.device_get(ts.step)), flush=True)


if __name__ == "__main__":
    main()
