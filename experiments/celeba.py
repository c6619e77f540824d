#!/usr/bin/env python
"""CelebA 64x64 MMD-GAN — rebuild of my_test_celebA.py.

Defaults: batch 64, lr 1e-4/2e-4, act_k=64^0.1, loss 'rep'; the dataset is
9 sharded files celebA_000..008.tfrecords with 22511 images each
(my_test_celebA.py:7-9, :44, :58).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.architectures import celeba_architecture
from experiments.runner import build_arg_parser, run_experiment


def main():
    parser = build_arg_parser("celebA")
    parser.add_argument("--num-files", type=int, default=9)
    parser.set_defaults(lr_dis=1e-4, lr_gen=2e-4)
    args = parser.parse_args()
    act_k = args.act_k if args.act_k is not None else float(np.power(64.0, 0.1))
    arch = celeba_architecture(act_k=act_k)
    filenames = [f"celebA_{i:03d}" for i in range(args.num_files)]
    run_experiment(
        args, arch, filenames if not args.synthetic_data else "celebA",
        num_instance=22511 * args.num_files, input_chw=(3, 64, 64))


if __name__ == "__main__":
    main()
