#!/usr/bin/env python
"""CIFAR-10 32x32 MMD-GAN — rebuild of my_test_cifar.py.

Defaults match the reference entry script: batch 64, Adam TTUR
lr_dis=5e-4 / lr_gen=2e-4, act_k=64^0.125, loss 'rep', 8 x 12,500 steps
(my_test_cifar.py:10, :43-44, :56-57, :83).

Dataset: expects cifar.tfrecords (raw CHW uint8 under 'x') in --data-dir;
build it with mmdgan_tpu.data.converters.binary_image_to_tfrecords from
the CIFAR-10 binary batches. Use --synthetic-data for a smoke run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.architectures import cifar_architecture
from experiments.runner import build_arg_parser, run_experiment


def main():
    args = build_arg_parser("cifar").parse_args()
    act_k = args.act_k if args.act_k is not None else float(np.power(64.0, 0.125))
    # labeled runs get the class-conditional variant (cbn generator +
    # dck score head) the reference builds for num_class >= 2
    arch = cifar_architecture(act_k=act_k, conditional=args.num_class >= 2)
    run_experiment(args, arch, "cifar", num_instance=50000, input_chw=(3, 32, 32))


if __name__ == "__main__":
    main()
