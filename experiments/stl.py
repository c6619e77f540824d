#!/usr/bin/env python
"""STL-10 48x48 MMD-GAN — rebuild of my_test_stl.py.

Defaults: batch 64, lr 2e-4/2e-4, act_k=64^0.125, loss 'rep',
num_instance=100000 (my_test_stl.py:36-38, :51). The reference script has
a latent NameError (undefined num_class at :73) which is fixed here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.architectures import stl_architecture
from experiments.runner import build_arg_parser, run_experiment


def main():
    parser = build_arg_parser("stl")
    parser.set_defaults(lr_dis=2e-4, lr_gen=2e-4)
    args = parser.parse_args()
    act_k = args.act_k if args.act_k is not None else float(np.power(64.0, 0.125))
    arch = stl_architecture(act_k=act_k)
    run_experiment(args, arch, "stl", num_instance=100000, input_chw=(3, 48, 48))


if __name__ == "__main__":
    main()
