"""Immutable configuration for the framework.

Replaces the reference's global mutable ``FLAGS`` singleton
(``GeneralTools/misc_fun.py:25-60``) with a frozen dataclass. A single
module-level default instance exists for convenience, but all library code
takes an explicit ``Config`` (or reads fields off the objects it is given),
so there is no import-order sensitivity (the reference required FLAGS to be
mutated *before* importing dependent modules, ``my_test_cifar.py:2-3``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-wide configuration.

    Mirrors the knobs of the reference FLAGS (misc_fun.py:25-60) plus
    TPU-specific options.
    """

    # --- paths (misc_fun.py:37-44) ---
    data_dir: str = os.path.expanduser("~/mmdgan_data")
    output_dir: str = os.path.expanduser("~/mmdgan_out")
    inception_npz: Optional[str] = None  # converted inception-v1 weights

    # --- numerics ---
    # misc_fun.py:29 FLAGS.EPSI
    epsi: float = 1e-10
    # seed used when none is supplied
    seed: int = 0

    # --- model-building (misc_fun.py:50-53) ---
    # Internal compute layout. The reference is NCHW ('channels_first');
    # TPU convolutions want NHWC, which is our default. Architecture dicts
    # written for the reference (channels_first shapes) are converted by the
    # builder.
    image_format: str = "channels_last"
    # 'default' (variance-scaling per activation) or 'sn_paper'
    # (trunc-normal 0.02) — layer_func.py:26-64
    weight_initializer: str = "default"
    # 'pico' — power iteration on the conv operator itself (default in the
    # reference, math_func.py:397-749); 'pim' — power iteration on the
    # reshaped kernel matrix (layer_func.py:811-814)
    spectral_norm_mode: str = "pico"

    # --- TPU performance ---
    # dtype used inside conv/matmul compute; params and loss stay float32.
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas kernel for the rep/rmb loss where available.
    use_pallas: bool = False
    # donate input buffers of the train step (saves HBM)
    donate_state: bool = True

    # --- data-parallel mesh ---
    mesh_axis: str = "data"

    def with_updates(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_default_config = Config()


def get_config() -> Config:
    return _default_config


def set_config(cfg: Config) -> None:
    """Replace the process-default config (used by entry scripts only)."""
    global _default_config
    _default_config = cfg
