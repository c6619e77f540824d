"""mmdgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) MMD-GAN framework.

A from-scratch rebuild of the capability surface of richardwth/MMD-GAN
(ICLR-2019 repulsive-loss MMD-GAN on TF1) designed for TPU hardware:

- ``mmdgan_tpu.ops``      — pairwise distances, the full MMD kernel/loss
  catalogue (rep/rmb first-class), spectral normalization via power
  iteration on the convolution operator (PICO), fused Pallas loss kernels.
- ``mmdgan_tpu.models``   — architecture-dictionary-driven network builder
  (the reference's layer compiler re-imagined as a functional JAX module
  system), SNGan model.
- ``mmdgan_tpu.parallel`` — SPMD data-parallel training over a
  ``jax.sharding.Mesh``; global-batch MMD semantics under pjit.
- ``mmdgan_tpu.train``    — TTUR dual-optimizer train step, Agent runtime
  with Orbax checkpointing, divergence guards, summaries, profiling.
- ``mmdgan_tpu.data``     — TFRecord input pipeline (native C++ reader with
  pure-Python fallback), dataset converters, toy distributions.
- ``mmdgan_tpu.metrics``  — Inception Score / FID / MS-SSIM evaluation.

Reference layout mapping (see SURVEY.md):
  GeneralTools/math_func.py  -> mmdgan_tpu/ops/
  GeneralTools/layer_func.py -> mmdgan_tpu/models/
  DeepLearning/my_sngan.py   -> mmdgan_tpu/models/sngan.py
  GeneralTools/input_func.py -> mmdgan_tpu/data/
  GeneralTools/graph_func.py -> mmdgan_tpu/train/ + mmdgan_tpu/metrics/
  my_test_*.py               -> experiments/
"""

__version__ = "0.1.0"

from mmdgan_tpu.config import Config, get_config, set_config  # noqa: F401
