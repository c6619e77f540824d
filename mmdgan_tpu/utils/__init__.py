"""Utilities: metric writing, folders, profiling, sprites, latent codes."""

from mmdgan_tpu.utils.summary import MetricWriter  # noqa: F401
from mmdgan_tpu.utils.folders import prepare_folder  # noqa: F401
