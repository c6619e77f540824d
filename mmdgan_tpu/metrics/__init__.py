"""Evaluation metrics: Inception Score, FID, MS-SSIM, intra-FID.

Rebuild of ``GenerativeModelMetric`` (graph_func.py:1607-2094) with a
pluggable classifier backend (frozen inception graph via TF when the .pb
is available — the reference's exact parity path — or any JAX feature
extractor).
"""

from mmdgan_tpu.metrics.fid import (  # noqa: F401
    fid_from_activations,
    inception_score_from_logits,
    mean_cov_np,
    sqrt_sym_mat_np,
    trace_sqrt_product_np,
)
from mmdgan_tpu.metrics.msssim import ms_ssim  # noqa: F401
from mmdgan_tpu.metrics.scores import GenerativeModelMetric  # noqa: F401
from mmdgan_tpu.metrics.inception import InceptionClassifier  # noqa: F401
