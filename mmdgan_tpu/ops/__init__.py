"""Core math ops: pairwise distances, MMD kernels, GAN losses, spectral norm.

Rebuilds the capability surface of the reference's
``GeneralTools/math_func.py`` as pure-functional JAX (all functions are
jit/vmap/grad-compatible; no hidden state, no summaries — observability is
returned as auxiliary dictionaries instead of TF summary side effects).
"""

from mmdgan_tpu.ops.distance import (  # noqa: F401
    get_squared_dist,
    get_squared_dist_ref,
    get_batch_squared_dist,
    squared_dist_triplet,
    slice_pairwise_distance,
)
from mmdgan_tpu.ops.kernels import (  # noqa: F401
    matrix_mean_wo_diagonal,
    row_mean_wo_diagonal,
    mmd_g,
    mmd_g_bounded,
    mixture_mmd_g,
    mmd_t,
    mixture_mmd_t,
    cramer,
    witness_g,
    witness_mix_g,
    witness_t,
    witness_mix_t,
    mmd_g_xn,
    mixture_g_xn,
    rand_mmd_g,
    rand_mmd_g_xy,
    rand_mmd_g_xy_bounded,
    rand_mmd_g_xn,
)
from mmdgan_tpu.ops.losses import GANLoss, LossState, gan_loss  # noqa: F401
from mmdgan_tpu.ops.spectral_norm import (  # noqa: F401
    SpectralNorm,
    spectral_norm_init,
    spectral_norm_apply,
)
