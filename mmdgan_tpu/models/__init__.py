"""Architecture-dictionary-driven model construction.

Rebuilds the reference layer compiler (``GeneralTools/layer_func.py``) as a
functional JAX module system: ops/layers/networks are built once from the
architecture dict with full static shape inference (NHWC internally — the
TPU-native layout), then expose ``init(key) -> (params, state)`` and
``apply(params, state, x, train) -> (y, new_state)``.
"""

from mmdgan_tpu.models.layers import Layer, update_layer_design  # noqa: F401
from mmdgan_tpu.models.network import Net, Routine  # noqa: F401
from mmdgan_tpu.models.ops import ParametricOp  # noqa: F401
from mmdgan_tpu.models.scaling import ImageScaling  # noqa: F401
from mmdgan_tpu.models.sngan import SNGan  # noqa: F401
