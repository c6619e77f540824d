"""Input pipelines: TFRecord reading/writing (native C++ fast path with
pure-Python fallback), dataset converters, toy distributions, synthetic
data for tests/benchmarks.

Rebuilds ``GeneralTools/input_func.py`` without a TensorFlow dependency:
the TFRecord container format and the tf.Example wire format are small and
implemented directly (``mmdgan_tpu/data/tfrecord.py``, ``native/tfrec.cc``).
"""

from mmdgan_tpu.data.tfrecord import (  # noqa: F401
    TFRecordReader,
    TFRecordWriter,
    make_example,
    parse_example,
)
from mmdgan_tpu.data.pipeline import ReadTFRecords  # noqa: F401
from mmdgan_tpu.data.simdata import SimData  # noqa: F401
from mmdgan_tpu.data.synthetic import synthetic_image_batches  # noqa: F401
from mmdgan_tpu.data.converters import (  # noqa: F401
    binary_image_to_tfrecords,
    np_to_tfrecords,
    raw_image_to_tfrecords,
)
