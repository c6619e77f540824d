"""Read back training metrics for offline analysis.

Rebuild of ``read_event_file`` (input_func.py:1166-1200, which parsed
TensorBoard event files): the primary log here is the JSONL metric stream
(always written by :class:`MetricWriter`); TensorBoard event files are
also readable when TensorFlow is importable.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def read_metrics_jsonl(path: str, keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """Parse a metrics.jsonl (or its directory) into {key: array};
    always includes 'step'."""
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    records: List[dict] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        return {}
    if keys is None:
        keys = sorted({k for r in records for k in r if k != "time"})
    out = {}
    for k in keys:
        out[k] = np.asarray([r.get(k, np.nan) for r in records])
    return out


def read_event_file(event_path: str, tags: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """Extract scalar series from a TensorBoard event file
    (input_func.py:1166 equivalent). Requires TensorFlow.

    Returns {tag: [[step, value], ...]} arrays.
    """
    import tensorflow as tf

    if os.path.isdir(event_path):
        candidates = sorted(glob.glob(os.path.join(event_path, "events.out.tfevents.*")))
        if not candidates:
            raise FileNotFoundError(f"no event files in {event_path}")
        event_path = candidates[-1]
    series: Dict[str, list] = {}
    for record in tf.data.TFRecordDataset([event_path]):
        event = tf.compat.v1.Event.FromString(record.numpy())
        if not event.HasField("summary"):
            continue
        for value in event.summary.value:
            if tags is not None and value.tag not in tags:
                continue
            if value.HasField("simple_value"):
                series.setdefault(value.tag, []).append(
                    (event.step, value.simple_value))
            elif value.HasField("tensor"):
                try:
                    v = float(tf.make_ndarray(value.tensor))
                    series.setdefault(value.tag, []).append((event.step, v))
                except Exception:
                    pass
    return {k: np.asarray(v) for k, v in series.items()}
