"""Metric / summary writer.

Replaces the reference's TensorBoard summary plumbing (scalars, images;
graph_func.py:843-866, my_sngan.py:449-463) with a JSONL event log that is
always on plus an optional TensorBoard writer (torch.utils.tensorboard)
when available. JSONL keeps observability dependency-free and trivially
machine-readable for the parity/bench harness.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[k] = float(v)
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def histogram(self, step: int, tag: str, counts: np.ndarray,
                  lo: float, hi: float):
        """Write a precomputed fixed-bin histogram (counts over
        ``nbins`` equal bins spanning [lo, hi]) — the JSONL record keeps
        the raw counts + range; TensorBoard gets a reconstructed sample
        at bin centers (first/last bin include clipped out-of-range
        mass). Replaces the reference's tf.summary.histogram
        (math_func.py:806-838, my_sngan.py:309-321)."""
        counts = np.asarray(counts, np.float64).reshape(-1)
        rec = {"step": int(step), "time": time.time(), "hist": tag,
               "lo": float(lo), "hi": float(hi),
               "counts": [int(c) for c in counts]}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            nbins = len(counts)
            edges = np.linspace(lo, hi, nbins + 1)
            centers = 0.5 * (edges[:-1] + edges[1:])
            reps = np.repeat(centers, counts.astype(np.int64))
            if reps.size:
                self._tb.add_histogram(tag, reps, int(step))

    def raw_histogram(self, step: int, tag: str, values: np.ndarray,
                      nbins: int = 64):
        """Histogram host-side raw values (e.g. parameter tensors at
        query steps) with data-driven range."""
        values = np.asarray(values, np.float64).reshape(-1)
        if values.size == 0:
            return
        lo, hi = float(values.min()), float(values.max())
        if hi <= lo:
            hi = lo + 1e-12
        counts, _ = np.histogram(values, bins=nbins, range=(lo, hi))
        rec = {"step": int(step), "time": time.time(), "hist": tag,
               "lo": lo, "hi": hi, "counts": [int(c) for c in counts]}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_histogram(tag, values, int(step))

    def images(self, step: int, tag: str, images: np.ndarray):
        """images: [N, H, W, C] in [-1, 1]."""
        arr = np.asarray(images)
        arr = np.clip((arr + 1.0) / 2.0, 0.0, 1.0)
        if self._tb is not None:
            self._tb.add_images(tag, arr, int(step), dataformats="NHWC")
        else:  # save a PNG grid next to the log
            try:
                from PIL import Image

                n, h, w, c = arr.shape
                cols = int(np.ceil(np.sqrt(n)))
                rows = int(np.ceil(n / cols))
                grid = np.zeros((rows * h, cols * w, c), np.uint8)
                for i in range(n):
                    r, cc = divmod(i, cols)
                    grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = (
                        arr[i] * 255
                    ).astype(np.uint8)
                img = Image.fromarray(grid.squeeze())
                img.save(os.path.join(self.log_dir, f"{tag}_{step}.png"))
            except Exception:
                pass

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
