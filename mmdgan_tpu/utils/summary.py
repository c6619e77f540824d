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
