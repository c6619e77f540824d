"""Dataset converters: numpy / binary (CIFAR, STL) / raw image folders ->
sharded TFRecord files in the reference's on-disk format (raw uint8 bytes
under 'x', optional int64 label under 'y').

Rebuild of ``input_func.py:55-567`` (host-side code; PIL for image files).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mmdgan_tpu.data.tfrecord import TFRecordWriter


def np_to_tfrecords(
    x: np.ndarray,
    y: Optional[np.ndarray],
    out_path: str,
    num_shards: int = 1,
):
    """Write [N, ...] uint8 array (+ optional int labels) to tfrecords
    (input_func.py:55-103). ``out_path`` without extension; shard suffixes
    appended when num_shards > 1."""
    n = x.shape[0]
    assert x.dtype == np.uint8, "reference format stores raw uint8 bytes"
    shard_bounds = np.linspace(0, n, num_shards + 1).astype(int)
    paths = []
    for s in range(num_shards):
        path = f"{out_path}.tfrecords" if num_shards == 1 else f"{out_path}_{s}.tfrecords"
        paths.append(path)
        with TFRecordWriter(path) as w:
            for i in range(shard_bounds[s], shard_bounds[s + 1]):
                feats = {"x": x[i].tobytes()}
                if y is not None:
                    feats["y"] = np.asarray([int(y[i])], np.int64)
                w.write_example(feats)
    return paths


def _center_crop_resize(img, target_hw: Tuple[int, int], resize_hw=None, crop_hw=None):
    from PIL import Image

    if crop_hw is not None:
        w, h = img.size
        ch, cw = crop_hw
        left, top = (w - cw) // 2, (h - ch) // 2
        img = img.crop((left, top, left + cw, top + ch))
    if resize_hw is not None:
        img = img.resize((resize_hw[1], resize_hw[0]), Image.BILINEAR)
    if img.size != (target_hw[1], target_hw[0]):
        img = img.resize((target_hw[1], target_hw[0]), Image.BILINEAR)
    return img


def binary_image_to_tfrecords(
    binary_files: Sequence[str],
    out_path: str,
    num_images_per_file: int,
    image_size: Sequence[int],
    label_first: bool = True,
    num_label_bytes: int = 1,
    target_size: Optional[Sequence[int]] = None,
    save_label: bool = False,
):
    """CIFAR/STL-style fixed-length binary records -> tfrecords
    (input_func.py:107-226). ``image_size`` is (C, H, W); data is stored
    CHW uint8, optionally preceded (CIFAR) or followed by label bytes."""
    c, h, w = image_size
    rec_len = c * h * w + num_label_bytes
    with TFRecordWriter(out_path + ".tfrecords") as writer:
        for path in binary_files:
            raw = np.fromfile(path, np.uint8)
            n = len(raw) // rec_len
            raw = raw[: n * rec_len].reshape(n, rec_len)
            for i in range(n):
                rec = raw[i]
                if label_first:
                    label, img = int(rec[0]), rec[num_label_bytes:]
                else:
                    label, img = int(rec[-1]), rec[:-num_label_bytes]
                img = img.reshape(c, h, w)
                if target_size is not None:
                    from PIL import Image

                    th, tw = target_size
                    hwc = img.transpose(1, 2, 0)
                    hwc = np.asarray(
                        Image.fromarray(hwc).resize((tw, th), Image.BILINEAR)
                    )
                    img = hwc.transpose(2, 0, 1)
                feats = {"x": img.tobytes()}
                if save_label:
                    feats["y"] = np.asarray([label], np.int64)
                writer.write_example(feats)


def raw_image_to_tfrecords(
    image_files: Sequence[str],
    out_path: str,
    image_size: Sequence[int],
    resize: Optional[Sequence[int]] = None,
    crop: Optional[Sequence[int]] = None,
    num_images_per_shard: int = 100000,
    labels: Optional[Sequence[int]] = None,
):
    """Image files (png/jpg/webp; celebA / LSUN / ImageNet recipes) ->
    sharded tfrecords (input_func.py:230-337, 419-567). ``image_size`` is
    target (H, W); stored as CHW uint8 bytes."""
    from PIL import Image

    th, tw = image_size
    num_shards = max(1, int(np.ceil(len(image_files) / num_images_per_shard)))
    paths = []
    idx = 0
    for s in range(num_shards):
        path = (
            f"{out_path}.tfrecords" if num_shards == 1 else f"{out_path}_{s}.tfrecords"
        )
        paths.append(path)
        with TFRecordWriter(path) as writer:
            for _ in range(num_images_per_shard):
                if idx >= len(image_files):
                    break
                img = Image.open(image_files[idx]).convert("RGB")
                img = _center_crop_resize(img, (th, tw), resize_hw=resize, crop_hw=crop)
                arr = np.asarray(img, np.uint8).transpose(2, 0, 1)  # HWC->CHW
                feats = {"x": arr.tobytes()}
                if labels is not None:
                    feats["y"] = np.asarray([int(labels[idx])], np.int64)
                writer.write_example(feats)
                idx += 1
    return paths
