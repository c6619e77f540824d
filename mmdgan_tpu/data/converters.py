"""Dataset converters: numpy / binary (CIFAR, STL) / raw image folders ->
sharded TFRecord files in the reference's on-disk format (raw uint8 CHW
bytes under 'x', optional int64 label under 'y').

Rebuild of ``input_func.py:55-567``; the exact reference recipes
(Data/ReadMe.md) are reproduced:

CIFAR-10 (binary batches, label byte first):
    binary_image_to_tfrecords(
        [f"cifar/data_batch_{i}.bin" for i in range(1, 6)],
        "cifar", 50000, (3, 32, 32), num_labels=1)
STL-10 (unlabeled_X.bin, 96x96 transposed, LANCZOS-resized to 48):
    binary_image_to_tfrecords(
        ["stl10/unlabeled_X.bin"], "stl", 100000, (3, 96, 96),
        num_labels=0, resize=(48, 48), image_transpose=True)
CelebA (png folder, aspect-preserving resize to cover (72, 88), center
crop 64):
    raw_image_to_tfrecords(files, "celebA", resize=(72, 88),
                           crop=(64, 64), num_images_per_shard=22511)
LSUN (webp folder): raw_image_to_tfrecords(files, "lsun", resize=(64, 64),
                           crop=(64, 64), num_images_per_shard=49722)
"""

from __future__ import annotations

from typing import Optional, Sequence

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
    native_writer = None
    try:
        # get_lib() triggers the lazy g++ build/dlopen NOW, so a missing
        # toolchain disables the native path here instead of crashing the
        # per-shard write below.
        from mmdgan_tpu.data.native import NativeWriter, get_lib
        get_lib()
        native_writer = NativeWriter
    except Exception:
        pass  # toolchain unavailable -> pure-Python writer
    row_bytes = int(np.prod(x.shape[1:]))
    for s in range(num_shards):
        path = f"{out_path}.tfrecords" if num_shards == 1 else f"{out_path}_{s}.tfrecords"
        paths.append(path)
        lo, hi = shard_bounds[s], shard_bounds[s + 1]
        if native_writer is not None:
            # bulk C++ path (byte-identical to the Python writer)
            with native_writer(path) as w:
                w.write_batch(
                    x[lo:hi].reshape(hi - lo, row_bytes),
                    None if y is None else np.asarray(y[lo:hi], np.int64))
            continue
        with TFRecordWriter(path) as w:
            for i in range(lo, hi):
                feats = {"x": x[i].tobytes()}
                if y is not None:
                    feats["y"] = np.asarray([int(y[i])], np.int64)
                w.write_example(feats)
    return paths


def binary_image_to_tfrecords(
    binary_files: Sequence[str],
    out_path: str,
    num_images: int,
    image_size: Sequence[int],
    num_labels: int = 1,
    label_first: bool = True,
    resize: Optional[Sequence[int]] = None,
    crop: Optional[Sequence[int]] = None,
    image_transpose: bool = False,
    save_label: bool = False,
):
    """Fixed-length binary records (CIFAR/STL) -> tfrecords
    (input_func.py:107-226).

    :param image_size: (C, H, W); records hold CHW uint8 pixel bytes with
        ``num_labels`` label bytes before (CIFAR) or after them.
    :param resize: target (H, W), LANCZOS (the reference's resampling)
    :param crop: PIL crop box (left, upper, right, lower)
    :param image_transpose: swap H/W (MNIST/STL store transposed images)
    :param save_label: write 'y' int64 labels
    """
    from PIL import Image

    c, h, w = image_size
    rec_len = c * h * w + num_labels
    written = 0
    with TFRecordWriter(out_path + ".tfrecords") as writer:
        for path in binary_files:
            raw = np.fromfile(path, np.uint8)
            n = len(raw) // rec_len
            raw = raw[: n * rec_len].reshape(n, rec_len)
            for i in range(n):
                if written >= num_images:
                    break
                rec = raw[i]
                if num_labels > 0:
                    if label_first:
                        label, img = int(rec[0]), rec[num_labels:]
                    else:
                        label, img = int(rec[-1]), rec[:-num_labels]
                else:
                    label, img = None, rec
                img = img.reshape(c, h, w)
                if image_transpose:
                    img = np.transpose(img, (0, 2, 1))
                if resize is not None or crop is not None:
                    im = Image.fromarray(img.transpose(1, 2, 0), "RGB")
                    if resize is not None:
                        im = im.resize((resize[1], resize[0]), Image.LANCZOS)
                    if crop is not None:
                        im = im.crop(crop)
                    img = np.asarray(im, np.uint8).transpose(2, 0, 1)
                feats = {"x": img.tobytes()}
                if save_label and label is not None:
                    feats["y"] = np.asarray([label], np.int64)
                writer.write_example(feats)
                written += 1


def raw_image_to_tfrecords(
    image_files: Sequence[str],
    out_path: str,
    resize: Optional[Sequence[int]] = None,
    crop: Optional[Sequence[int]] = None,
    num_images_per_shard: int = 20000,
    labels: Optional[Sequence[int]] = None,
    image_size: Optional[Sequence[int]] = None,
):
    """Image files (png/jpg/webp; celebA / LSUN / ImageNet recipes) ->
    sharded tfrecords (input_func.py:230-337, 419-567).

    Reference semantics: aspect-preserving LANCZOS downscale so the image
    covers ``resize`` (scale = min over dims of src/target), then a center
    crop to ``crop`` (H, W). Stored as CHW uint8 bytes.

    :param image_size: legacy alias for ``crop`` when crop is None.
    """
    from PIL import Image

    if crop is None and image_size is not None:
        crop = tuple(image_size)
    num_shards = max(1, int(np.ceil(len(image_files) / num_images_per_shard)))
    paths = []
    idx = 0
    for s in range(num_shards):
        path = (
            f"{out_path}.tfrecords" if num_shards == 1 else f"{out_path}_{s:03d}.tfrecords"
        )
        paths.append(path)
        with TFRecordWriter(path) as writer:
            for _ in range(num_images_per_shard):
                if idx >= len(image_files):
                    break
                im = Image.open(image_files[idx])
                if resize is not None:
                    w0, h0 = im.size
                    factor = min(h0 / resize[0], w0 / resize[1])
                    im = im.resize(
                        (int(round(w0 / factor)), int(round(h0 / factor))),
                        Image.LANCZOS)
                if crop is not None:
                    w1, h1 = im.size
                    left = (w1 - crop[1]) // 2
                    top = (h1 - crop[0]) // 2
                    im = im.crop((left, top, left + crop[1], top + crop[0]))
                if im.mode != "RGB":
                    im = im.convert("RGB")
                arr = np.asarray(im, np.uint8).transpose(2, 0, 1)  # HWC->CHW
                feats = {"x": arr.tobytes()}
                if labels is not None:
                    feats["y"] = np.asarray([int(labels[idx])], np.int64)
                writer.write_example(feats)
                idx += 1
    return paths
