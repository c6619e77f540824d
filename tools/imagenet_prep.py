#!/usr/bin/env python
"""ImageNet preparation: extract tars, build per-class tfrecords, cache
per-class inception statistics for intra-FID.

Rebuild of ``Addon/ImageNet/imagenet.py:1-149`` (tar extraction) +
``input_func.py:419-567`` (per-class labeled tfrecords) +
``graph_func.py:2038-2094`` (``imagenet_ref_stats``).

Usage:
  python tools/imagenet_prep.py extract --train-tar ILSVRC2012_img_train.tar \
      --out-dir ./imagenet/train
  python tools/imagenet_prep.py tfrecords --image-root ./imagenet/train \
      --out-dir ~/mmdgan_data/imagenet --size 64
  python tools/imagenet_prep.py ref-stats --data-dir ~/mmdgan_data/imagenet \
      --classes 0 10
"""

import argparse
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_train(train_tar: str, out_dir: str):
    """The train tar holds one tar per class (imagenet.py:82-107)."""
    os.makedirs(out_dir, exist_ok=True)
    with tarfile.open(train_tar) as outer:
        for member in outer:
            if not member.name.endswith(".tar"):
                continue
            wnid = member.name[:-4]
            class_dir = os.path.join(out_dir, wnid)
            os.makedirs(class_dir, exist_ok=True)
            inner_f = outer.extractfile(member)
            with tarfile.open(fileobj=inner_f) as inner:
                inner.extractall(class_dir)
            print(f"extracted {wnid}")


def build_tfrecords(image_root: str, out_dir: str, size: int):
    """One tfrecord per class: imagenet_{class:03d}.tfrecords with int64
    labels (input_func.py:419-567)."""
    from mmdgan_tpu.data.converters import raw_image_to_tfrecords

    os.makedirs(out_dir, exist_ok=True)
    classes = sorted(
        d for d in os.listdir(image_root)
        if os.path.isdir(os.path.join(image_root, d)))
    for idx, wnid in enumerate(classes):
        files = sorted(
            os.path.join(image_root, wnid, f)
            for f in os.listdir(os.path.join(image_root, wnid)))
        raw_image_to_tfrecords(
            files, os.path.join(out_dir, f"imagenet_{idx:03d}"),
            image_size=(size, size), labels=[idx] * len(files))
        print(f"class {idx} ({wnid}): {len(files)} images")


def ref_stats(data_dir: str, class_lo: int, class_hi: int, batch_size: int,
              inception_pb: str = None):
    """Cache pool3 mean/cov per class for intra-FID (graph_func.py:2038-2094)."""
    from mmdgan_tpu.data import ReadTFRecords
    from mmdgan_tpu.metrics.scores import GenerativeModelMetric

    metric = GenerativeModelMetric(model="v1", model_path=inception_pb)
    for cls in range(class_lo, class_hi):
        name = f"imagenet_{cls:03d}"
        pipe = ReadTFRecords(
            name, num_labels=1, batch_size=batch_size, file_folder=data_dir,
            num_epoch=1,
        )
        # infer image size from the first record
        first = next(pipe._iter_raw())
        n = first["x"].shape[0] // 3
        side = int(n ** 0.5)
        pipe = ReadTFRecords(
            name, num_labels=1, batch_size=batch_size, file_folder=data_dir,
            num_epoch=1,
        ).shape2image(3, side, side)
        import numpy as np
        from mmdgan_tpu.metrics.fid import mean_cov_np

        pools = []
        for b in pipe.next_batch():  # one epoch, until exhausted
            _, p = metric.activations(b["x"])
            pools.append(p)
        mean, cov = mean_cov_np(np.concatenate(pools))
        out = os.path.join(data_dir, f"{name}_stats.npz")
        np.savez(out, mean=mean, cov=cov)
        print(f"class {cls}: stats -> {out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("extract")
    pe.add_argument("--train-tar", required=True)
    pe.add_argument("--out-dir", required=True)
    pt = sub.add_parser("tfrecords")
    pt.add_argument("--image-root", required=True)
    pt.add_argument("--out-dir", required=True)
    pt.add_argument("--size", type=int, default=64)
    pr = sub.add_parser("ref-stats")
    pr.add_argument("--data-dir", required=True)
    pr.add_argument("--classes", nargs=2, type=int, default=[0, 1000])
    pr.add_argument("--batch-size", type=int, default=64)
    pr.add_argument("--inception-pb", default=None)
    args = p.parse_args()
    if args.cmd == "extract":
        extract_train(args.train_tar, args.out_dir)
    elif args.cmd == "tfrecords":
        build_tfrecords(args.image_root, args.out_dir, args.size)
    elif args.cmd == "ref-stats":
        ref_stats(args.data_dir, args.classes[0], args.classes[1],
                  args.batch_size, args.inception_pb)


if __name__ == "__main__":
    main()
