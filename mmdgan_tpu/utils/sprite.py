"""Sprite / embedding writers for qualitative evaluation.

Rebuild of graph_func.py:183-396: tile generated images into a sprite PNG
grid; write TensorBoard-projector embeddings (metadata + sprite) for
score-space visualization.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def images_to_sprite(
    images: np.ndarray,
    mesh_num: Optional[Tuple[int, int]] = None,
    if_invert: bool = False,
) -> np.ndarray:
    """[N, H, W, C] in [-1, 1] -> one [rows*H, cols*W, C] uint8 grid
    (graph_func.py:222-266)."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    if mesh_num is None:
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
    else:
        rows, cols = mesh_num
    grid = np.ones((rows * h, cols * w, c), np.float32) * (1.0 if if_invert else -1.0)
    for i in range(n):
        r, cc = divmod(i, cols)
        img = -images[i] if if_invert else images[i]
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = img
    return np.clip((grid + 1.0) * 127.5, 0, 255).astype(np.uint8)


def write_sprite_wrapper(
    images: np.ndarray,
    mesh_num: Tuple[int, int],
    filename: str,
    file_folder: str,
    file_index: str = "",
    if_invert: bool = False,
    image_format: str = "channels_last",
) -> str:
    """Save a sprite PNG (graph_func.py:269-298). Returns the path."""
    from PIL import Image

    if image_format in ("channels_first", "NCHW"):
        images = np.transpose(images, (0, 2, 3, 1))
    grid = images_to_sprite(images, mesh_num, if_invert)
    os.makedirs(file_folder, exist_ok=True)
    path = os.path.join(file_folder, filename + file_index + ".png")
    Image.fromarray(grid.squeeze()).save(path)
    return path


def embedding_image_wrapper(
    embeddings: np.ndarray,
    filename: str,
    var_name: str,
    file_folder: str,
    file_index: str = "",
    labels: Optional[np.ndarray] = None,
    images: Optional[np.ndarray] = None,
    mesh_num: Optional[Tuple[int, int]] = None,
    if_invert: bool = False,
    image_format: str = "channels_last",
) -> str:
    """TensorBoard-projector files: embeddings.tsv (+metadata.tsv, sprite,
    projector_config) (graph_func.py:301-396)."""
    os.makedirs(file_folder, exist_ok=True)
    base = filename + file_index
    emb_path = os.path.join(file_folder, base + "_embeddings.tsv")
    np.savetxt(emb_path, np.asarray(embeddings), delimiter="\t")
    meta_path = None
    if labels is not None:
        meta_path = os.path.join(file_folder, base + "_metadata.tsv")
        np.savetxt(meta_path, np.asarray(labels).reshape(-1, 1), fmt="%d")
    sprite_path = None
    if images is not None:
        sprite_path = write_sprite_wrapper(
            images, mesh_num, base, file_folder, "_sprite",
            if_invert=if_invert, image_format=image_format,
        )
    # projector_config.pbtxt so TensorBoard picks everything up
    cfg_path = os.path.join(file_folder, "projector_config.pbtxt")
    with open(cfg_path, "a") as f:
        f.write("embeddings {\n")
        f.write(f'  tensor_name: "{var_name}"\n')
        f.write(f'  tensor_path: "{os.path.basename(emb_path)}"\n')
        if meta_path:
            f.write(f'  metadata_path: "{os.path.basename(meta_path)}"\n')
        if sprite_path and images is not None:
            h, w = images.shape[1:3] if image_format == "channels_last" else images.shape[2:4]
            f.write("  sprite {\n")
            f.write(f'    image_path: "{os.path.basename(sprite_path)}"\n')
            f.write(f"    single_image_dim: {w}\n    single_image_dim: {h}\n")
            f.write("  }\n")
        f.write("}\n")
    return emb_path
