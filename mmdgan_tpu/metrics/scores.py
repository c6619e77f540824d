"""GenerativeModelMetric: orchestration of IS / FID / intra-FID / MS-SSIM
over a trained model.

Rebuild of graph_func.py:1607-2094 around a pluggable classifier:
``inception_score_and_fid`` reproduces the reference evaluation protocol
(graph_func.py:1748-1799): run ``num_batch`` batches of real and generated
images through the classifier, then report
(IS(real), IS(gen), FID(real_half_1, real_half_2), FID(real, gen)) —
fid_xx is the self-consistency sanity value the reference logs each eval.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np

from mmdgan_tpu.metrics.fid import (
    fid_from_activations,
    inception_score_from_logits,
    mean_cov_np,
)
from mmdgan_tpu.metrics.msssim import ms_ssim


class GenerativeModelMetric:
    def __init__(self, classifier: Optional[Callable] = None, model: str = "v1",
                 model_path: Optional[str] = None):
        """:param classifier: fn(images_nhwc_[-1,1]) -> (logits, pool3);
        defaults to :class:`InceptionClassifier` (frozen graph if
        available)."""
        if classifier is None and model in ("v1", "custom"):
            from mmdgan_tpu.metrics.inception import InceptionClassifier
            classifier = InceptionClassifier(pb_path=model_path)
        self.classifier = classifier

    # ------------------------------------------------------------------
    def activations(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self.classifier(np.asarray(images, np.float32))

    def inception_score_and_fid(
        self,
        real_batches: Iterable[np.ndarray],
        gen_batches: Iterable[np.ndarray],
        num_batch: int = 10,
    ) -> Tuple[float, float, float, float]:
        """(inc_real, inc_gen, fid_real_vs_real, fid_real_vs_gen);
        ~50k samples at the reference protocol (781 batches of 64)."""
        x_logits, x_pool, y_logits, y_pool = [], [], [], []
        real_it, gen_it = iter(real_batches), iter(gen_batches)
        for _ in range(num_batch):
            xl, xp = self.activations(next(real_it))
            yl, yp = self.activations(next(gen_it))
            x_logits.append(xl)
            x_pool.append(xp)
            y_logits.append(yl)
            y_pool.append(yp)
        x_logits = np.concatenate(x_logits)
        y_logits = np.concatenate(y_logits)
        x_pool = np.concatenate(x_pool)
        y_pool = np.concatenate(y_pool)
        inc_x = inception_score_from_logits(x_logits)
        inc_y = inception_score_from_logits(y_logits)
        xp1, xp2 = np.split(x_pool, 2, axis=0)
        fid_xx = fid_from_activations(xp1, xp2)
        fid_xy = fid_from_activations(x_pool, y_pool)
        return inc_x, inc_y, fid_xx, fid_xy

    # ------------------------------------------------------------------
    def ref_stats(self, batches: Iterable[np.ndarray], num_batch: int):
        """Precompute pool3 mean/cov (imagenet_ref_stats, graph_func.py:2038-2094)."""
        pools = []
        it = iter(batches)
        for _ in range(num_batch):
            _, p = self.activations(next(it))
            pools.append(p)
        return mean_cov_np(np.concatenate(pools))

    def save_ref_stats(self, batches, num_batch: int, out_path: str):
        mean, cov = self.ref_stats(batches, num_batch)
        np.savez(out_path, mean=mean, cov=cov)
        return out_path

    def intra_fid(
        self,
        ref_stat_file: str,
        gen_batches: Iterable[np.ndarray],
        num_batch: int = 50,
    ) -> float:
        """FID of generated images vs cached per-class stats
        (graph_func.py:1801-1825)."""
        pools = []
        it = iter(gen_batches)
        for _ in range(num_batch):
            _, p = self.activations(next(it))
            pools.append(p)
        ref = np.load(ref_stat_file if ref_stat_file.endswith(".npz")
                      else ref_stat_file + ".npz")
        return fid_from_activations(
            np.concatenate(pools), [ref["mean"], ref["cov"]]
        )

    # ------------------------------------------------------------------
    @staticmethod
    def ms_ssim_score(
        x_batches: Iterable[np.ndarray],
        y_batches: Iterable[np.ndarray],
        num_batch: int = 128,
        image_size: int = 256,
    ) -> float:
        """Mean MS-SSIM over paired batches (graph_func.py:1984-2023):
        images mapped from [-1,1] to [0,255] and resized to ``image_size``
        (ssim needs >=176)."""
        import jax
        import jax.numpy as jnp

        scores = []
        x_it, y_it = iter(x_batches), iter(y_batches)
        for _ in range(num_batch):
            x = (np.asarray(next(x_it), np.float32) + 1.0) * 128.5
            y = (np.asarray(next(y_it), np.float32) + 1.0) * 128.5
            if x.shape[1] != image_size:
                x = np.asarray(jax.image.resize(
                    jnp.asarray(x), (x.shape[0], image_size, image_size, x.shape[3]),
                    "linear"))
                y = np.asarray(jax.image.resize(
                    jnp.asarray(y), (y.shape[0], image_size, image_size, y.shape[3]),
                    "linear"))
            scores.append(np.asarray(ms_ssim(x, y, max_val=255.0)))
        return float(np.mean(np.concatenate(scores)))
