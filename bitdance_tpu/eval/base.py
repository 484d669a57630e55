"""Evaluation base: pipeline construction + prompt sharding over hosts.

Equivalent of eval/base_evaluator.py:14-95 — NCCL init becomes
jax.process_index()/process_count(); seed = 4396*world + rank
(base_evaluator.py:27); rank-sharding of prompt lists (eval_dpg.py:24-29).
"""

from __future__ import annotations

import logging
import os

import numpy as np
from PIL import Image


class BaseEvaluator:
    def __init__(self, model_path: str, pipeline=None):
        import jax

        self.rank = jax.process_index()
        self.world_size = jax.process_count()
        logging.basicConfig(
            level=logging.INFO,
            format="[%(asctime)s] %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
        self.logger = logging.getLogger(__name__)
        self.seed = 4396 * self.world_size + self.rank
        self.model = pipeline or self._build_pipeline(model_path)

    def _build_pipeline(self, model_path: str):
        from bitdance_tpu.pipelines.loader import load_t2i_pipeline

        return load_t2i_pipeline(model_path)

    def shard(self, datasets: list) -> list:
        """Contiguous per-rank split (eval_dpg.py:24-29)."""
        total = len(datasets)
        per_rank = (total + self.world_size - 1) // self.world_size
        start = self.rank * per_rank
        return datasets[start: min(start + per_rank, total)]

    def build_dataset(self, *a, **kw):
        raise NotImplementedError

    def eval(self, *a, **kw):
        raise NotImplementedError


def save_grid(images: np.ndarray, path: str, nrow: int = 2) -> None:
    """Save [N,H,W,3] uint8 images as an nrow-column grid png."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    canvas = np.zeros((nrows * h, ncol * w, c), np.uint8)
    for i in range(n):
        r, cc = divmod(i, ncol)
        canvas[r * h: (r + 1) * h, cc * w: (cc + 1) * w] = images[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(path)


def save_images(images: np.ndarray, paths: list[str]) -> None:
    for img, p in zip(images, paths):
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        Image.fromarray(img).save(p)
