"""Batched variable-resolution tokenizer encoding.

Equivalent of VQModel.vt_forward / vt_forward_maxpad
(modeling/vision_encoder/autoencoder.py:402-511 and autoencoder_uni.py
:690-727): encode a heterogeneous list of images into one packed
[sum_i h_i*w_i, C] latent stack, batching same-shape images together
('group') or padding to bucketed maxima and cropping the latents ('maxpad').

Device work is jitted per (H, W, batch) bucket — recompiles are bounded by
the bucket set, matching the reference's intent of minimizing encoder
launches for native-resolution packing.
"""

from __future__ import annotations

import math
from collections import defaultdict
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.tokenizer import VQModel, latents_to_tokens


class BatchedEncoder:
    def __init__(self, model: VQModel, params, ps: int = 1):
        self.model = model
        self.params = params
        self.ps = ps
        self._jitted = {}

    def _encode(self, batch_shape):
        if batch_shape not in self._jitted:
            self._jitted[batch_shape] = jax.jit(
                lambda x: self.model.apply(self.params, x,
                                           method=VQModel.encode))
        return self._jitted[batch_shape]

    def vt_forward(self, image_list: Sequence[np.ndarray],
                   max_bs: int = 32) -> jax.Array:
        """Group same-(H,W) images into batches (autoencoder.py:402-424).

        image_list: NHWC float arrays in [-1, 1], each [1, H, W, 3] or
        [H, W, 3]. Returns packed tokens [sum h*w, C] in input order,
        ps-raster ordered per image.
        """
        imgs = [np.asarray(im if im.ndim == 4 else im[None]) for im in image_list]
        groups: dict[tuple, list] = defaultdict(list)
        for i, im in enumerate(imgs):
            groups[im.shape[1:3]].append(i)

        out: list = [None] * len(imgs)
        for (h, w), idxs in groups.items():
            for start in range(0, len(idxs), max_bs):
                chunk = idxs[start: start + max_bs]
                batch = jnp.concatenate([imgs[i] for i in chunk], axis=0)
                quant = self._encode(batch.shape)(batch)
                toks = latents_to_tokens(quant, ps=self.ps)
                for bi, i in enumerate(chunk):
                    out[i] = toks[bi]
        return jnp.concatenate(out, axis=0)

    def vt_forward_maxpad(
        self,
        image_list: Sequence[np.ndarray],
        max_bs: int = 32,
        stride: int = 32,
        normal_buckets: tuple = (384, 512, 768, 1024),
    ) -> jax.Array:
        """Pad to bucketed maxima, encode, crop latents
        (autoencoder.py:426-511). ps is ignored in this mode (reference
        returns plain row-major '(h w) c')."""

        def is_long_image(h, w):
            major, minor = max(h, w), min(h, w)
            return major >= 1024 and minor <= 768 and major / minor >= 1.5

        imgs = [np.asarray(im if im.ndim == 4 else im[None]) for im in image_list]
        groups: dict = defaultdict(list)
        sizes = {}
        for i, im in enumerate(imgs):
            h, w = im.shape[1:3]
            sizes[i] = (h, w)
            if is_long_image(h, w):
                bucket = "long"
            else:
                major = max(h, w)
                for b in normal_buckets:
                    if major <= b:
                        bucket = b
                        break
                else:
                    bucket = "long"
            groups[bucket].append(i)

        out: list = [None] * len(imgs)
        for bucket, idxs in groups.items():
            for start in range(0, len(idxs), max_bs):
                chunk = idxs[start: start + max_bs]
                h_pad = max(math.ceil(sizes[i][0] / stride) * stride
                            for i in chunk)
                w_pad = max(math.ceil(sizes[i][1] / stride) * stride
                            for i in chunk)
                padded = []
                for i in chunk:
                    im = imgs[i]
                    ph = h_pad - im.shape[1]
                    pw = w_pad - im.shape[2]
                    padded.append(np.pad(im, ((0, 0), (0, ph), (0, pw),
                                              (0, 0))))
                batch = jnp.asarray(np.concatenate(padded, axis=0))
                quant = self._encode(batch.shape)(batch)
                for bi, i in enumerate(chunk):
                    h, w = sizes[i]
                    hl = math.ceil(h / stride)
                    wl = math.ceil(w / stride)
                    q = quant[bi, :hl, :wl]
                    out[i] = q.reshape(hl * wl, q.shape[-1])
        return jnp.concatenate(out, axis=0)
