"""Tokenizer reconstruction-quality harness: PSNR/SSIM, ours vs torch ref.

The reference publishes IN-256 reconstruction PSNR/SSIM for each tokenizer
(README.md:65-69: ae_d16c32 24.90/0.72, ae_d32c128 23.26/0.67, ae_d32c256
25.29/0.74) and the driver north star demands our TPU decode stay within
0.05 dB of the torch reference (BASELINE.md). This module measures both
sides on the same image folder the moment real `ae_*.safetensors` weights
are available:

  python scripts/eval_tokenizer_recon.py --images DIR --ae ae.safetensors

Metrics follow the standard conventions (skimage-compatible): PSNR over the
full dynamic range, SSIM with an 11x11 gaussian window (sigma 1.5),
averaged over channels and images.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


# ---------------------------------------------------------------------------
# metrics (numpy, dependency-free)
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio in dB. Default range 2.0 = [-1, 1] images."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * float(np.log10(data_range ** 2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _filter2_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filtering over the LAST TWO axes."""
    img = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="valid"), -1, img)
    img = np.apply_along_axis(
        lambda c: np.convolve(c, k, mode="valid"), -2, img)
    return img


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 2.0,
         win_size: int = 11, sigma: float = 1.5) -> float:
    """Mean SSIM over [..., H, W] (leading axes = batch/channel), gaussian
    window — matches skimage.metrics.structural_similarity defaults
    (gaussian_weights=True, use_sample_covariance=False)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    k = _gaussian_kernel(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = _filter2_sep(a, k)
    mu_b = _filter2_sep(b, k)
    mu_aa = _filter2_sep(a * a, k)
    mu_bb = _filter2_sep(b * b, k)
    mu_ab = _filter2_sep(a * b, k)
    var_a = mu_aa - mu_a ** 2
    var_b = mu_bb - mu_b ** 2
    cov = mu_ab - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(np.mean(s))


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".JPEG")


def load_image_folder(path: str, resolution: int = 256,
                      limit: int = 0) -> np.ndarray:
    """Folder of images -> [N, H, W, 3] float32 in [-1, 1], ADM center
    crop (imagenet_gen/src/dataset.py:114-134 protocol used by the
    published IN-256 numbers)."""
    from PIL import Image

    from bitdance_tpu.data.imagenet import center_crop_arr

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(IMG_EXTS))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    out = []
    for f in files:
        with Image.open(f) as im:
            arr = center_crop_arr(im.convert("RGB"), resolution)
        out.append(arr.astype(np.float32) / 127.5 - 1.0)
    return np.stack(out)


# ---------------------------------------------------------------------------
# reconstruction paths
# ---------------------------------------------------------------------------

def reconstruct_jax(ddconfig: dict, params: dict, images: np.ndarray,
                    batch: int = 8, uni: bool = False) -> np.ndarray:
    """encode -> sign tokens -> decode on the default JAX backend.
    images: [N, H, W, 3] in [-1, 1]; returns same shape/range."""
    import jax
    import jax.numpy as jnp

    if uni:
        from bitdance_tpu.models.tokenizer_uni import UniVQModel as Model
    else:
        from bitdance_tpu.models.tokenizer import VQModel as Model
    model = Model(ddconfig=ddconfig)

    @jax.jit
    def roundtrip(p, x):
        q = model.apply(p, x, method=Model.encode)
        return model.apply(p, q, method=Model.decode)

    outs = []
    for i in range(0, images.shape[0], batch):
        outs.append(np.asarray(
            roundtrip(params, jnp.asarray(images[i:i + batch]))))
    return np.clip(np.concatenate(outs), -1.0, 1.0)


def reconstruct_torch(state: dict, ddconfig: dict, images: np.ndarray,
                      batch: int = 8, uni: bool = False,
                      reference_root: str = "/root/reference") -> np.ndarray:
    """Same roundtrip through the ACTUAL reference torch modules on CPU
    (modeling/vision_encoder/autoencoder.py VQModel.encode/decode)."""
    import sys
    import types

    import torch

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    if "flash_attn" not in sys.modules:
        import torch.nn.functional as F

        mod = types.ModuleType("flash_attn")

        def flash_attn_func(q, k, v, causal=False, dropout_p=0.0, **kw):
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))
            o = F.scaled_dot_product_attention(q, k, v, is_causal=causal)
            return o.transpose(1, 2)

        mod.flash_attn_func = flash_attn_func
        sys.modules["flash_attn"] = mod

    if uni:
        from modeling.vision_encoder import autoencoder_uni as ref_mod
    else:
        from modeling.vision_encoder import autoencoder as ref_mod
    m = ref_mod.VQModel(ddconfig)
    m.load_state_dict({k: torch.from_numpy(np.asarray(v))
                       for k, v in state.items()})
    m.eval()
    outs = []
    with torch.no_grad():
        for i in range(0, images.shape[0], batch):
            x = torch.from_numpy(
                images[i:i + batch].transpose(0, 3, 1, 2)).float()
            q = m.encode(x)
            y = m.decode(q) if hasattr(m, "decode") else m.decoder(q)
            outs.append(y.numpy().transpose(0, 2, 3, 1))
    return np.clip(np.concatenate(outs), -1.0, 1.0)


@dataclasses.dataclass
class ReconReport:
    psnr_jax: float
    ssim_jax: float
    psnr_torch: float | None = None
    ssim_torch: float | None = None

    @property
    def psnr_delta(self) -> float | None:
        if self.psnr_torch is None:
            return None
        return self.psnr_jax - self.psnr_torch

    @property
    def within_north_star(self) -> bool | None:
        """BASELINE.md: TPU PSNR within 0.05 dB of the torch reference."""
        d = self.psnr_delta
        return None if d is None else bool(d >= -0.05)

    def as_dict(self) -> dict:
        return {
            "psnr_jax_db": round(self.psnr_jax, 4),
            "ssim_jax": round(self.ssim_jax, 4),
            "psnr_torch_db": (None if self.psnr_torch is None
                              else round(self.psnr_torch, 4)),
            "ssim_torch": (None if self.ssim_torch is None
                           else round(self.ssim_torch, 4)),
            "psnr_delta_db": (None if self.psnr_delta is None
                              else round(self.psnr_delta, 4)),
            "within_0p05db": self.within_north_star,
        }


def compare_reconstructions(images: np.ndarray, recon_jax: np.ndarray,
                            recon_torch: np.ndarray | None) -> ReconReport:
    """PSNR/SSIM of each path against the ground-truth images (the
    published-number convention), NHWC [-1, 1]."""
    def _metrics(recon):
        # SSIM over [N, C, H, W]-style leading axes: move channels forward
        a = images.transpose(0, 3, 1, 2)
        b = recon.transpose(0, 3, 1, 2)
        return psnr(images, recon), ssim(a, b)

    pj, sj = _metrics(recon_jax)
    if recon_torch is None:
        return ReconReport(pj, sj)
    pt, st = _metrics(recon_torch)
    return ReconReport(pj, sj, pt, st)
