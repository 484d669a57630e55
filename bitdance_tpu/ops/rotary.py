"""Rotary position embeddings.

Two conventions are supported, matching the reference's two stacks:

1. `half-rotate` (GPT-NeoX / HF Qwen3): the head dim is split into two halves,
   out = [x1*cos - x2*sin, x2*cos + x1*sin]. Used by the Qwen3 backbone.
   (HF transformers Qwen3 rotate_half; driven by position ids.)

2. `paired 2D` (llama-style interleaved pairs over 2D patch-center coords):
   head dim viewed as pairs, first half of the pairs rotates by x-coordinate
   frequencies, second half by y. Used by the ImageNet AR stack
   (imagenet_gen/src/layers.py:241-292).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1D half-rotate RoPE (Qwen3)
# ---------------------------------------------------------------------------

def rope_table_1d(head_dim: int, max_pos: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """Return (cos, sin) tables of shape [max_pos, head_dim//2], fp32."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    pos = jnp.arange(max_pos, dtype=jnp.float32)
    angles = jnp.outer(pos, inv_freq)  # [max_pos, head_dim//2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_half(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Apply half-rotate RoPE.

    x: [..., L, n_head, head_dim]; cos/sin: [..., L, head_dim//2]
    (leading dims of cos/sin broadcast against x's batch dims).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# 2D paired RoPE (ImageNet AR stack)
# ---------------------------------------------------------------------------

def patch_center_coords_2d(resolution: int, patch_size: int) -> jax.Array:
    """Patch center coordinates, matching imagenet_gen/src/layers.py:241-254.

    Returns [P*P, 2] with (x, y) centers in units of max_pos/P.
    """
    max_pos = resolution // patch_size
    p = max_pos  # num_scales == 1
    edge = float(max_pos) / p
    centers = (jnp.arange(p, dtype=jnp.float32) + 0.5) * edge
    gy, gx = jnp.meshgrid(centers, centers, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)


def rope_table_2d(
    pos_2d: jax.Array, head_dim: int, base: float = 10000.0, cls_token_num: int = 0
) -> jax.Array:
    """Precompute paired-rotation cos/sin, imagenet_gen/src/layers.py:257-272.

    pos_2d: [L, 2] coordinates. Returns [cls+L, head_dim//2, 2] (cos, sin)
    where the first half of pair slots encodes x and the second half y.
    Class tokens get coordinate 0 (freqs of t=0 -> identity rotation? no:
    reference uses t = pos+1 for patches and t = 0 rows for cls tokens).
    """
    half_dim = head_dim // 2
    freqs = 1.0 / (
        base ** (jnp.arange(0, half_dim, 2, dtype=jnp.float32)[: half_dim // 2] / half_dim)
    )
    t = pos_2d + 1.0
    if cls_token_num > 0:
        t = jnp.concatenate([jnp.zeros((cls_token_num, 2), jnp.float32), t], axis=0)
    ang = jnp.outer(t.reshape(-1), freqs).reshape(t.shape[0], -1)  # [L, head_dim//2]
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def apply_rope_paired(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """Apply paired-rotation RoPE (imagenet_gen/src/layers.py:275-292).

    x: [B, L, n_head, head_dim]; freqs_cis: [L, head_dim//2, 2].
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.reshape(1, freqs_cis.shape[0], 1, freqs_cis.shape[1], 2)
    cos, sin = fc[..., 0], fc[..., 1]
    xr, xi = xf[..., 0], xf[..., 1]
    out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
    return out.reshape(x.shape).astype(dtype)


def sincos_1d_table(dim: int, max_len: int, pe_interpolation: float = 1.0) -> jax.Array:
    """1D sin-cos table [max_len, dim], matching t2i_pipeline.py:85-96."""
    assert dim % 2 == 0
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    pos = jnp.arange(max_len, dtype=jnp.float32) / pe_interpolation
    out = jnp.outer(pos, omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def pos_embed_2d(table_1d: jax.Array, h: int, w: int, ps: int = 1) -> jax.Array:
    """2D pos-embed with ps-raster ordering (t2i_pipeline.py:98-107).

    table_1d: [max_len, D/2]. Returns [h*w, D] ordered so each consecutive
    ps*ps group covers one spatial tile: (h p1)(w p2) c -> (h w p1 p2) c.
    """
    d2 = table_1d.shape[1]
    emb_v = table_1d[:h]  # rows
    emb_h = table_1d[:w]  # cols
    grid_v = jnp.broadcast_to(emb_v[:, None, :], (h, w, d2))
    grid_h = jnp.broadcast_to(emb_h[None, :, :], (h, w, d2))
    pe = jnp.concatenate([grid_h, grid_v], axis=-1)  # [h, w, D]
    # rearrange '(h p1) (w p2) c -> (h w p1 p2) c'
    hh, ww = h // ps, w // ps
    pe = pe.reshape(hh, ps, ww, ps, -1)
    pe = jnp.transpose(pe, (0, 2, 1, 3, 4))
    return pe.reshape(h * w, -1)


def sincos_1d_table_np(dim: int, max_len: int,
                       pe_interpolation: float = 1.0):
    """Numpy twin of sincos_1d_table for host-side data pipelines (no
    device dispatch; see pos_embed_2d_np)."""
    import numpy as np

    assert dim % 2 == 0
    omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    pos = np.arange(max_len, dtype=np.float32) / pe_interpolation
    out = np.outer(pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def pos_embed_2d_np(table_1d, h: int, w: int, ps: int = 1):
    """Numpy twin of pos_embed_2d for host-side data pipelines (the packer
    runs per-sample on CPU — eager jnp ops there would dispatch to the
    accelerator at ~1s/op over a remote tunnel). Equality with the jax
    version is asserted in tests/test_ops.py."""
    import numpy as np

    table_1d = np.asarray(table_1d)
    d2 = table_1d.shape[1]
    grid_v = np.broadcast_to(table_1d[:h, None, :], (h, w, d2))
    grid_h = np.broadcast_to(table_1d[None, :w, :], (h, w, d2))
    pe = np.concatenate([grid_h, grid_v], axis=-1)
    hh, ww = h // ps, w // ps
    pe = pe.reshape(hh, ps, ww, ps, -1)
    pe = np.transpose(pe, (0, 2, 1, 3, 4))
    return pe.reshape(h * w, -1)
