"""UniWeTok binary tokenizer: conv-attention hybrid autoencoder.

Re-design of modeling/vision_encoder/autoencoder_uni.py: the conv backbone
gains transformer blocks at the bottleneck with 4 learned register tokens
and 2D RoPE over normalized patch centers (autoencoder_uni.py:437-502);
encoder output is bounded by 2*sigmoid(x)-1 ("SigLu", :507) before sign
quantization; the decoder is a GANDecoder (noise concat) with the same
mid-attention blocks (:509-632).

Coordinate conventions (bit-for-bit with the reference):
  encoder: y_i = i * 7/(H-1) + 0.5        (autoencoder_uni.py:466-471)
  decoder: y_i = (i+0.5) * 7.5/(H-0.5)    (autoencoder_uni.py:594-598)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bitdance_tpu.models.tokenizer import (
    AdaptiveGroupNorm,
    GroupNorm32,
    ResBlock,
    Upsampler,
)
from bitdance_tpu.ops.attention import attention_xla
from bitdance_tpu.ops.norms import rms_norm, swish
from bitdance_tpu.ops.quantize import sign_quantize
from bitdance_tpu.ops.rotary import apply_rope_paired, rope_table_2d


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


class RMSNormModule(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, w)


class MidAttention(nn.Module):
    """Fused-QKV non-causal attention with paired 2D RoPE (autoencoder_uni.py:236-337)."""

    dim: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freqs_cis):
        b, n, _ = x.shape
        hd = self.dim // self.n_head
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       name="wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope_paired(q.reshape(b, n, self.n_head, hd), freqs_cis)
        k = apply_rope_paired(k.reshape(b, n, self.n_head, hd), freqs_cis)
        v = v.reshape(b, n, self.n_head, hd)
        o = attention_xla(q, k, v)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="wo")(o.reshape(b, n, self.dim))


class UniTransformerBlock(nn.Module):
    """Pre-RMSNorm block with SwiGLU FFN (autoencoder_uni.py:339-385)."""

    dim: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freqs_cis):
        h = x + MidAttention(self.dim, self.n_head, dtype=self.dtype,
                             name="attention")(
            RMSNormModule(self.dim, name="attention_norm")(x), freqs_cis)
        hidden = find_multiple(int(2 * (4 * self.dim) / 3), 256)
        y = RMSNormModule(self.dim, name="ffn_norm")(h)
        h12 = nn.Dense(hidden * 2, use_bias=False, dtype=self.dtype,
                       name="feed_forward_w1")(y)
        h1, h2 = jnp.split(h12, 2, axis=-1)
        ff = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="feed_forward_w2")(jax.nn.silu(h1) * h2)
        return h + ff


def _mid_freqs(h: int, w: int, head_dim: int, num_registers: int,
               decoder: bool) -> jax.Array:
    if decoder:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (7.5 / (h - 0.5))
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (7.5 / (w - 0.5))
    else:
        ys = jnp.arange(h, dtype=jnp.float32) * (7.0 / max(h - 1, 1)) + 0.5
        xs = jnp.arange(w, dtype=jnp.float32) * (7.0 / max(w - 1, 1)) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pos_2d = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    return rope_table_2d(pos_2d, head_dim, cls_token_num=num_registers)


class MidAttentionStack(nn.Module):
    """Register tokens + transformer blocks over the flattened feature map."""

    dim: int
    n_head: int
    attn_blocks: int
    num_registers: int = 4
    decoder_coords: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        reg = self.param("register_token", nn.initializers.normal(0.02),
                         (self.num_registers, c))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(reg[None], (b, self.num_registers, c)),
             x.reshape(b, h * w, c)], axis=1)
        freqs = _mid_freqs(h, w, c // self.n_head, self.num_registers,
                           self.decoder_coords)
        for i in range(self.attn_blocks):
            tokens = UniTransformerBlock(self.dim, self.n_head,
                                         dtype=self.dtype,
                                         name=f"block_{i}")(tokens, freqs)
        return tokens[:, self.num_registers:].reshape(b, h, w, c)


class UniEncoder(nn.Module):
    """Conv + mid-attention encoder with SigLu-bounded output
    (autoencoder_uni.py:400-507)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    attn_blocks: int = 2
    n_heads: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        num_blocks = len(self.ch_mult)
        self.conv_in = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                               dtype=self.dtype)
        downs = []
        for i_level in range(num_blocks):
            block_in = self.ch * self.ch_mult[i_level]
            level = {"block": [ResBlock(block_in, block_in, dtype=self.dtype)
                               for _ in range(self.num_res_blocks)]}
            if i_level < num_blocks - 1:
                block_out = self.ch * self.ch_mult[i_level + 1]
                level["downsample"] = nn.Conv(
                    block_out, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype)
            downs.append(level)
        self.down = downs
        block_in = self.ch * self.ch_mult[-1]
        self.mid_attn = MidAttentionStack(
            block_in, self.n_heads, self.attn_blocks, dtype=self.dtype)
        self.norm_out = GroupNorm32(block_in)
        self.conv_out = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def __call__(self, x):
        # NOTE: conv_in outputs ch channels but level 0 blocks expect
        # ch*ch_mult[0]; reference requires ch_mult[0] == 1 implicitly
        x = self.conv_in(x)
        for i_level, level in enumerate(self.down):
            for blk in level["block"]:
                x = blk(x)
            if "downsample" in level:
                x = level["downsample"](x)
        if self.attn_blocks > 0:
            x = self.mid_attn(x)
        x = self.norm_out(x)  # no swish (autoencoder_uni.py:506 commented out)
        x = self.conv_out(x)
        return 2.0 * jax.nn.sigmoid(x.astype(jnp.float32)) - 1.0  # SigLu


class UniGANDecoder(nn.Module):
    """GANDecoder with mid-attention after conv_in (autoencoder_uni.py:509-632)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    out_ch: int = 3
    attn_blocks: int = 2
    n_heads: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        num_blocks = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_blocks - 1]
        self.conv_in = nn.Conv(block_in, (3, 3), padding=1, use_bias=True,
                               dtype=self.dtype)
        self.mid_attn = MidAttentionStack(
            block_in, self.n_heads, self.attn_blocks, decoder_coords=True,
            dtype=self.dtype)
        self.mid_block = [ResBlock(block_in, block_in, dtype=self.dtype)
                          for _ in range(self.num_res_blocks)]
        ups, adaptive = [], []
        bi = block_in
        for i_level in reversed(range(num_blocks)):
            block_out = self.ch * self.ch_mult[i_level]
            adaptive.insert(0, AdaptiveGroupNorm(self.z_channels, bi,
                                                 dtype=self.dtype))
            blocks = []
            for _ in range(self.num_res_blocks):
                blocks.append(ResBlock(bi, block_out, dtype=self.dtype))
                bi = block_out
            level = {"block": blocks}
            if i_level > 0:
                level["upsample"] = Upsampler(bi, dtype=self.dtype)
            ups.insert(0, level)
        self.up = ups
        self.adaptive = adaptive
        self.norm_out = GroupNorm32(bi)
        self.conv_out = nn.Conv(self.out_ch, (3, 3), padding=1,
                                dtype=self.dtype)

    def __call__(self, z, noise_rng=None):
        style = z
        if noise_rng is None:
            noise_rng = self.make_rng("noise")
        noise = jax.random.normal(noise_rng, z.shape, z.dtype)
        z = jnp.concatenate([z, noise], axis=-1)
        z = self.conv_in(z)
        if self.attn_blocks > 0:
            z = self.mid_attn(z)
        for blk in self.mid_block:
            z = blk(z)
        num_blocks = len(self.ch_mult)
        for i_level in reversed(range(num_blocks)):
            z = self.adaptive[i_level](z, style)
            for blk in self.up[i_level]["block"]:
                z = blk(z)
            if i_level > 0:
                z = self.up[i_level]["upsample"](z)
        z = self.norm_out(z)
        z = swish(z)
        return self.conv_out(z)


class UniVQModel(nn.Module):
    """Sign-quantized UniWeTok autoencoder (autoencoder_uni.py:634-727)."""

    ddconfig: dict
    dtype: Any = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        common = dict(
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"], z_channels=dd["z_channels"],
            attn_blocks=dd.get("attn_blocks", 2),
            n_heads=dd.get("n_heads", 16), dtype=self.dtype,
        )
        self.encoder = UniEncoder(**common)
        self.decoder = UniGANDecoder(out_ch=dd.get("out_ch", 3), **common)

    @property
    def patch_size(self) -> int:
        return 2 ** (len(self.ddconfig["ch_mult"]) - 1)

    def encode(self, x):
        return sign_quantize(self.encoder(x))

    def encode_raw(self, x):
        return self.encoder(x)

    def decode(self, quant, noise_rng=None):
        return self.decoder(quant, noise_rng=noise_rng)

    def __call__(self, x, noise_rng=None):
        quant = self.encode(x)
        return self.decode(quant, noise_rng=noise_rng), quant
