"""Binary visual tokenizer (conv autoencoder + sign quantization).

TPU-native re-design of the reference tokenizer
(modeling/vision_encoder/autoencoder.py:59-521, imagenet_gen/src/qae.py):

  - NHWC layout end to end (TPU conv layout; the torch reference is NCHW —
    the safetensors importer transposes weights, see bitdance_tpu/io).
  - GroupNorm statistics in fp32; convs run in the module dtype (bf16 on TPU).
  - `encode` = sign of the encoder output: a token IS the ±1 bit-vector
    (autoencoder.py:385-390). Training uses the GFQ quantizer
    (bitdance_tpu/models/gfq.py) with straight-through gradients.
  - Decoder's AdaptiveGroupNorm conditions on global mean/var of the
    quantized latent (autoencoder.py:251-277); GANDecoder concatenates a
    gaussian noise channel block to z (autoencoder.py:325-331).

Geometry: vae_patch_size = 2**(len(ch_mult)-1); the 14B config is
ch=256, ch_mult=[1,1,2,2,4], num_res_blocks=4, z_channels=32 -> 16x, 2^32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bitdance_tpu.ops.norms import group_norm, swish
from bitdance_tpu.ops.quantize import sign_quantize


class GroupNorm32(nn.Module):
    """GroupNorm(32) with torch-style 'weight'/'bias' param names."""

    channels: int
    affine: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = b = None
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.channels,))
            b = self.param("bias", nn.initializers.zeros, (self.channels,))
        return group_norm(x, 32, w, b, self.eps)


class Conv2D(nn.Module):
    """nn.Conv-compatible NHWC conv (identical param tree: 'kernel' HWIO +
    optional 'bias') with an opt-in W8A8 int8 path for serving.

    quant=True quantizes the kernel per-output-channel and the activations
    per-image (symmetric, dynamic) and runs the conv as s8 x s8 -> s32 on
    the MXU — the VAE decoder is conv-compute-bound at 256px, so the int8
    rate is the remaining decode lever. Checkpoints are unchanged: weights
    stay stored in bf16/f32 and quantize per call (the decoder's ~50MB of
    kernels re-quantize once per decode, noise vs the conv FLOPs)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        pad = ((self.padding, self.padding),) * 2
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.quant:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, pad, dimension_numbers=dn)
        else:
            w = kernel.astype(jnp.float32)
            ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                             1e-12) / 127.0                       # [out]
            wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
            xf = x.astype(jnp.float32)
            xs = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                1e-12) / 127.0                                    # [B,1,1,1]
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, self.strides, pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32)
                 * (xs * ws[None, None, None, :])).astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ResBlock(nn.Module):
    """Pre-GN swish conv block (autoencoder.py:13-57)."""

    in_filters: int
    out_filters: int
    use_agn: bool = False
    dtype: jnp.dtype = jnp.float32
    conv_int8: bool = False

    def setup(self):
        if not self.use_agn:
            self.norm1 = GroupNorm32(self.in_filters)
        self.norm2 = GroupNorm32(self.out_filters)
        self.conv1 = Conv2D(self.out_filters, (3, 3), padding=1,
                            use_bias=False, dtype=self.dtype,
                            quant=self.conv_int8)
        self.conv2 = Conv2D(self.out_filters, (3, 3), padding=1,
                            use_bias=False, dtype=self.dtype,
                            quant=self.conv_int8)
        if self.in_filters != self.out_filters:
            self.nin_shortcut = Conv2D(self.out_filters, (1, 1),
                                       use_bias=False, dtype=self.dtype,
                                       quant=self.conv_int8)

    def __call__(self, x):
        residual = x
        if not self.use_agn:
            x = self.norm1(x)
        x = swish(x)
        x = self.conv1(x)
        x = self.norm2(x)
        x = swish(x)
        x = self.conv2(x)
        if self.in_filters != self.out_filters:
            residual = self.nin_shortcut(residual)
        return x + residual


class Encoder(nn.Module):
    """Conv downsampling encoder (autoencoder.py:59-127). Input NHWC in [-1,1]."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        num_blocks = len(self.ch_mult)
        self.conv_in = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                               dtype=self.dtype)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        downs = []
        for i_level in range(num_blocks):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            blocks = []
            for _ in range(self.num_res_blocks):
                blocks.append(ResBlock(block_in, block_out, dtype=self.dtype))
                block_in = block_out
            level = {"block": blocks}
            if i_level < num_blocks - 1:
                level["downsample"] = nn.Conv(
                    block_out, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype
                )
            downs.append(level)
        self.down = downs
        block_in = self.ch * self.ch_mult[-1]
        self.mid_block = [
            ResBlock(block_in, block_in, dtype=self.dtype)
            for _ in range(self.num_res_blocks)
        ]
        self.norm_out = GroupNorm32(block_in)
        self.conv_out = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def trunk(self, x):
        """Everything before the quantization tail (norm_out/swish/conv_out)
        — the tail fuses into one Pallas kernel on TPU (ops/fused_encode)."""
        x = self.conv_in(x)
        for i_level, level in enumerate(self.down):
            for blk in level["block"]:
                x = blk(x)
            if "downsample" in level:
                x = level["downsample"](x)
        for blk in self.mid_block:
            x = blk(x)
        return x

    def __call__(self, x):
        x = self.trunk(x)
        x = self.norm_out(x)
        x = swish(x)
        return self.conv_out(x)


def depth_to_space(x: jax.Array, block_size: int) -> jax.Array:
    """DCR depth-to-space for NHWC (autoencoder.py:198-230 NCHW equivalent)."""
    b, h, w, c = x.shape
    s = block_size
    assert c % (s * s) == 0
    cc = c // (s * s)
    x = x.reshape(b, h, w, s, s, cc)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * s, w * s, cc)


class Upsampler(nn.Module):
    """conv -> depth_to_space(2) upsampler (autoencoder.py:232-249)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    conv_int8: bool = False

    def setup(self):
        self.conv1 = Conv2D(self.dim * 4, (3, 3), padding=1,
                            dtype=self.dtype, quant=self.conv_int8)

    def __call__(self, x):
        return depth_to_space(self.conv1(x), 2)


class AdaptiveGroupNorm(nn.Module):
    """GN modulated by global latent statistics (autoencoder.py:251-277).

    scale = gamma(sqrt(var_spatial(z) + eps)), bias = beta(mean_spatial(z));
    var uses the unbiased (N-1) estimator to match torch.Tensor.var defaults.
    """

    z_channels: int
    in_filters: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.gamma = nn.Dense(self.in_filters, dtype=self.dtype)
        self.beta = nn.Dense(self.in_filters, dtype=self.dtype)

    def __call__(self, x, style):
        # style: [B, h, w, z_channels] NHWC
        b = style.shape[0]
        sf = style.astype(jnp.float32).reshape(b, -1, style.shape[-1])
        n = sf.shape[1]
        mean = jnp.mean(sf, axis=1)
        var = jnp.sum(jnp.square(sf - mean[:, None, :]), axis=1) / jnp.maximum(n - 1, 1)
        scale = self.gamma(jnp.sqrt(var + self.eps).astype(x.dtype))
        bias = self.beta(mean.astype(x.dtype))
        x = group_norm(x, 32, None, None, self.eps)
        return scale[:, None, None, :] * x + bias[:, None, None, :]


class Decoder(nn.Module):
    """Conv upsampling decoder with AdaGN conditioning (autoencoder.py:129-196).

    gan_decoder=True concatenates a gaussian noise block to z
    (autoencoder.py:325-331) — pass `noise_rng` when calling.
    """

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    out_ch: int = 3
    gan_decoder: bool = False
    dtype: jnp.dtype = jnp.float32
    # W8A8 int8 trunk convs (serving config); conv_in/conv_out stay in the
    # module dtype — the first conv sees ±1 latents and the last one writes
    # RGB, where quantization error is most visible
    conv_int8: bool = False

    def setup(self):
        num_blocks = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_blocks - 1]
        in_ch = self.z_channels * 2 if self.gan_decoder else self.z_channels
        del in_ch  # (input channel count is inferred by flax)
        self.conv_in = nn.Conv(block_in, (3, 3), padding=1, use_bias=True,
                               dtype=self.dtype)
        self.mid_block = [
            ResBlock(block_in, block_in, dtype=self.dtype,
                     conv_int8=self.conv_int8)
            for _ in range(self.num_res_blocks)
        ]
        ups = []
        adaptive = []
        bi = block_in
        for i_level in reversed(range(num_blocks)):
            block_out = self.ch * self.ch_mult[i_level]
            adaptive.insert(0, AdaptiveGroupNorm(self.z_channels, bi, dtype=self.dtype))
            blocks = []
            for _ in range(self.num_res_blocks):
                blocks.append(ResBlock(bi, block_out, dtype=self.dtype,
                                       conv_int8=self.conv_int8))
                bi = block_out
            level = {"block": blocks}
            if i_level > 0:
                level["upsample"] = Upsampler(bi, dtype=self.dtype,
                                              conv_int8=self.conv_int8)
            ups.insert(0, level)
        self.up = ups
        self.adaptive = adaptive
        self.norm_out = GroupNorm32(bi)
        self.conv_out = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)

    def __call__(self, z, noise_rng=None):
        style = z
        if self.gan_decoder:
            if noise_rng is None:
                noise_rng = self.make_rng("noise")
            noise = jax.random.normal(noise_rng, z.shape, z.dtype)
            z = jnp.concatenate([z, noise], axis=-1)
        z = self.conv_in(z)
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


class VQModel(nn.Module):
    """Sign-quantized conv autoencoder (autoencoder.py:354-521).

    encode: image NHWC [-1,1] -> ±1 latents [B, h, w, z_channels]
    decode: ±1 latents -> image NHWC
    """

    ddconfig: dict
    gan_decoder: bool = False
    dtype: jnp.dtype = jnp.float32
    conv_int8: bool = False

    def setup(self):
        dd = dict(self.ddconfig)
        self.encoder = Encoder(
            ch=dd["ch"],
            ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            z_channels=dd["z_channels"],
            in_channels=dd.get("in_channels", 3),
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=dd["ch"],
            ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            z_channels=dd["z_channels"],
            out_ch=dd.get("out_ch", 3),
            gan_decoder=self.gan_decoder,
            dtype=self.dtype,
            conv_int8=self.conv_int8,
        )

    @property
    def patch_size(self) -> int:
        return 2 ** (len(self.ddconfig["ch_mult"]) - 1)

    def encode(self, x):
        import jax

        from bitdance_tpu.ops.fused_encode import (
            fused_encode_tail,
            fused_encode_tail_available,
        )

        trunk_ch = self.ddconfig["ch"] * self.ddconfig["ch_mult"][-1]
        if (jax.default_backend() == "tpu"
                and not self.is_initializing()
                and trunk_ch % 32 == 0):
            h = self.encoder.trunk(x)
            if fused_encode_tail_available(h.shape[1], h.shape[2], trunk_ch):
                p = self.variables["params"]["encoder"]
                return fused_encode_tail(
                    h, p["norm_out"]["weight"], p["norm_out"]["bias"],
                    p["conv_out"]["kernel"][0, 0].astype(self.dtype),
                    p["conv_out"]["bias"])
        h = self.encoder(x)
        return sign_quantize(h)

    def encode_raw(self, x):
        """Pre-quantization encoder output (for GFQ training)."""
        return self.encoder(x)

    def decode(self, quant, noise_rng=None):
        return self.decoder(quant, noise_rng=noise_rng)

    def __call__(self, x, noise_rng=None):
        quant = self.encode(x)
        return self.decode(quant, noise_rng=noise_rng), quant


def latents_to_tokens(quant: jax.Array, ps: int = 1) -> jax.Array:
    """[B, h, w, C] -> [B, h*w, C] with ps-raster ordering.

    Matches 'c (h p1) (w p2) -> (h w p1 p2) c' (autoencoder.py:421).
    """
    b, h, w, c = quant.shape
    hh, ww = h // ps, w // ps
    x = quant.reshape(b, hh, ps, ww, ps, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * w, c)


def tokens_to_latents(tokens: jax.Array, h: int, w: int, ps: int = 1) -> jax.Array:
    """[B, h*w, C] -> [B, h, w, C], inverse of latents_to_tokens.

    Matches 'b (h w p1 p2) c -> b c (h p1) (w p2)' (t2i_pipeline.py:280).
    """
    b, n, c = tokens.shape
    assert n == h * w
    hh, ww = h // ps, w // ps
    x = tokens.reshape(b, hh, ww, ps, ps, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)
