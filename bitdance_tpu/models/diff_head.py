"""Binary diffusion heads: flow-matching x-prediction networks.

Two net families, matching the reference:

  - TransEncoder (modeling/vision_head/flow_head_parallel_x.py:254-342):
    attention over the `parallel_num`-token window, 6-way shared adaLN,
    SwiGLU or MLP, output bounded to [-1, 1] by 2*sigmoid-1.
  - MlpEncoder (imagenet_gen/src/diff_head.py:158-253): per-token residual
    MLP, 3-way shared adaLN, unbounded output.

The window attention is tiny (16/64 tokens) — it runs as a plain fp32-softmax
einsum which XLA fuses; the full per-step fusion is a Pallas target (see
bitdance_tpu/ops). DiffHead wraps a net with the flow-matching training loss
(logit-normal t, x-prediction, v-space MSE; flow_head_parallel_x.py:68-105)
and the Euler–Maruyama sampler.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bitdance_tpu.models.sampling import euler_maruyama, time_shift
from bitdance_tpu.ops.norms import layer_norm


def _quant_itemsize(quant: bool | str) -> float:
    """Effective bytes/element of the sampler's streamed block weights under
    the sample_weight_quant setting (bf16 / int8 / packed-int4)."""
    return 0.5 if quant == "int4" else (1 if quant else 2)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1000.0) -> jax.Array:
    """Sinusoidal timestep embedding, cos-first (flow_head_parallel_x.py:12-27)."""
    half = dim // 2
    tf = time_factor * t.astype(jnp.float32)
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = tf[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02), name="mlp_0")(t_freq)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.02), name="mlp_2")(x)


class LayerNormAffine(nn.Module):
    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        return layer_norm(x, w, b, self.eps)


class WindowAttention(nn.Module):
    """Non-causal attention over the parallel window (flow_head_parallel_x.py:175-220)."""

    dim: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        hd = self.dim // self.n_head
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.n_head, hd).astype(jnp.float32)
        k = k.reshape(b, n, self.n_head, hd).astype(jnp.float32)
        v = v.reshape(b, n, self.n_head, hd).astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="wo")(o.astype(x.dtype))


class TransBlock(nn.Module):
    """adaLN-modulated attention + FFN block (flow_head_parallel_x.py:222-252).

    attn_head_dim: 128 for the T2I head (flow_head_parallel_x.py:227), 64 for
    the ImageNet parallel head (diff_head_parallel.py TransBlock).
    """

    channels: int
    use_swiglu: bool = False
    attn_head_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mods, train: bool = False):
        scale1, shift1, gate1, scale2, shift2, gate2 = mods
        norm1 = LayerNormAffine(self.channels, name="norm1")
        attn = WindowAttention(self.channels,
                               self.channels // self.attn_head_dim,
                               dtype=self.dtype, name="attn")

        # the fused Pallas block is inference-only (no VJP); training takes
        # the XLA path, which fuses well enough under value_and_grad
        fused_attn = (
            not train
            and jax.default_backend() == "tpu"
            and x.ndim == 3
            and not self.is_initializing()
            and self.channels % 128 == 0
            and x.shape[1] % 8 == 0
        )
        if fused_attn:
            from bitdance_tpu.ops.fused_block import (
                fused_attn_available,
                fused_attn_block,
            )

            itemsize = jnp.dtype(self.dtype).itemsize
            if fused_attn_available(self.channels, itemsize):
                p_norm = self.variables["params"]["norm1"]
                p_attn = self.variables["params"]["attn"]
                bcast = lambda m: jnp.broadcast_to(m, x.shape)
                x = fused_attn_block(
                    x, bcast(scale1), bcast(shift1), bcast(gate1),
                    p_norm["weight"], p_norm["bias"],
                    p_attn["wqkv"]["kernel"].astype(self.dtype),
                    p_attn["wqkv"]["bias"],
                    p_attn["wo"]["kernel"].astype(self.dtype),
                    p_attn["wo"]["bias"],
                    n_head=self.channels // self.attn_head_dim,
                ).astype(x.dtype)
            else:
                fused_attn = False
        if not fused_attn:
            h = norm1(x) * (1 + scale1) + shift1
            h = attn(h)
            x = x + h * gate1
        hidden = int(self.channels * 1.5)
        norm2 = LayerNormAffine(self.channels, name="norm2")
        if self.use_swiglu:
            w1 = nn.Dense(hidden * 2, dtype=self.dtype, name="w1")
            w2 = nn.Dense(self.channels, dtype=self.dtype, name="w2")
            # fuse the SwiGLU half into one Pallas call (see MlpResBlock)
            use_fused = (
                not train  # no VJP on the fused kernel (see attn half)
                and jax.default_backend() == "tpu"
                and x.ndim == 3 and not self.is_initializing()
                and self.channels % 128 == 0
                and (hidden * 2) % 128 == 0
            )
            if use_fused:
                from bitdance_tpu.ops.fused_block import (
                    fused_block_available,
                    fused_mlp_block,
                )

                itemsize = jnp.dtype(self.dtype).itemsize
                b, n, c = x.shape
                if fused_block_available(b * n, c, hidden * 2, itemsize):
                    p_norm = self.variables["params"]["norm2"]
                    p_w1 = self.variables["params"]["w1"]
                    p_w2 = self.variables["params"]["w2"]
                    flat = x.reshape(b * n, c)
                    bcast = lambda m: jnp.broadcast_to(m, x.shape).reshape(
                        b * n, c)
                    out = fused_mlp_block(
                        flat, bcast(scale2), bcast(shift2), bcast(gate2),
                        p_norm["weight"], p_norm["bias"],
                        p_w1["kernel"].astype(self.dtype), p_w1["bias"],
                        p_w2["kernel"].astype(self.dtype), p_w2["bias"],
                    )
                    return out.reshape(b, n, c).astype(x.dtype)
            h = norm2(x) * (1 + scale2) + shift2
            h12 = w1(h)
            h1, h2 = jnp.split(h12, 2, axis=-1)
            h = w2(nn.silu(h1) * h2)
        else:
            h = norm2(x) * (1 + scale2) + shift2
            h = nn.Dense(hidden, dtype=self.dtype, name="mlp_0")(h)
            h = nn.Dense(self.channels, dtype=self.dtype, name="mlp_2")(nn.silu(h))
        return x + h * gate2


class MlpResBlock(nn.Module):
    """Per-token residual SwiGLU block (diff_head.py:128-141).

    On TPU the whole block (LN + adaLN modulation + SwiGLU MLP + gated
    residual) runs as ONE fused Pallas kernel — the sampler calls the net
    50-100x sequentially, so per-op launch overhead dominates otherwise.
    """

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mods, train: bool = False):
        scale, shift, gate = mods
        hidden = int(self.channels * 1.5)
        norm = LayerNormAffine(self.channels, name="norm")
        w1 = nn.Dense(hidden * 2, dtype=self.dtype, name="w1")
        w2 = nn.Dense(self.channels, dtype=self.dtype, name="w2")

        use_fused = (
            not train  # fused kernel has no VJP; training takes XLA
            and jax.default_backend() == "tpu"
            and x.ndim == 2 and self.channels % 128 == 0
            and (hidden * 2) % 128 == 0
        )
        if use_fused:
            from bitdance_tpu.ops.fused_block import (
                fused_block_available,
                fused_mlp_block,
            )

            itemsize = jnp.dtype(self.dtype).itemsize
            if fused_block_available(x.shape[0], self.channels, hidden * 2,
                                     itemsize):
                if self.is_initializing():
                    h = norm(x) * (1 + scale) + shift
                    h12 = w1(h)
                    h1, h2 = jnp.split(h12, 2, axis=-1)
                    return x + w2(nn.silu(h1) * h2) * gate
                p_norm = self.variables["params"]["norm"]
                p_w1 = self.variables["params"]["w1"]
                p_w2 = self.variables["params"]["w2"]
                bcast = lambda m: jnp.broadcast_to(m, x.shape)
                return fused_mlp_block(
                    x, bcast(scale), bcast(shift), bcast(gate),
                    p_norm["weight"], p_norm["bias"],
                    p_w1["kernel"].astype(self.dtype), p_w1["bias"],
                    p_w2["kernel"].astype(self.dtype), p_w2["bias"],
                ).astype(x.dtype)

        h = norm(x) * (1 + scale) + shift
        h12 = w1(h)
        h1, h2 = jnp.split(h12, 2, axis=-1)
        h = w2(nn.silu(h1) * h2)
        return x + h * gate


class FinalLayer(nn.Module):
    """adaLN final projection, zero-init (flow_head_parallel_x.py:162-173)."""

    channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        mod = nn.Dense(self.channels * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="ada_ln_modulation")(y)
        scale, shift = jnp.split(mod, 2, axis=-1)
        x = layer_norm(x) * (1.0 + scale) + shift
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="linear")(x)


class DiffNet(nn.Module):
    """Shared skeleton of TransEncoder / MlpEncoder.

    attention=True  -> TransEncoder (6 mods/block, bounded output)
    attention=False -> MlpEncoder  (3 mods/block, unbounded output)
    """

    in_channels: int
    model_channels: int
    z_channels: int
    num_res_blocks: int
    num_ada_ln_blocks: int = 2
    attention: bool = True
    use_swiglu: bool = False
    bounded_output: bool | None = None
    attn_head_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, c, train: bool = False):
        """x: noisy latents; t: [B]; c: conditioning (same leading dims as x)."""
        bounded = self.bounded_output
        if bounded is None:
            bounded = self.attention
        n_mods = 6 if self.attention else 3

        h = nn.Dense(self.model_channels, dtype=self.dtype, name="input_proj")(x)
        t_emb = TimestepEmbedder(self.model_channels, dtype=self.dtype,
                                 name="time_embed")(t)
        if x.ndim == 3:
            t_emb = t_emb[:, None, :]
        c_emb = nn.Dense(self.model_channels, dtype=self.dtype, name="cond_embed")(c)
        y = nn.silu(t_emb + c_emb)

        switch_freq = max(1, self.num_res_blocks // self.num_ada_ln_blocks)
        assert self.num_res_blocks % switch_freq == 0

        ada_lns = [
            nn.Dense(self.model_channels * n_mods, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name=f"ada_ln_{i}")
            for i in range(self.num_ada_ln_blocks)
        ]
        mods = jnp.split(ada_lns[0](y), n_mods, axis=-1)
        for i in range(self.num_res_blocks):
            if i > 0 and i % switch_freq == 0:
                mods = jnp.split(ada_lns[i // switch_freq](y), n_mods, axis=-1)
            if self.attention:
                h = TransBlock(self.model_channels, self.use_swiglu,
                               attn_head_dim=self.attn_head_dim,
                               dtype=self.dtype, name=f"block_{i}")(
                                   h, mods, train=train)
            else:
                h = MlpResBlock(self.model_channels, dtype=self.dtype,
                                name=f"block_{i}")(h, mods, train)

        out = FinalLayer(self.model_channels, self.in_channels, dtype=self.dtype,
                         name="final_layer")(h, y)
        if bounded:
            out = 2.0 * jax.nn.sigmoid(out.astype(jnp.float32)) - 1.0
        return out.astype(x.dtype)


class DiffHead(nn.Module):
    """Flow-matching head: training loss + sampling (flow_head_parallel_x.py:32-120)."""

    ch_target: int
    ch_cond: int
    ch_latent: int
    depth_latent: int
    depth_adanln: int
    time_shift: float = 1.0
    time_schedule: str = "logit_normal"
    P_mean: float = 0.0
    P_std: float = 1.0
    parallel_num: int = 4
    diff_batch_mul: int = 1
    use_swiglu: bool = False
    attention: bool = True
    per_token_loss: bool = True
    bounded_output: bool | None = None
    attn_head_dim: int = 128
    dtype: Any = jnp.float32
    # weight-only quantization for the fused TPU sampler: the sampler is
    # HBM-bound on block weights, so True (int8 W8A8) ~halves sampling time
    # and "int4" (packed W4A8) halves the weight DMA again; opt-in because
    # it perturbs outputs at the ~1e-2 (int8) / ~1e-1 (int4) level pre-sign.
    sample_weight_quant: bool | str = False

    def setup(self):
        self.net = DiffNet(
            in_channels=self.ch_target,
            model_channels=self.ch_latent,
            z_channels=self.ch_cond,
            num_res_blocks=self.depth_latent,
            num_ada_ln_blocks=self.depth_adanln,
            attention=self.attention,
            use_swiglu=self.use_swiglu,
            bounded_output=self.bounded_output,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
        )

    def __call__(self, x, cond, rng):
        """Training loss. x: targets (±1 latents); cond: LLM hidden states.

        x/cond: [N, P, C] (parallel, per-token loss over dim 2) or [N, C]
        (imagenet MLP head, scalar loss). Matches flow_head_parallel_x.py:68-105.
        """
        kt, ke = jax.random.split(rng)
        xf = x.astype(jnp.float32)
        n = x.shape[0]
        if self.time_schedule == "logit_normal":
            t = jax.nn.sigmoid(
                jax.random.normal(kt, (n,)) * self.P_std + self.P_mean
            )
        elif self.time_schedule == "uniform":
            t = jax.random.uniform(kt, (n,))
        else:
            raise NotImplementedError(self.time_schedule)
        if self.time_shift != 1.0:
            t = time_shift(t, self.time_shift)
        t = jax.lax.stop_gradient(t)

        e = jax.random.normal(ke, xf.shape, jnp.float32)
        ti = t.reshape((-1,) + (1,) * (xf.ndim - 1))
        z = (1.0 - ti) * e + ti * xf
        v = (xf - z) / jnp.maximum(1.0 - ti, 0.05)

        x_pred = self.net(z.astype(self.dtype), t, cond, train=True)
        v_pred = (x_pred.astype(jnp.float32) - z) / jnp.maximum(1.0 - ti, 0.05)
        sq = jnp.square(v - v_pred)
        if self.per_token_loss and sq.ndim == 3:
            return jnp.mean(sq, axis=2)  # [N, P] per-token
        return jnp.mean(sq)

    def sample(self, cond, rng, cfg, num_sampling_steps: int,
               cfg_mult: int | None = None):
        """Euler–Maruyama sampling conditioned on fused [cond; uncond] rows.

        On TPU the ENTIRE sampler (all net calls + EM updates) runs as one
        Pallas kernel with VMEM-resident state and HBM-streamed block
        weights (ops/fused_head.py); other backends use the lax.scan path.
        """
        if self._can_fuse_sample(cond, cfg_mult):
            return self._fused_sample(cond, rng, cfg, num_sampling_steps)
        if self._can_stack_sample(cond, cfg_mult):
            return self._fused_sample(cond, rng, cfg, num_sampling_steps,
                                      use_kernel=False)
        return euler_maruyama(
            lambda xx, tt, cc: self.net(xx, tt, cc),
            cond,
            rng,
            self.ch_target,
            cfg=cfg,
            cfg_mult=cfg_mult,
            num_sampling_steps=num_sampling_steps,
            flow_shift=self.time_shift,
        )

    def _sample_shape_ok(self, cond, cfg_mult) -> bool:
        rows = 1
        for d in cond.shape[:-1]:
            rows *= d
        return (
            jax.default_backend() == "tpu"
            and not self.is_initializing()
            and cfg_mult == 2
            # MlpResBlock (attention=False) is SwiGLU regardless of the
            # use_swiglu flag (it only selects TransBlock's MLP family), so
            # the 1x imagenet MLP head qualifies for the fused sampler too
            and (self.use_swiglu or not self.attention)
            and self.ch_latent % 128 == 0
            and self.ch_latent % self.attn_head_dim == 0
            and cond.ndim == (3 if self.attention else 2)
            and rows % 2 == 0
            and (not self.attention or cond.shape[0] % 2 == 0)
        )

    def _can_fuse_sample(self, cond, cfg_mult) -> bool:
        from bitdance_tpu.ops.fused_head import (
            fused_net_available,
            streamed_em_preferred,
        )

        rows = 1
        for d in cond.shape[:-1]:
            rows *= d
        itemsize = _quant_itemsize(self.sample_weight_quant)
        return (self._sample_shape_ok(cond, cfg_mult)
                and (fused_net_available(self.ch_latent, rows,
                                         self.attention)
                     or streamed_em_preferred(
                         self.ch_latent, rows, self.attention,
                         weight_itemsize=itemsize,
                         mods_itemsize=2 if self.dtype == jnp.bfloat16
                         else 4)))

    def _can_stack_sample(self, cond, cfg_mult) -> bool:
        """Stacked XLA sampler: same precomputed-mods design as the fused
        kernel but with block weights riding a lax.scan — for widths whose
        per-block weights exceed VMEM (the 5120-wide 14B head)."""
        return self._sample_shape_ok(cond, cfg_mult)

    def _stack_for_sampler(self):
        from bitdance_tpu.ops.fused_head import stack_diffnet_params

        out = stack_diffnet_params(
            self.variables["params"]["net"], self.depth_latent,
            self.attention,
            dtype=jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32,
            quant=self.sample_weight_quant)
        # the EM samplers read the ada projections only through the
        # concatenated modcat copy (em_precompute); dropping the separate
        # stacks saves ~660MB at 14B width (they are only needed by the
        # per-net-call fused_diffnet_forward entry point)
        for k in ("ada_w", "ada_b", "f_ada_w", "f_ada_b"):
            out.pop(k, None)
        return out

    def _fused_sample(self, cond, rng, cfg, num_sampling_steps: int,
                      stacked: dict | None = None, use_kernel: bool = True):
        if stacked is None:
            stacked = self._stack_for_sampler()
        return _run_fused_sample(self, stacked, cond, rng, cfg, num_sampling_steps,
                                 use_kernel=use_kernel and "hm_marker" not in stacked)


def _run_fused_sample(head: DiffHead, stacked: dict, cond, rng, cfg,
                      num_sampling_steps: int, use_kernel: bool = True):
    """Whole-sampler invocation from pre-stacked weights: the Pallas kernel
    when per-block weights fit VMEM, else the stacked-scan XLA twin."""
    from bitdance_tpu.ops.fused_head import (
        em_precompute,
        em_sample_stacked,
        fused_em_sample,
    )

    mods_dtype = (jnp.bfloat16 if head.dtype == jnp.bfloat16
                  else jnp.float32)
    if head.attention:
        g_all, w, _ = cond.shape
        rows = g_all * w
    else:
        g_all, w = 1, cond.shape[0]
        rows = cond.shape[0]
    half = rows // 2
    c_flat = cond.reshape(rows, -1).astype(jnp.float32)
    c_emb = c_flat @ stacked["cond_w"] + stacked["cond_b"]

    last_step = 0.05
    t_all = jnp.linspace(0.0, 1.0 - last_step, num_sampling_steps + 1)
    t_all = time_shift(t_all, head.time_shift).astype(jnp.float32)
    dt_all = jnp.concatenate(
        [t_all[1:] - t_all[:-1], jnp.zeros((1,), jnp.float32)])

    k0, kn = jax.random.split(rng)
    x0 = jax.random.normal(k0, (half, head.ch_target), jnp.float32)
    noise = jax.random.normal(
        kn, (num_sampling_steps, half, head.ch_target), jnp.float32)

    bounded = (head.bounded_output if head.bounded_output is not None
               else head.attention)
    common = dict(
        num_blocks=head.depth_latent, num_ada=head.depth_adanln,
        n_head=head.ch_latent // head.attn_head_dim, groups=g_all,
        attention=head.attention, bounded=bounded,
        last_step_size=last_step)
    cfg_arr = jnp.asarray(cfg, jnp.float32)
    if use_kernel:
        # chunk the SAMPLER over steps when the full [S, R, W] mods buffer
        # would be GBs (1.87GB bf16 at 14B/2-image width): each chunk
        # precomputes + consumes only its own mods slice, so peak HBM is
        # one chunk (~256MB) instead of the whole buffer — the allocation
        # that OOMed the 28L flagship decode program in round 2. The latent
        # state x chains between chunks (final_chunk=False skips the final
        # euler step and returns the post-EM state).
        import os

        width = stacked["modcat_w"].shape[1]
        itemsize = jnp.dtype(mods_dtype).itemsize
        mods_bytes = (num_sampling_steps + 1) * rows * width * itemsize
        limit = int(os.environ.get("BITDANCE_MODS_CHUNK_MB", "256")) \
            * 1024 * 1024
        if mods_bytes > limit:
            n_chunks = -(-mods_bytes // limit)
            chunk = -(-num_sampling_steps // n_chunks)
            x = x0
            s0 = 0
            while s0 < num_sampling_steps:
                c = min(chunk, num_sampling_steps - s0)
                last = s0 + c >= num_sampling_steps
                n_rows = c + 1 if last else c
                t_sl = t_all[s0:s0 + n_rows]
                mods_c = em_precompute(stacked, c_emb, t_sl,
                                       out_dtype=mods_dtype)
                x = fused_em_sample(
                    stacked, x, noise[s0:s0 + c], mods_c, t_sl,
                    dt_all[s0:s0 + n_rows], cfg_arr,
                    final_chunk=last, **common)
                s0 += c
            out = x
        else:
            allmods = em_precompute(stacked, c_emb, t_all,
                                    out_dtype=mods_dtype)
            out = fused_em_sample(stacked, x0, noise, allmods, t_all,
                                  dt_all, cfg_arr, **common)
    else:
        # chunk the precomputed-mods buffer when it would be large (GBs at
        # 14B width with multi-image batches); divisor-of-S chunks keep the
        # scans rectangular
        width = stacked["modcat_w"].shape[1]
        mods_bytes = (num_sampling_steps + 1) * rows * width \
            * jnp.dtype(mods_dtype).itemsize
        mods_chunks = 1
        for d in (2, 5, 10, 25):
            if mods_bytes // mods_chunks <= 256 * 1024 * 1024:
                break
            if num_sampling_steps % d == 0:
                mods_chunks = d
        # bf16 elementwise glue on the quantized serving path: every matmul
        # input is already quantized to 8 bits there, so bf16 rounding is
        # noise next to the activation-quantization error, and it halves
        # the VPU glue traffic of the MXU-bound 14B head
        glue = jnp.bfloat16 if "w1_s" in stacked else jnp.float32
        out = em_sample_stacked(
            stacked, x0, noise, None, t_all, dt_all, cfg_arr,
            c_emb=c_emb, mods_chunks=mods_chunks, glue_dtype=glue, **common)
    if head.attention:
        return out.reshape(g_all // 2, w, head.ch_target)
    return out


def make_fused_sampler(head: DiffHead, head_variables: dict | None,
                       stacked: dict | None = None):
    """Build a sampling closure with head weights PRE-STACKED (and, when
    head.sample_weight_quant, pre-quantized) for the fused TPU sampler.

    Call OUTSIDE the AR decode scan: XLA does not reliably hoist the
    stack/quantize chain out of `lax.scan`, which otherwise re-materializes
    ~100MB of weights per AR step. The returned fn falls back to the
    lax.scan sampler when the fused path doesn't apply to `cond`.

    Pass `stacked` (built once via DiffHead._stack_for_sampler, e.g.
    T2IModelBundle.head_stacked) to avoid a second in-trace copy of the
    head weights; `head_variables` may then be None, which disables the
    flax fallback (the stacked samplers cover every generation shape).

    sample_fn(cond, rng, cfg, num_sampling_steps, cfg_mult=2) -> latents
    """
    if stacked is None and head_variables is not None \
            and jax.default_backend() == "tpu":
        stacked = head.apply(head_variables,
                             method=DiffHead._stack_for_sampler)

    def sample_fn(cond, rng, cfg, num_sampling_steps, cfg_mult=2):
        def impl(m: DiffHead, cond, rng, cfg):
            if stacked is not None and m._can_fuse_sample(cond, cfg_mult):
                return m._fused_sample(cond, rng, cfg, num_sampling_steps,
                                       stacked=stacked)
            if stacked is not None and m._can_stack_sample(cond, cfg_mult):
                return m._fused_sample(cond, rng, cfg, num_sampling_steps,
                                       stacked=stacked, use_kernel=False)
            return euler_maruyama(
                lambda xx, tt, cc: m.net(xx, tt, cc), cond, rng,
                m.ch_target, cfg=cfg, cfg_mult=cfg_mult,
                num_sampling_steps=num_sampling_steps,
                flow_shift=m.time_shift)

        if head_variables is None:
            # stacked-only mode: no flax tree resident; the module instance
            # is used purely for its static config
            assert stacked is not None, "need head_variables or stacked"
            return _run_stacked_dispatch(head, stacked, cond, rng, cfg,
                                         num_sampling_steps, cfg_mult)
        return head.apply(head_variables, cond, rng, cfg, method=impl)

    return sample_fn


def _run_stacked_dispatch(head: DiffHead, stacked: dict, cond, rng, cfg,
                          num_sampling_steps: int, cfg_mult: int):
    """Sampler dispatch without a bound flax module (stacked-only mode).

    No backend gate: stacked-only bundles have no flax fallback, and the
    stacked XLA sampler runs anywhere (the Pallas kernels stay TPU-only
    via use_kernel). A TP head-major stacked tree ("hm_marker",
    parallel/tp.py) always routes to the stacked XLA sampler — the GSPMD
    shardings propagate through it; the manual-DMA kernel is a
    single-device program."""
    from bitdance_tpu.ops.fused_head import (
        fused_net_available,
        streamed_em_preferred,
    )

    rows = 1
    for d in cond.shape[:-1]:
        rows *= d
    ok = (
        cfg_mult == 2
        and head.use_swiglu
        and head.ch_latent % 128 == 0
        and head.ch_latent % head.attn_head_dim == 0
        and cond.ndim == (3 if head.attention else 2)
        and rows % 2 == 0
        and (not head.attention or cond.shape[0] % 2 == 0)
    )
    assert ok, "stacked-only sampler requires the stacked-path shape contract"
    use_kernel = (
        "hm_marker" not in stacked
        and jax.default_backend() == "tpu"
        and (fused_net_available(head.ch_latent, rows, head.attention)
             or streamed_em_preferred(
                 head.ch_latent, rows, head.attention,
                 weight_itemsize=_quant_itemsize(head.sample_weight_quant),
                 mods_itemsize=2 if head.dtype == jnp.bfloat16 else 4)))
    return _run_fused_sample(head, stacked, cond, rng, cfg,
                             num_sampling_steps, use_kernel=use_kernel)
