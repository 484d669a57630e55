"""Drive bitdance_tpu's public API on the real TPU chip."""
import os
import sys
import time

# allow `python scripts/smoke_tpu.py` without a PYTHONPATH (which would
# break the axon PJRT plugin): put the repo root on sys.path ourselves
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

from bitdance_tpu.ops import (flash_attention, attention_xla, mask_from_ids,
                              packed_ids_from_segments, sign_quantize)
from bitdance_tpu.models.tokenizer import VQModel, latents_to_tokens, tokens_to_latents
from bitdance_tpu.models.diff_head import DiffHead

# --- 1. Pallas flash attention ON TPU vs XLA reference, bf16, packed mask ---
sample_lens, split_lens = [300, 724], [44, 256, 60, 664]
modes = ["causal", "parallel", "causal", "parallel"]
block, doc = packed_ids_from_segments(sample_lens, split_lens, modes, parallel_num=64)
L = sum(sample_lens)
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (1, L, 8, 128), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (1, L, 2, 128), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (1, L, 2, 128), jnp.bfloat16)
ids = (block[None], doc[None])
t0 = time.time()
out_pallas = jax.jit(lambda *a: flash_attention(*a))(q, k, v, ids[0], ids[1], ids[0], ids[1])
out_pallas.block_until_ready()
print(f"pallas flash compiled+ran on TPU in {time.time()-t0:.1f}s, shape {out_pallas.shape}")
mask = jax.vmap(mask_from_ids)(ids[0], ids[1], ids[0], ids[1])
out_ref = attention_xla(q, k, v, mask[:, None])
err = jnp.max(jnp.abs(out_pallas.astype(jnp.float32) - out_ref.astype(jnp.float32)))
print("max |pallas - xla| (bf16):", float(err))
assert float(err) < 0.05, "pallas kernel mismatch on TPU"

# --- 2. Tokenizer roundtrip on TPU (real 14B geometry: 16x downsample, z=32) ---
dd = dict(z_channels=32, in_channels=3, out_ch=3, ch=64, ch_mult=[1,1,2,2,4], num_res_blocks=1)
tok = VQModel(ddconfig=dd)
img = jax.random.uniform(jax.random.PRNGKey(3), (1, 256, 256, 3)) * 2 - 1
params = tok.init(jax.random.PRNGKey(4), img)
quant = jax.jit(lambda p, x: tok.apply(p, x, method=VQModel.encode))(params, img)
print("encode 256px ->", quant.shape, "unique:", np.unique(np.asarray(quant)))
assert quant.shape == (1, 16, 16, 32)
toks = latents_to_tokens(quant, ps=8)
back = tokens_to_latents(toks, 16, 16, ps=8)
assert (np.asarray(back) == np.asarray(quant)).all()
recon = jax.jit(lambda p, z: tok.apply(p, z, method=VQModel.decode))(params, quant)
print("decode ->", recon.shape, "finite:", bool(np.isfinite(np.asarray(recon)).all()))

# --- 3. Diffusion head sample on TPU (64-token window, cfg=7.5, 50 steps) ---
head = DiffHead(ch_target=32, ch_cond=256, ch_latent=256, depth_latent=2,
                depth_adanln=2, parallel_num=64, use_swiglu=True,
                P_mean=-0.8, P_std=0.8)
cond = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 256))  # [cond; uncond]
x_t = jnp.sign(jax.random.normal(jax.random.PRNGKey(6), (2, 64, 32)))
hp = head.init(jax.random.PRNGKey(7), x_t, cond, jax.random.PRNGKey(8))
samp = jax.jit(lambda p, c, k: head.apply(
    p, c, k, 7.5, 50, cfg_mult=2, method=DiffHead.sample))(hp, cond, jax.random.PRNGKey(9))
samp.block_until_ready()
print("head.sample ->", samp.shape, "range", float(samp.min()), float(samp.max()))
tokens = sign_quantize(samp)
print("signed tokens unique:", np.unique(np.asarray(tokens)))

# --- probe: odd seq length + all-masked padding rows on real hardware ---
Lp = 257
qp = jax.random.normal(key, (1, Lp, 4, 128), jnp.bfloat16)
kp = jax.random.normal(key, (1, Lp, 4, 128), jnp.bfloat16)
bb = jnp.arange(Lp, dtype=jnp.int32)[None]
dd2 = jnp.where(jnp.arange(Lp) < 200, 0, -3)[None].astype(jnp.int32)
dk = jnp.where(jnp.arange(Lp) < 200, 0, -2)[None].astype(jnp.int32)
op = flash_attention(qp, kp, kp, bb, dd2, bb, dk)
pad_max = float(jnp.max(jnp.abs(op[0, 200:].astype(jnp.float32))))
print("probe odd-length+padded rows: pad rows max abs =", pad_max)
assert pad_max == 0.0
# --- 4. Flash-attention BACKWARD on real hardware (training-grade VJP) ---
Lg = 512
qg = jax.random.normal(jax.random.PRNGKey(11), (1, Lg, 4, 128), jnp.bfloat16)
kg = jax.random.normal(jax.random.PRNGKey(12), (1, Lg, 2, 128), jnp.bfloat16)
vg = jax.random.normal(jax.random.PRNGKey(13), (1, Lg, 2, 128), jnp.bfloat16)
bg = jnp.arange(Lg, dtype=jnp.int32)[None]
dg = jnp.zeros((1, Lg), jnp.int32)

def attn_loss(q, k, v):
    return jnp.sum(flash_attention(q, k, v, bg, dg, bg, dg).astype(jnp.float32) ** 2)

grads = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))(qg, kg, vg)
gnorms = [float(jnp.linalg.norm(g.astype(jnp.float32))) for g in grads]
print("flash bwd on TPU: |dq|,|dk|,|dv| =", [round(g, 1) for g in gnorms])
assert all(np.isfinite(g) and g > 0 for g in gnorms)

print("ALL DRIVES PASSED ON", jax.default_backend().upper())
