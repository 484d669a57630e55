"""Drive bitdance_tpu's public API on the real TPU chip."""
import os
import sys
import time

# allow `python scripts/smoke_tpu.py` without a PYTHONPATH (which would
# break the axon PJRT plugin): put the repo root on sys.path ourselves
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from bitdance_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

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

# --- 5. STREAMED whole-sampler EM kernel (beyond-VMEM head family) vs the ---
# --- stacked XLA sampler on real hardware (the 14B T2I head's fast path)  ---
from bitdance_tpu.ops import fused_head as fh  # noqa: E402

Cs, Hs, chs, Ls, adas, Rs, steps_s = 1024, 1536, 32, 4, 2, 64, 6
ks = jax.random.split(jax.random.PRNGKey(21), 8)
net_s = DiffHead(ch_target=chs, ch_cond=Cs, ch_latent=Cs,
                 depth_latent=Ls, depth_adanln=adas, parallel_num=16,
                 use_swiglu=True, P_mean=-0.8, P_std=0.8,
                 sample_weight_quant=True)
x_s = jnp.zeros((2, 16, chs))
c_s = jax.random.normal(ks[0], (2, 16, Cs)) * 0.02
hp_s = jax.jit(net_s.init)(ks[1], x_s, c_s, ks[2])
stacked_s = dict(jax.jit(
    lambda v: net_s.apply(v, method=DiffHead._stack_for_sampler))(hp_s))
# de-degenerate the comparison: with the zero-init final projection x-hat
# is ~0 and the sampler output is pure cancellation residue (~1e-6 norm),
# so rel-err between two implementations is numerically meaningless.
# A random final projection makes x-hat O(1). (Verified: with this, all
# three kernel regimes match the XLA sampler to 7e-7 max abs on TPU.)
_fw = stacked_s["f_out_w"]
stacked_s["f_out_w"] = (jax.random.normal(ks[6], _fw.shape) * 0.05
                        ).astype(_fw.dtype)
x0_s = jax.random.normal(ks[3], (Rs // 2, chs), jnp.float32)
noise_s = jax.random.normal(ks[4], (steps_s, Rs // 2, chs), jnp.float32)
t_s = jnp.linspace(0.0, 0.95, steps_s + 1).astype(jnp.float32)
dt_s = jnp.concatenate([t_s[1:] - t_s[:-1], jnp.zeros((1,), jnp.float32)])
c_emb_s = jax.random.normal(ks[5], (Rs, Cs), jnp.float32) * 0.02
kw_s = dict(num_blocks=Ls, num_ada=adas, n_head=Cs // 128, groups=4,
            attention=True, bounded=True)


@jax.jit
def _run_streamed(stacked, x0, noise, c_emb):
    allmods = fh.em_precompute(stacked, c_emb, t_s, out_dtype=jnp.bfloat16)
    return fh.fused_em_sample(stacked, x0, noise, allmods, t_s, dt_s,
                              jnp.float32(4.0), resident=False,
                              streamed=True, **kw_s)


@jax.jit
def _run_stacked(stacked, x0, noise, c_emb):
    return fh.em_sample_stacked(stacked, x0, noise, None, t_s, dt_s,
                                jnp.float32(4.0), c_emb=c_emb, **kw_s)


o_streamed = np.asarray(_run_streamed(stacked_s, x0_s, noise_s, c_emb_s))
o_stacked = np.asarray(_run_stacked(stacked_s, x0_s, noise_s, c_emb_s))
rel_s = np.linalg.norm(o_streamed - o_stacked) / max(
    np.linalg.norm(o_stacked), 1e-9)
print("streamed EM kernel vs stacked XLA sampler rel err:", round(rel_s, 5))
assert np.isfinite(o_streamed).all()
assert rel_s < 0.05, rel_s  # bf16 elementwise noise over 6 EM steps

# --- 6. Interleaved any-to-any pipeline (two KV streams, CFG pairing) -------
from bitdance_tpu.pipelines.interleaved import InterleavedGenerator, PlanItem
from tests.test_t2i_pipeline import StubTokenizer, _tiny_bundle


class _Tok(StubTokenizer):
    def __init__(self):
        super().__init__()
        for i, t in enumerate(("<|im_start|>", "<|im_end|>",
                               "<|vision_end|>")):
            self.special[t] = 190 + i

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


_b = _tiny_bundle(parallel_num=4, z=8, hidden=64)
_gen = InterleavedGenerator(_b, _Tok(), max_seq_len=256)
_rng = np.random.default_rng(0)
_plan = [
    PlanItem(type="text", source="user",
             text="<|im_start|>user\ndraw<|im_end|>\n"),
    PlanItem(type="image", source="user",
             image=_rng.normal(size=(8, 8, 3)).astype(np.float32)),
    PlanItem(type="text", source="model"),
    PlanItem(type="image", source="model", image_size=(8, 8)),
]
_t0 = time.time()
_out = _gen.generate(_plan, cfg_scale=2.0, sample_steps=2,
                     max_length_text=3, seed=0)
assert len(_out["generated_text"]) == 1 and len(_out["generated_image"]) == 1
assert _out["generated_image"][0].shape == (8, 8, 3)
assert np.isfinite(_out["generated_image"][0]).all()
_spans = {n for n, *_ in _gen.last_spans}
assert _spans == {"cond", "uncond"}, _spans
print(f"interleaved plan (text+image gen, 2 KV streams) ran in "
      f"{time.time()-_t0:.1f}s")

# --- 7. UniWeTok tokenizer roundtrip (registers + 2D RoPE mid-attention) ----
from bitdance_tpu.models.tokenizer_uni import UniVQModel

_udd = dict(z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
            num_res_blocks=1, attn_blocks=1, n_heads=4)
_uni = UniVQModel(ddconfig=_udd)
_ux = jax.random.uniform(jax.random.PRNGKey(31), (1, 32, 32, 3)) * 2 - 1
_up = jax.jit(lambda k, x: _uni.init(k, x, noise_rng=jax.random.PRNGKey(32))
              )(jax.random.PRNGKey(33), _ux)
_uq = jax.jit(lambda p, x: _uni.apply(p, x, method=UniVQModel.encode)
              )(_up, _ux)
assert set(np.unique(np.asarray(_uq))) <= {-1.0, 1.0}
_ur = jax.jit(lambda p, q: _uni.apply(p, q, method=UniVQModel.decode,
                                      noise_rng=jax.random.PRNGKey(34))
              )(_up, _uq)
assert np.isfinite(np.asarray(_ur)).all()
print("UniWeTok encode/decode on TPU:", _uq.shape, "->", _ur.shape)

print("ALL DRIVES PASSED ON", jax.default_backend().upper())
