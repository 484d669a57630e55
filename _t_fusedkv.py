import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from bitdance_tpu.ops.decode_attention import (
    decode_attention_fusedkv, pack_kv_rows, quantize_kv_rows,
    dequantize_fused_kv)
from bitdance_tpu.ops.attention import attention_xla

B, S, H, D, L = 3, 4, 6, 64, 384
k0 = jax.random.PRNGKey(0)
q = jax.random.normal(k0, (B, S, H, D), jnp.float32)
kf = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D), jnp.float32)
vf = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D), jnp.float32)
kv_len = jnp.array([130, 5, 384], jnp.int32)
kv_start = jnp.array([0, 0, 40], jnp.int32)

# reference
pos = jnp.arange(L)
mask = (pos[None] >= kv_start[:, None]) & (pos[None] < kv_len[:, None])
ref = attention_xla(q, kf, vf, mask[:, None, None, :])

# bf16-mode fused buffer
kv = pack_kv_rows(kf, vf)
out = decode_attention_fusedkv(q, kv, kv_len, kv_start, interpret=True)
print("bf16-mode max err:", float(jnp.max(jnp.abs(out - ref))))

# int8 mode
kvq, sc = quantize_kv_rows(kf, vf)
out8 = decode_attention_fusedkv(q, kvq, kv_len, kv_start, kv_scales=sc,
                                interpret=True)
err8 = float(jnp.max(jnp.abs(out8 - ref)))
print("int8-mode max err:", err8)
# dequant roundtrip
kd, vd = dequantize_fused_kv(kvq, sc)
kd = jnp.transpose(kd, (0, 2, 1, 3))
print("k dequant err:", float(jnp.max(jnp.abs(kd - kf))))
assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
assert err8 < 0.05
print("OK")
