"""Does XLA lower s8 x s8 -> s32 conv to the fast MXU path on TPU?

Times a representative VAE-decoder conv (256px, 128ch 3x3) in bf16 vs int8.
"""
import sys
import time

import jax
import jax.numpy as jnp


B, H, W, C = 16, 256, 256, 128
K = 3


def bench(fn, *args, iters=3):
    out = fn(*args)
    fence = float(jnp.sum(out.astype(jnp.float32)[:, ::64, ::64]))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        fence = float(jnp.sum(out.astype(jnp.float32)[:, ::64, ::64]))
        ts.append(time.time() - t0)
    return min(ts), fence


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


@jax.jit
def run_bf16(x, w):
    def step(x, _):
        y = conv(x, w, jnp.float32).astype(jnp.bfloat16)
        return y, ()
    y, _ = jax.lax.scan(step, x, None, length=10)
    return y


@jax.jit
def run_int8(xq, wq):
    def step(xq, _):
        y = conv(xq, wq, jnp.int32)
        # requantize to keep the loop int8 (shift down to stay in range)
        yq = jnp.clip(y // (1 << 10), -127, 127).astype(jnp.int8)
        return yq, ()
    y, _ = jax.lax.scan(step, xq, None, length=10)
    return y


k1, k2 = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
w = (jax.random.normal(k2, (K, K, C, C)) * 0.05).astype(jnp.bfloat16)
xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127, 127).astype(jnp.int8)
wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 640), -127, 127).astype(jnp.int8)

flops = 10 * 2 * B * H * W * C * C * K * K
t_bf, _ = bench(run_bf16, x, w)
print(f"bf16 conv x10: {t_bf*1e3:.1f} ms -> {flops/t_bf/1e12:.1f} TFLOP/s")
t_i8, _ = bench(run_int8, xq, wq)
print(f"int8 conv x10: {t_i8*1e3:.1f} ms -> {flops/t_i8/1e12:.1f} Tops/s")
print(f"speedup: {t_bf/t_i8:.2f}x")
