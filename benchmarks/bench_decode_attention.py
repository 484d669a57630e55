"""Micro-benchmark: Pallas flash-decode vs XLA on the T2I decode shape.

Workload = one layer's decode-step attention in BitDance-14B-64x generation
(t2i_pipeline.py:241-268): 64 query tokens (2x batched CFG rows) against a
~4.3k-entry KV cache, GQA 40:8, head_dim 128, bf16.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--qlen", type=int, default=64)
    ap.add_argument("--cache", type=int, default=4352)
    ap.add_argument("--heads", type=int, default=40)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.ops.decode_attention import windowed_decode_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (args.batch, args.qlen, args.heads,
                                args.head_dim), jnp.bfloat16)
    kc = jax.random.normal(key, (args.batch, args.kv_heads, args.cache,
                                 args.head_dim), jnp.bfloat16)
    vc = jax.random.normal(key, (args.batch, args.kv_heads, args.cache,
                                 args.head_dim), jnp.bfloat16)
    kv_len = jnp.full((args.batch,), args.cache - 52, jnp.int32)
    kv_start = (jnp.arange(args.batch, dtype=jnp.int32) * 19) % 64

    def chain(impl):
        def run(q):
            def body(qq, _):
                out = windowed_decode_attention(qq, kc, vc, kv_len, kv_start,
                                                implementation=impl)
                return qq + 1e-6 * out.astype(qq.dtype), out
            _, outs = jax.lax.scan(body, q, None, length=args.iters)
            return outs[-1]
        return jax.jit(run)

    def timeit(fn):
        out = fn(q)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + fence
        t0 = time.perf_counter()
        out = fn(q)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters, out

    t_p, o_p = timeit(chain("pallas"))
    t_x, o_x = timeit(chain("xla"))
    err = float(jnp.max(jnp.abs(o_p.astype(jnp.float32)
                                - o_x.astype(jnp.float32))))
    mem = (args.batch * args.cache * args.kv_heads * args.head_dim * 2 * 2
           + args.batch * args.qlen * args.heads * args.head_dim * 2)
    print(f"pallas: {t_p*1e3:7.3f} ms   ({mem/t_p/1e9:6.1f} GB/s cache stream)")
    print(f"xla:    {t_x*1e3:7.3f} ms")
    print(f"speedup: {t_x/t_p:.2f}x   max|diff|={err:.4f}")


if __name__ == "__main__":
    main()
