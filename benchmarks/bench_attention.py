"""Micro-benchmark: Pallas flash attention vs XLA attention on TPU.

Workload = the 14B packed-training attention (SURVEY.md §3.2): ~33k packed
tokens, 40 q heads / 8 kv heads, head_dim 128, bf16, the
(causal | parallel-block) & document mask. Reports achieved TFLOP/s
(counting only the unmasked half like flash-attn convention does not —
we report raw 4*L^2*D*H flops and wall time; the tile-skip win shows up
as higher apparent TFLOP/s).

Usage: python benchmarks/bench_attention.py [--seqlen 8192] [--heads 16]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--parallel-num", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--block-k", type=int, default=512)
    ap.add_argument("--docs", type=int, default=2,
                    help="packed documents per sequence (33k batch ~ 8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.ops.attention import (
        attention_xla,
        flash_attention,
        flash_attention_sparse,
        mask_from_ids,
        packed_ids_from_segments,
    )

    L = args.seqlen
    # pack --docs samples, each: short text (causal) + image span (parallel)
    # (the 14B training batch packs many ~4k-token docs into 33k tokens)
    n_docs = args.docs
    text = 256
    per = L // n_docs
    img = (per - text) // args.parallel_num * args.parallel_num
    pad = L - n_docs * (text + img)
    sample_lens = [text + img] * (n_docs - 1) + [text + img + pad]
    split_lens, modes = [], []
    for i in range(n_docs):
        split_lens += [text, img + (pad if i == n_docs - 1 else 0)]
        modes += ["causal", "parallel"]
    block, doc = packed_ids_from_segments(sample_lens, split_lens, modes,
                                          args.parallel_num)
    block, doc = block[None], doc[None]

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, L, args.heads, args.head_dim), jnp.bfloat16)
    k = jax.random.normal(key, (1, L, args.kv_heads, args.head_dim), jnp.bfloat16)
    v = jax.random.normal(key, (1, L, args.kv_heads, args.head_dim), jnp.bfloat16)

    # chain iterations with a data dependency inside one jit so the tunnel
    # cannot pipeline/elide them; per-call time = total / iters
    def chain(fn_one):
        def run(q, *rest):
            def body(qq, _):
                out = fn_one(qq, *rest)
                return qq + 1e-6 * out.astype(qq.dtype), out
            _, outs = jax.lax.scan(body, q, None, length=args.iters)
            return outs[-1]
        return jax.jit(run)

    flash = chain(lambda q, k, v, qb, qd, kb, kd: flash_attention(
        q, k, v, qb, qd, kb, kd, block_q=args.block_q, block_k=args.block_k))
    xla = chain(lambda q, k, v, m: attention_xla(q, k, v, m))

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + forced readback
        t0 = time.perf_counter()
        out = fn(*a)
        # NOTE: on the axon tunnel block_until_ready resolves before device
        # completion; a host readback is the only reliable fence
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters, out

    t_flash, o_flash = timeit(flash, q, k, v, block, doc, block, doc)

    flops = 4 * L * L * args.head_dim * args.heads
    print(f"flash:  {t_flash*1e3:8.2f} ms   {flops/t_flash/1e12:6.2f} TFLOP/s (raw)")

    # sparse iteration: live kv tiles bounded by the longest packed doc
    max_doc = max(sample_lens)
    max_live = (max_doc + args.block_k - 1) // args.block_k + 1
    sparse = chain(lambda q, k, v, qb, qd, kb, kd: flash_attention_sparse(
        q, k, v, qb, qd, kb, kd, max_live_kv=max_live,
        block_q=args.block_q, block_k=args.block_k))
    t_sp, o_sp = timeit(sparse, q, k, v, block, doc, block, doc)
    err_sp = float(jnp.max(jnp.abs(o_flash.astype(jnp.float32)
                                   - o_sp.astype(jnp.float32))))
    print(f"sparse: {t_sp*1e3:8.2f} ms   {flops/t_sp/1e12:6.2f} TFLOP/s (raw)"
          f"   max_live={max_live}/{(L + args.block_k - 1)//args.block_k}"
          f"   vs dense {t_flash/t_sp:.2f}x   max|diff|={err_sp:.4f}")

    if L <= 8192:
        mask = jax.vmap(mask_from_ids)(block, doc, block, doc)[:, None]
        t_xla, o_xla = timeit(xla, q, k, v, mask)
        err = float(jnp.max(jnp.abs(o_flash.astype(jnp.float32)
                                    - o_xla.astype(jnp.float32))))
        print(f"xla:    {t_xla*1e3:8.2f} ms   {flops/t_xla/1e12:6.2f} TFLOP/s (raw)")
        print(f"speedup: {t_xla/t_flash:.2f}x   max|diff|={err:.4f}")


if __name__ == "__main__":
    main()
