"""Tokenizer encode throughput (imgs/sec) on TPU: fused vs unfused tail.

Geometry = the T2I production tokenizer (ch=128, ch_mult [1,1,2,2,4],
z=32, patch 16) at 256px, and the imagenet ch=256 variant.

  python -m benchmarks.bench_tokenizer [--res 256] [--batch 64] [--ch 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.ops.quantize import sign_quantize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ch", type=int, default=128)
    ap.add_argument("--res-blocks", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    dd = dict(z_channels=32, in_channels=3, out_ch=3, ch=args.ch,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=args.res_blocks)
    model = VQModel(ddconfig=dd, dtype=jnp.bfloat16)
    x0 = jnp.zeros((args.batch, args.res, args.res, 3), jnp.bfloat16)
    params = jax.jit(lambda k, x: model.init(k, x, method=VQModel.encode_raw)
                     )(jax.random.PRNGKey(0), x0)
    x = jax.random.normal(jax.random.PRNGKey(1), x0.shape, jnp.bfloat16)

    def chain(encode_fn):
        def run(params, x):
            def body(xx, _):
                q = encode_fn(params, xx)
                mean_q = jnp.mean(q.astype(jnp.float32))
                return xx + (1e-6 * mean_q).astype(xx.dtype), None
            xx, _ = jax.lax.scan(body, x, None, length=args.iters)
            return xx
        return jax.jit(run)

    fused = chain(lambda p, xx: model.apply(p, xx, method=VQModel.encode))
    unfused = chain(lambda p, xx: sign_quantize(
        model.apply(p, xx, method=VQModel.encode_raw)))

    for name, fn in [("unfused", unfused), ("fused  ", fused)]:
        out = fn(params, x)
        fence = float(jnp.sum(out.astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence = float(jnp.sum(fn(params, x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        per = best / args.iters
        print(f"{name}: {per*1e3:7.2f} ms/batch = "
              f"{args.batch/per:8.1f} imgs/sec  (res {args.res}, ch {args.ch})")


if __name__ == "__main__":
    main()
