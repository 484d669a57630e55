"""Whole-net fused head kernel vs the current flax path, on real TPU.

Geometry = T2I sampling hot loop: C=1024 head (bench_t2i default), p=64
window, B2=2 CFG rows, 50 sequential net calls per AR step. Timing follows
the axon rules: data-dependency-chained calls inside ONE jit, host readback
as the fence.

  python -m benchmarks.bench_fused_head [--c 1024] [--blocks 6] [--rows 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.diff_head import DiffNet
from bitdance_tpu.ops.fused_head import (
    fused_diffnet_forward,
    fused_net_available,
    stack_diffnet_params,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--cond", type=int, default=1024)
    ap.add_argument("--ch", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--ada", type=int, default=2)
    ap.add_argument("--rows", type=int, default=2, help="CFG batch rows (2n)")
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--calls", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    net = DiffNet(in_channels=args.ch, model_channels=args.c,
                  z_channels=args.cond, num_res_blocks=args.blocks,
                  num_ada_ln_blocks=args.ada, attention=True,
                  use_swiglu=True, attn_head_dim=128, dtype=jnp.bfloat16)
    g, w = args.rows, args.window
    x0 = jnp.zeros((g, w, args.ch))
    t0 = jnp.zeros((g,))
    cc = jnp.zeros((g, w, args.cond))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x0, t0, cc)["params"]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g, w, args.ch)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(g, w, args.cond)), jnp.float32)
    n_head = args.c // 128
    calls = args.calls

    def run_flax(params, x, c):
        def body(h, i):
            t = jnp.full((g,), i / calls, jnp.float32)
            out = net.apply({"params": params}, h.astype(jnp.bfloat16), t, c)
            return out.astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, jnp.arange(calls, dtype=jnp.float32))
        return h

    def run_fused(params, x, c):
        stacked = stack_diffnet_params(params, args.blocks, True,
                                       dtype=jnp.bfloat16)
        c_emb = (c.astype(jnp.bfloat16) @ params["cond_embed"]["kernel"]
                 + params["cond_embed"]["bias"]).astype(jnp.float32)

        def body(h, i):
            t = jnp.broadcast_to((i / calls)[None, None], (g, w))
            out = fused_diffnet_forward(
                stacked, h.astype(jnp.bfloat16), t, c_emb,
                num_blocks=args.blocks, num_ada=args.ada, n_head=n_head,
                attention=True, bounded=True)
            return out.astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, jnp.arange(calls, dtype=jnp.float32))
        return h

    print("fused available:", fused_net_available(args.c, g * w, True))
    for name, fn in [("flax ", run_flax), ("fused", run_fused)]:
        jf = jax.jit(fn)
        t0_ = time.time()
        out = jf(params, x, c)
        fence = float(jnp.sum(out.astype(jnp.float32)))
        compile_s = time.time() - t0_
        times = []
        for _ in range(args.iters):
            t1 = time.time()
            out = jf(params, x, c)
            fence = float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.time() - t1)
        best = min(times)
        print(f"{name}: {best*1e3:.2f} ms / {calls} calls = "
              f"{best/calls*1e3:.3f} ms/call  (compile {compile_s:.0f}s, "
              f"fence {fence:.3e})")


if __name__ == "__main__":
    main()
