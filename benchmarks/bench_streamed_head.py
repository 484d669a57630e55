"""Streamed whole-sampler EM kernel vs the stacked XLA sampler on TPU.

Parity (small geometry) + perf at the true T2I 14B head geometry

Compares fused_em_sample(streamed=True) against em_sample_stacked at the
true T2I 14B head geometry: C=5120, H=7680, L=6, ada=2, R=256 rows
(2 images x p=64 x CFG), 50 EM steps, int8 W8A8.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from bitdance_tpu.ops import fused_head as fh

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
# streamed kernel variant: only "dma" remains (the r3 grid-tiled kernel
# was pruned in r5; its A/B record lives in probe_head_dots.py)
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "dma"
assert VARIANT == "dma", "the grid-tiled variant was pruned in r5"


def make_stacked(key, C, H, ch, L, ada, quant, dtype=jnp.bfloat16):
    ks = iter(jax.random.split(key, 256))
    n = lambda *s: (jax.random.normal(next(ks), s, jnp.float32) * 0.02)

    def q(w):
        if quant == "int4":
            return fh.quantize_cols_int4(w)
        if quant:
            return fh.quantize_cols(w)
        return w.astype(dtype), None

    st = {}
    wqkv = [q(n(C, 3 * C)) for _ in range(L)]
    wo = [q(n(C, C)) for _ in range(L)]
    w1 = [q(n(C, 2 * H)) for _ in range(L)]
    w2 = [q(n(H, C)) for _ in range(L)]
    st["wqkv"] = jnp.stack([a for a, _ in wqkv])
    st["wo"] = jnp.stack([a for a, _ in wo])
    st["w1"] = jnp.stack([a for a, _ in w1])
    st["w2"] = jnp.stack([a for a, _ in w2])
    if quant:
        st["wqkv_s"] = jnp.stack([s for _, s in wqkv])
        st["wo_s"] = jnp.stack([s for _, s in wo])
        st["w1_s"] = jnp.stack([s for _, s in w1])
        st["w2_s"] = jnp.stack([s for _, s in w2])
    st["bqkv"] = jnp.stack([n(1, 3 * C) for _ in range(L)])
    st["bo"] = jnp.stack([n(1, C) for _ in range(L)])
    st["b1"] = jnp.stack([n(1, 2 * H) for _ in range(L)])
    st["b2"] = jnp.stack([n(1, C) for _ in range(L)])
    st["n1"] = jnp.stack(
        [jnp.stack([1 + 0.1 * n(C), 0.1 * n(C)]) for _ in range(L)]
    ).astype(dtype)
    st["n2"] = jnp.stack(
        [jnp.stack([1 + 0.1 * n(C), 0.1 * n(C)]) for _ in range(L)]
    ).astype(dtype)
    st["in_w"] = n(ch, C).astype(dtype)
    st["in_b"] = 0.1 * n(C)
    st["f_out_w"] = n(C, ch).astype(dtype)
    st["f_out_b"] = 0.1 * n(ch)
    st["t_w0"] = n(256, C).astype(dtype)
    st["t_b0"] = 0.1 * n(C)
    st["t_w2"] = n(C, C).astype(dtype)
    st["t_b2"] = 0.1 * n(C)
    W = ada * 6 * C + 2 * C
    mc = n(C, W)
    if quant:
        st["modcat_w"], st["modcat_w_s"] = fh.quantize_cols(mc)
    else:
        st["modcat_w"] = mc.astype(dtype)
    st["modcat_b"] = 0.1 * n(W)
    return st


def run_case(C, H, ch, L, ada, R, steps, quant, n_head, groups, iters=3,
             check_parity=False):
    half = R // 2
    key = jax.random.PRNGKey(0)
    stacked = jax.jit(
        lambda k: make_stacked(k, C, H, ch, L, ada, quant))(key)
    jax.block_until_ready(jax.tree.leaves(stacked))

    x0 = jax.random.normal(jax.random.PRNGKey(1), (half, ch), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (steps, half, ch),
                              jnp.float32)
    t_all = jnp.linspace(0.0, 0.95, steps + 1).astype(jnp.float32)
    dt_all = jnp.concatenate([t_all[1:] - t_all[:-1],
                              jnp.zeros((1,), jnp.float32)])
    c_emb = jax.random.normal(jax.random.PRNGKey(3), (R, C),
                              jnp.float32) * 0.02
    kw = dict(num_blocks=L, num_ada=ada, n_head=n_head, groups=groups,
              attention=True, bounded=True)

    @jax.jit
    def run_streamed(stacked, x0, noise, c_emb):
        allmods = fh.em_precompute(stacked, c_emb, t_all,
                                   out_dtype=jnp.bfloat16)
        return fh.fused_em_sample(stacked, x0, noise, allmods, t_all,
                                  dt_all, jnp.float32(4.0),
                                  resident=False, streamed=VARIANT, **kw)

    @jax.jit
    def run_stacked(stacked, x0, noise, c_emb):
        return fh.em_sample_stacked(stacked, x0, noise, None, t_all, dt_all,
                                    jnp.float32(4.0), c_emb=c_emb,
                                    mods_chunks=1, **kw)

    def timeit(fn):
        t0 = time.time()
        out = fn(stacked, x0, noise, c_emb)
        fence = float(jnp.sum(out.astype(jnp.float32)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out = fn(stacked, x0, noise, c_emb)
            fence = float(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.time() - t0)
        return min(ts), compile_s, out

    t_st, c_st, o_st = timeit(run_streamed)
    print(f"  streamed: {t_st/steps*1e3:.3f} ms/net-call "
          f"(total {t_st*1e3:.1f} ms, compile {c_st:.0f}s)", flush=True)
    t_xl, c_xl, o_xl = timeit(run_stacked)
    print(f"  stacked : {t_xl/steps*1e3:.3f} ms/net-call "
          f"(total {t_xl*1e3:.1f} ms, compile {c_xl:.0f}s)", flush=True)
    print(f"  speedup: {t_xl/t_st:.2f}x", flush=True)
    if check_parity:
        a, b = np.asarray(o_st), np.asarray(o_xl)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        print(f"  parity rel err: {rel:.5f}", flush=True)


if __name__ == "__main__":
    if MODE in ("small", "both"):
        for quant in (True, "int4"):
            print(f"small parity case: C=1024 H=1536 L=6 R=64 "
                  f"quant={quant}", flush=True)
            run_case(C=1024, H=1536, ch=32, L=6, ada=2, R=64, steps=8,
                     quant=quant, n_head=8, groups=2, check_parity=True)

    if MODE in ("big", "both"):
        for quant in (True,):
            print(f"14B-head geometry: C=5120 H=7680 L=6 R=256 steps=50 "
                  f"quant={quant}", flush=True)
            run_case(C=5120, H=7680, ch=32, L=6, ada=2, R=256, steps=50,
                     quant=quant, n_head=40, groups=4)

    if MODE == "big4":
        print("14B-head geometry: C=5120 H=7680 L=6 R=256 steps=50 "
              "quant=int4", flush=True)
        run_case(C=5120, H=7680, ch=32, L=6, ada=2, R=256, steps=50,
                 quant="int4", n_head=40, groups=4)
