"""Where do the stacked sampler's 3.9 ms/net-call go?

Times the pieces of one net_forward at the 14B head geometry (C=5120,
H=7680, R=256, int8 W8A8) in isolation, each as a k-vs-2k marginal with
data-chained iterations (the axon tunnel's ~20-30ms dispatch cost and the
lack of a real block_until_ready fence make naive timing useless):

  dots-only   : the 4 matmuls of one block, s8xs8->s32, weights cycled
                through 6 buffers like the real scan
  quant-only  : the per-row activation quantize (abs-max/round/clip) alone
  block-glue  : full _block_body_xla (dots + LN/mods/attention/silu glue)

Roofline for the 4 dots PER BLOCK: 222MB weights -> 0.27 ms BW; 114 GFLOP
(int8) -> 0.29 ms compute. Per net-call (6 blocks): 1.33GB -> 1.63 ms BW,
687 GFLOP -> 1.74 ms MXU — the head is simultaneously bandwidth- and
COMPUTE-bound, so the floor is ~1.74 ms/net-call (plus the inherent 0.48
ms modcat matmul) and batching more images does NOT amortize it. At 50
steps x 64 AR steps the head is 1424 TFLOP/image: the flagship compute
floor is ~3.6 s/image at 100% int8 MFU.

MEASURED (r3, one v5e, vs the real stacked sampler's 3.92 ms/net-call):
  dots-only  : 2.10 ms/net-call   (the mmq matmuls are already ~1.17x of
                                   the weight-streaming roofline — NOT the
                                   gap)
  quant-only : 0.08 ms/net-call   (activation row-quantize is negligible)
  full-block : 2.59 ms/net-call   (LN/attention/silu glue adds ~0.5 ms)
  stacked-noprec: 3.41 ms/net-call (em_sample_stacked with allmods
                                    precomputed OUTSIDE the jit)

Full decomposition of the real sampler's 3.92 ms/net-call
(bench_streamed_head, mods_chunks=1, precompute inside the jit):
  2.10 the 24 W8A8 matmuls      (floor 1.8 — weight streaming)
  0.49 block-body glue          (LN / 64-token attention / silu)
  0.82 scan-internal overhead   (per-block dynamic_slice of the
                                 [R, A*6C+2C] mods row with a traced group
                                 index, per-step allmods[s] gathers from
                                 the [S, R, 71680] bf16 buffer, EM update,
                                 in/f_out projections)
  0.51 em_precompute            (modcat matmul + 1.9GB allmods buffer
                                 write+read)
r3 experiment record (do NOT redo):
  - per-ada-group scans over statically sliced weights: 3.41 -> 8.0
    ms/net-call REGRESSION — XLA does not hoist the loop-invariant weight
    slices out of the step scan and recopies ~1.33GB per net call.
  - allmods/t/dt/noise as step-scan xs instead of traced-index gathers:
    neutral (3.395 vs 3.409). Kept (cleaner prefetch semantics).
  - bf16 elementwise glue (glue_dtype): 3.52 -> 3.45, ~2%. Kept (also
    halves activation residency); flagship 7.35 -> 7.32 from this.
  - block+mods probe: the mods dynamic-slice machinery is FREE (2.72 vs
    2.92 full-block, within run noise). The remaining ~0.6 ms/net-call
    above the block bodies is inter-call glue/pipeline-refill, not data
    movement.
  - em_precompute (0.51 ms) is INHERENT model FLOPs (188 GFLOP modcat
    matmul per net call, already at int8 peak) — not optimizable.
  - scan unroll>1 on the block scan: regression (4.25/7.40 vs 3.92).
  - 4-image batch: runtime-OOM even with 96MB mods chunks; 3-image
    measured WORSE end-to-end (7.94 vs 7.35). The head is ~equally
    MXU-bound, so batching caps at ~-25% on the dots anyway.
Remaining levers, by ceiling: (1) fix the streamed Pallas kernel's tile
pipeline (measured 10.35 vs its ~2.2 traffic model — ~54us/tile vs ~10us;
each compile is ~134s through the tunnel, budget accordingly); (2) accept
~3.9 ms/net-call as the XLA ceiling — the floor is 1.74 MXU + 0.48
modcat + ~0.5 serial VPU glue ~= 2.8 ms.

r4 RESOLUTION: lever (1) landed as a REWRITE, not a fix — the per-tile
cost was the Pallas grid machinery itself (27 index maps + revolving-
buffer bookkeeping per grid step; pre-tiling the weight DMAs to be
contiguous moved nothing, see probe_tile_dma.py), so the grid-tiled
kernel was replaced by _fused_em_kernel_streamed_dma: (step, block) grid,
weights in ANY/HBM, statically unrolled tile loop with explicit
double-buffered async copies. Measured (bench_streamed_head, R=256,
em_precompute included): int8 3.353 ms/net-call, int4 3.187 — vs
stacked XLA 4.627 / 6.706 and the ~2.8 floor. The residual ~0.4 ms is
the serial VPU glue window (attention + 2 lnmod+quant + GLU, ~80us/block)
during which the MXU idles; the DMA stream is fully hidden. End-to-end
(bench_t2i replay): 28L int8 6.80 -> 6.11 s/image (2 img) / 5.74 (3 img,
MFU 0.699); 40L int4 full depth 9.75 -> 7.05 (2 img) / 6.93 (3 img).
3-image batches WIN with this kernel (DMA amortizes; the stacked sampler
measured worse at 3 in r3). Next ceiling, if ever needed: overlap the
glue with the previous stage's tail dots (software-pipeline the block
body itself) — bounded by ~0.4 ms/net-call ~= 0.6 s/image at 28L/2img.
r4 follow-up: BITDANCE_DMA_SLOTS=4 (4-slot scratch, 3-deep issue chain,
tn 2560->1280) measured 3.304 vs 3.353 ms/net-call at R=256 int8 — the
glue-window DMA idle is real but small, and at R=384 (the 3-image ladder
leaders) the mods double-buffers leave no VMEM for a deeper stream at a
usable tile, so the default stays 2 slots. 3.304 - 0.51 precompute =
2.79 ms: the kernel sits AT the 2.8 ms floor; further gains must come
from shrinking the floor's glue term itself.

r5 resolution on the ~0.4 ms glue-overlap lever: NOT attempted, by
decision. (a) The MFU gates it would serve are already met with the r4
kernel (full-depth 0.61, 28L 0.69, driver-capturable); (b) true overlap
needs either row-group skewing (doubles weight DMA traffic — the stream
is already at the 1.63 ms BW component of the floor, so this REGRESSES)
or per-tile glue start, which requires head-major qkv/w1 tiling whose
widths (multiples of 3*hd=384) do not divide the other stages' 5120/7680
columns — a per-stage-tile-size kernel rewrite; (c) any kernel edit
invalidates every cached 14B program via HLO source-location metadata
(~20 min cold recompile per family through the tunnel), an unacceptable
risk against the driver's bench budget in the final round. The grid-tiled
r3 kernel generation itself was pruned this round (this docstring is its
measurement record of note).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bitdance_tpu.ops import fused_head as fh

C, H, R, L = 5120, 7680, 256, 6


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def marginal_ms(make_fn, args, k=8):
    fk, f2k = make_fn(k), make_fn(2 * k)
    fence(fk(*args)); fence(f2k(*args))
    ts = {}
    for name, f in (("k", fk), ("2k", f2k)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return (ts["2k"] - ts["k"]) / k * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    n = lambda *s: jax.random.normal(next(ks), s, jnp.float32) * 0.02

    # eager weight construction (a jitted builder leaks `n`'s intermediate
    # tracers into the later eagerly-built nrm/mods constants)
    def mk():
        qc = jax.jit(fh.quantize_cols)
        qkv = [qc(n(C, 3 * C)) for _ in range(L)]
        wo = [qc(n(C, C)) for _ in range(L)]
        w1 = [qc(n(C, 2 * H)) for _ in range(L)]
        w2 = [qc(n(H, C)) for _ in range(L)]
        stk = lambda t: (jnp.stack([a for a, _ in t]),
                         jnp.stack([s for _, s in t]))
        return dict(zip(
            ["wqkv", "wqkv_s", "wo", "wo_s", "w1", "w1_s", "w2", "w2_s"],
            [x for t in (qkv, wo, w1, w2) for x in stk(t)]))

    w = mk()
    jax.block_until_ready(jax.tree.leaves(w))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (R, C), jnp.float32)

    # --- dots only: one block's 4 matmuls, blocks cycled like the scan ----
    def make_dots(iters):
        @jax.jit
        def run(w, x0):
            def block(h, bw):
                qkv = fh._mmq(h, bw["wqkv"], bw["wqkv_s"])     # [R, 3C]
                o = fh._mmq(qkv[:, :C], bw["wo"], bw["wo_s"])  # [R, C]
                h12 = fh._mmq(h + o, bw["w1"], bw["w1_s"])     # [R, 2H]
                mlp = fh._mmq(h12[:, :H], bw["w2"], bw["w2_s"])
                return h + 1e-6 * mlp, None

            def step(h, _):
                h, _ = jax.lax.scan(block, h, w)
                return h, None

            h, _ = jax.lax.scan(step, x0, jnp.arange(iters))
            return h
        return lambda *a: run(*a)

    # --- activation quantize only (24 per net-call in the real block) -----
    def make_quant(iters):
        @jax.jit
        def run(w, x0):
            def step(h, _):
                for _ in range(4 * L):
                    sa = jnp.maximum(
                        jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0,
                        1e-12)
                    q = jnp.clip(jnp.round(h / sa), -127, 127) \
                        .astype(jnp.int8)
                    h = h + 1e-6 * q.astype(jnp.float32) * sa
                return h, None

            h, _ = jax.lax.scan(step, x0, jnp.arange(iters))
            return h
        return lambda *a: run(*a)

    # --- full block body (dots + LN/mods/attention/silu glue) -------------
    mods = jax.random.normal(jax.random.PRNGKey(2), (R, 6 * C), jnp.float32)
    nrm = jnp.stack([1 + 0.1 * n(C), 0.1 * n(C)])

    def make_block(iters):
        @jax.jit
        def run(w, x0):
            def block(h, bw):
                attn_w = (nrm, bw["wqkv"], jnp.zeros((3 * C,), jnp.float32),
                          bw["wo"], jnp.zeros((C,), jnp.float32),
                          bw["wqkv_s"], bw["wo_s"])
                h = fh._block_body_xla(
                    h, mods, attn_w, nrm, bw["w1"],
                    jnp.zeros((2 * H,), jnp.float32), bw["w2"],
                    jnp.zeros((C,), jnp.float32), n_head=40, groups=4,
                    eps=1e-6, w1_s=bw["w1_s"], w2_s=bw["w2_s"])
                return h, None

            def step(h, _):
                h, _ = jax.lax.scan(block, h, w)
                return h * (1.0 / (1.0 + 1e-9)), None

            h, _ = jax.lax.scan(step, x0, jnp.arange(iters))
            return h
        return lambda *a: run(*a)

    import os

    # BITDANCE_PROBE selects a subset: all | parts | blockmods | noprec
    probe = os.environ.get("BITDANCE_PROBE", "all")

    if probe in ("all", "parts"):
        dots = marginal_ms(make_dots, (w, x0))
        print(f"dots-only  (6 blocks x 4 mmq): {dots:.3f} ms/net-call",
              flush=True)
        qt = marginal_ms(make_quant, (w, x0))
        print(f"quant-only (24 row-quantizes): {qt:.3f} ms/net-call",
              flush=True)
        blk = marginal_ms(make_block, (w, x0))
        print(f"full-block (6 x block_body)  : {blk:.3f} ms/net-call",
              flush=True)

    # --- full block + REAL mods machinery (per-step xs row + per-block ----
    # dynamic_slice with a traced group index) — isolates the mods
    # selection cost from the em glue: (this - full-block) = mods cost,
    # (stacked-noprec - this) = em-glue/in-out-proj cost
    W_mods = 2 * 6 * C + 2 * C
    allmods50 = jax.random.normal(jax.random.PRNGKey(11), (8, R, W_mods),
                                  jnp.bfloat16) * 0.02

    def make_blockmods(iters):
        @jax.jit
        def run(w, x0, allmods50):
            idxs = jnp.arange(L, dtype=jnp.int32)

            def step(h, mods_row):
                def block(h, bw_i):
                    bw, i = bw_i
                    g = i // 3
                    m = jax.lax.dynamic_slice_in_dim(
                        mods_row, g * 6 * C, 6 * C, axis=1
                    ).astype(jnp.float32)
                    attn_w = (nrm, bw["wqkv"],
                              jnp.zeros((3 * C,), jnp.float32),
                              bw["wo"], jnp.zeros((C,), jnp.float32),
                              bw["wqkv_s"], bw["wo_s"])
                    h = fh._block_body_xla(
                        h, m, attn_w, nrm, bw["w1"],
                        jnp.zeros((2 * H,), jnp.float32), bw["w2"],
                        jnp.zeros((C,), jnp.float32), n_head=40, groups=4,
                        eps=1e-6, w1_s=bw["w1_s"], w2_s=bw["w2_s"])
                    return h, None

                h, _ = jax.lax.scan(block, h, (w, idxs))
                return h * (1.0 / (1.0 + 1e-9)), None

            rows = jnp.tile(allmods50, (-(-iters // 8), 1, 1))[:iters]
            h, _ = jax.lax.scan(step, x0, rows)
            return h
        return lambda *a: run(*a)

    if probe in ("all", "blockmods"):
        bm = marginal_ms(make_blockmods, (w, x0, allmods50))
        print(f"block+mods (dyn-slice + xs row): {bm:.3f} ms/net-call",
              flush=True)

    # --- the real sampler, precompute hoisted OUT of the jit --------------
    # isolates em_sample_stacked's sampling scan (mods dynamic-slicing,
    # allmods[s] gathers, EM glue) from the em_precompute cost that
    # bench_streamed_head's 3.92 ms/net-call figure includes
    if probe not in ("all", "noprec"):
        return
    from benchmarks.bench_streamed_head import make_stacked

    steps, ch = 50, 32
    stacked = jax.jit(lambda k: make_stacked(
        k, C, H, ch, L, 2, True))(jax.random.PRNGKey(7))
    jax.block_until_ready(jax.tree.leaves(stacked))
    half = R // 2
    sx0 = jax.random.normal(jax.random.PRNGKey(8), (half, ch), jnp.float32)
    nz = jax.random.normal(jax.random.PRNGKey(9), (steps, half, ch),
                           jnp.float32)
    t_all = jnp.linspace(0.0, 0.95, steps + 1).astype(jnp.float32)
    dt_all = jnp.concatenate([t_all[1:] - t_all[:-1],
                              jnp.zeros((1,), jnp.float32)])
    c_emb = jax.random.normal(jax.random.PRNGKey(10), (R, C),
                              jnp.float32) * 0.02
    allmods = jax.jit(fh.em_precompute)(stacked, c_emb, t_all)
    jax.block_until_ready(allmods)

    for glue in (jnp.float32, jnp.bfloat16):
        @jax.jit
        def run_noprec(stacked, sx0, nz, allmods, glue=glue):
            return fh.em_sample_stacked(
                stacked, sx0, nz, allmods, t_all, dt_all, jnp.float32(4.0),
                num_blocks=L, num_ada=2, n_head=40, groups=4,
                attention=True, bounded=True, glue_dtype=glue)

        fence(run_noprec(stacked, sx0, nz, allmods))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run_noprec(stacked, sx0, nz, allmods))
            best = min(best, time.perf_counter() - t0)
        print(f"stacked-noprec (50-step scan, glue={jnp.dtype(glue).name}): "
              f"{best / steps * 1e3:.3f} ms/net-call", flush=True)


if __name__ == "__main__":
    main()
