"""Is the streamed EM kernel's 54us/tile caused by strided tile DMAs?

The streamed kernel (ops/fused_head.py::_fused_em_kernel_streamed) streams
weight-column tiles as BlockSpec (1, K, tn) slices of the stacked [L, K, W]
arrays. A (K, tn) block of a row-major [K, W] int8 array is K separate
tn-byte transfers (tn=1280 -> 1.25KB contiguous chunks), which can fall far
off HBM peak. This probe times the SAME tile-streaming matmul grid in two
HBM layouts:

  strided : tiles are (1, K, tn) blocks of [L, K, W]   (kernel today)
  tiled   : tiles are (1, 1, K, tn) blocks of [L, T, K, tn] -- each tile is
            one contiguous 6.5MB region

grid = (S, L, T) mirroring the streamed kernel's (step, block, tile) walk
with revolving double-buffered weight tiles; compute is the real s8 MXU
dot at the 14B head geometry (R=256 rows, K=5120, W=15360, tn=1280).

Per-tile floor: DMA 6.55MB @ ~800GB/s = 8.2us; MXU 256x5120x1280 s8 =
3.36 GOP @ 394 TOP/s = 8.5us. 51 steps x 6 blocks x 12 tiles = 3672 tiles.

MEASURED (r3, one v5e): HYPOTHESIS REFUTED.
  strided : 17.8 us/tile
  tiled   : 16.8 us/tile
The TPU DMA engine handles the (K, tn)-of-[K, W] strided tile fetch at
essentially full rate — pre-tiling the weights is NOT the streamed kernel's
fix. Both sit at ~17us/tile vs the ~10us overlap floor, i.e. even this
minimal kernel pays ~7us/tile of grid-step overhead (or the DMA is not
overlapping the dot at all: 8.2us DMA + 8.5us dot = 16.7 serial). With 192
tiles/net-call the streamed design's floor is then ~3.3 ms/net-call —
WORSE than the XLA stacked sampler's measured 2.10 ms dots — and the VMEM
budget (2 x tn x (3C+H) double-buffered) caps tn at 1280, so the overhead
cannot be amortized with bigger tiles. Conclusion: the sub-block streaming
regime is structurally bounded below by grid overhead; keep routing the
5120-wide head through em_sample_stacked (streamed_em_preferred=False).
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, K, W, L, S = 256, 5120, 15360, 6, 51
TN = 1280
T = W // TN


def kernel(a_ref, w_ref, o_ref, acc_vm, *, tiled):
    t = pl.program_id(2)
    w = w_ref[0, 0] if tiled else w_ref[0]
    y = jax.lax.dot_general(a_ref[...], w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    # fold every tile's result into a resident accumulator so no tile is
    # dead code, then expose it once per grid walk
    acc_vm[...] += jnp.sum(y, axis=1, keepdims=True)

    @pl.when((pl.program_id(0) == S - 1) & (pl.program_id(1) == L - 1)
             & (t == T - 1))
    def _out():
        o_ref[...] = acc_vm[...]


def run(tiled: bool):
    a = jnp.ones((R, K), jnp.int8)
    if tiled:
        wshape, block = (L, T, K, TN), (1, 1, K, TN)
        index_map = lambda s, l, t: (l, t, 0, 0)
    else:
        wshape, block = (L, K, W), (1, K, TN)
        index_map = lambda s, l, t: (l, 0, t)
    w = jnp.ones(wshape, jnp.int8)

    f = pl.pallas_call(
        functools.partial(kernel, tiled=tiled),
        grid=(S, L, T),
        in_specs=[pl.BlockSpec(a.shape, lambda s, l, t: (0, 0)),
                  pl.BlockSpec(block, index_map)],
        out_specs=pl.BlockSpec((R, 1), lambda s, l, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )
    jf = jax.jit(f)
    out = jf(a, w)
    float(jnp.sum(out))  # fence (block_until_ready lies on the tunnel)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jf(a, w)
        float(jnp.sum(out))
        ts.append(time.time() - t0)
    dt = min(ts)
    n_tiles = S * L * T
    print(f"{'tiled  ' if tiled else 'strided'}: {dt*1e3:7.1f} ms total, "
          f"{dt/n_tiles*1e6:6.1f} us/tile")


if __name__ == "__main__":
    run(tiled=False)
    run(tiled=True)
