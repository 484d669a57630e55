"""How much of the ImageNet-256 bench is VAE decode, and does int8 help?

Times the bench.py run_decode program alone (b256, chunk 32, BitDance-B
latent grid) in bf16 vs W8A8 int8 trunk convs. Combined with the recorded
7.87s best for the full b256 pipeline this splits sampling vs decode and
decides the bench.py --vae-int8 default.

MEASURED (r3, one v5e, b256 chunk 32):
  bf16 decode : 2.24 s  (~30% of the ~7.4s b256 pipeline)
  int8 decode : 1.84 s  (1.22x -- matches bench_int8_conv's 1.25x conv rate)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bitdance_tpu.models.tokenizer import VQModel


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)[:, ::64, ::64]))


def main():
    batch, chunk = 256, 32
    lat_hw, zc = 16, 16
    n_chunks = batch // chunk
    dd = dict(z_channels=zc, in_channels=3, out_ch=3, ch=256,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=4)
    grid = jax.random.normal(jax.random.PRNGKey(0),
                             (batch, lat_hw, lat_hw, zc), jnp.bfloat16)

    for label, conv_int8 in (("bf16", False), ("int8", True)):
        ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16, conv_int8=conv_int8)
        ae_params = jax.jit(
            lambda k, z: ae.init(k, z, method=VQModel.decode)
        )(jax.random.PRNGKey(3), jnp.zeros((1, lat_hw, lat_hw, zc)))

        @jax.jit
        def run_decode(ae_params, grid):
            gs = grid.reshape((n_chunks, chunk) + grid.shape[1:])
            imgs = jax.lax.map(
                lambda g: ae.apply(ae_params, g, method=VQModel.decode), gs)
            return imgs.reshape((-1,) + imgs.shape[2:])

        out = run_decode(ae_params, grid)
        fence(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run_decode(ae_params, grid)
            fence(out)
            ts.append(time.time() - t0)
        print(f"{label} decode b{batch}: {min(ts):.2f} s "
              f"({batch / min(ts):.1f} img/s decode-only)")


if __name__ == "__main__":
    main()
