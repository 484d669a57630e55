"""T2I generation benchmark: sec/image for the flagship next-patch pipeline.

Random-init weights (throughput is architecture-bound); the full generation
— two-phase prefill, AR decode scan, 50-step diffusion sampler per window,
batched CFG — runs as one compiled program, with the flash-decode Pallas
kernel active for caches >= 1024 entries.

Round-1 measurements on one v5e (0.7B-class LLM, bf16):
  512px  (1024 tokens, p=16, 64 AR steps x 50 diff steps): 0.75 s/image
  1024px (4096 tokens, p=64, 64 AR steps x 50 diff steps): 3.10 s/image

Usage: python benchmarks/bench_t2i.py [--height 1024] [--parallel 64]
       [--hidden 1024] [--layers 16] [--steps 50] [--images 1]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


class _StubTokenizer:
    def __init__(self, parallel_num):
        self.special = {}
        base = 2000
        toks = (["<|vision_start|>"]
                + [f"<|res_{j}|>" for j in range(1, 257)]
                + [f"<|query_{j}|>" for j in range(1, parallel_num)])
        for i, t in enumerate(toks):
            self.special[t] = base + i

    def encode(self, text):
        return [min(ord(c), 1999) for c in text][:48]

    def convert_tokens_to_ids(self, tok):
        return self.special[tok]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=0, help="0 = square")
    ap.add_argument("--parallel", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    width = args.width or args.height

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.connector import MLPConnector
    from bitdance_tpu.models.diff_head import DiffHead
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.pipelines.t2i import T2IModelBundle, T2IPipeline

    hidden, z, p = args.hidden, 32, args.parallel
    llm_cfg = q3.Qwen3Config(
        vocab_size=4096, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=args.layers, num_attention_heads=hidden // 64,
        num_key_value_heads=max(hidden // 128, 1), head_dim=64)
    llm_params = q3.init_qwen3_params(jax.random.PRNGKey(0), llm_cfg,
                                      jnp.bfloat16)
    dd = dict(z_channels=z, in_channels=3, out_ch=3, ch=128,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2)
    ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16)
    lat = args.height // 16
    ae_params = jax.jit(lambda k, x: ae.init(
        k, x, method=VQModel.decode, noise_rng=jax.random.PRNGKey(9)))(
        jax.random.PRNGKey(1), jnp.zeros((1, lat, width // 16, z), jnp.bfloat16))
    head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=hidden,
                    depth_latent=6, depth_adanln=2, parallel_num=p,
                    use_swiglu=True, P_mean=-0.8, P_std=0.8,
                    dtype=jnp.bfloat16)
    hp = jax.jit(head.init)(jax.random.PRNGKey(2), jnp.zeros((2, p, z)),
                            jnp.zeros((2, p, hidden)), jax.random.PRNGKey(3))
    proj = MLPConnector(out_dim=hidden, dtype=jnp.bfloat16)
    pp = proj.init(jax.random.PRNGKey(4), jnp.zeros((1, z)))

    bundle = T2IModelBundle(
        llm_cfg=llm_cfg, llm_params=llm_params, ae=ae, ae_params=ae_params,
        head=head, head_params=hp, projector=proj, projector_params=pp,
        parallel_num=p, hidden_size=hidden, vae_patch_size=16,
        pe_max_len=4096)
    pipe = T2IPipeline(bundle, tokenizer=_StubTokenizer(p))

    t0 = time.time()
    pipe.generate("warmup prompt", args.height, width, args.steps, args.cfg,
                  args.images, seed=0)
    compile_s = time.time() - t0
    times = []
    for i in range(args.iters):
        t0 = time.time()
        pipe.generate(f"benchmark prompt {i}", args.height, width, args.steps,
                      args.cfg, args.images, seed=i + 1)
        times.append(time.time() - t0)
    best = min(times) / args.images
    num_steps = (args.height // 16) * (width // 16) // p
    print(f"{args.height}x{width} p={p} ({num_steps} AR steps x {args.steps} "
          f"diff steps), llm {args.layers}L/{hidden}d: "
          f"{best:.2f} s/image ({1.0/best:.3f} img/s) "
          f"[compile+first {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
