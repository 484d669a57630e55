"""Attribute T2I AR-step time: LLM block decode vs diffusion-head sample."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

def main():
    import jax, jax.numpy as jnp
    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.diff_head import DiffHead

    hidden, z, p, n2 = 1024, 32, 64, 2
    cfg = q3.Qwen3Config(vocab_size=4096, hidden_size=hidden,
                         intermediate_size=4096, num_hidden_layers=16,
                         num_attention_heads=16, num_key_value_heads=8,
                         head_dim=64)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=1024,
                    depth_latent=6, depth_adanln=2, parallel_num=p,
                    use_swiglu=True, dtype=jnp.bfloat16)
    hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((2, p, z)),
                            jnp.zeros((2, p, hidden)), jax.random.PRNGKey(2))

    def fence(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    max_len = 4480
    @jax.jit
    def llm_chain(params, x0):
        cache = q3.init_kv_cache(cfg, n2, max_len, jnp.bfloat16)
        kv_start = jnp.zeros((n2,), jnp.int32)
        def step(carry, i):
            x, cache = carry
            pos = jnp.broadcast_to(jnp.arange(p)[None], (n2, p))
            h, cache = q3.qwen3_forward_cached(
                params, cfg, x, pos, cache, jnp.int32(4000), kv_start, False)
            return (x + 1e-6 * h.astype(x.dtype), cache), None
        (x, _), _ = jax.lax.scan(step, (x0, cache), jnp.arange(16))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(3), (n2, p, hidden), jnp.bfloat16)
    fence(llm_chain(params, x0))
    t0 = time.perf_counter(); fence(llm_chain(params, x0))
    t_llm = (time.perf_counter() - t0) / 16
    print(f"LLM 64-token block decode (16L, cache 4.4k): {t_llm*1e3:7.2f} ms")

    @jax.jit
    def head_chain(hp, cond0):
        def step(c, i):
            out = head.apply(hp, c, jax.random.PRNGKey(0), jnp.float32(7.5),
                             50, cfg_mult=2, method=DiffHead.sample)
            pad = jnp.concatenate([out, out], axis=0)
            return c + 1e-6 * jnp.pad(
                pad, ((0,0),(0,0),(0, c.shape[-1]-pad.shape[-1]))).astype(c.dtype), None
        c, _ = jax.lax.scan(step, cond0, jnp.arange(4))
        return c

    cond0 = jax.random.normal(jax.random.PRNGKey(4), (n2, p, hidden), jnp.bfloat16)
    fence(head_chain(hp, cond0))
    t0 = time.perf_counter(); fence(head_chain(hp, cond0))
    t_head = (time.perf_counter() - t0) / 4
    print(f"head sample (50 EM steps, TransEncoder): {t_head*1e3:7.2f} ms")
    tot = t_llm + t_head
    print(f"per-AR-step: {tot*1e3:.1f} ms (llm {100*t_llm/tot:.0f}% / head {100*t_head/tot:.0f}%)")

if __name__ == "__main__":
    main()
