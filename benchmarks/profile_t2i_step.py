"""Attribute T2I AR-step time: LLM block decode vs diffusion-head sample.

Reports MARGINAL per-iteration cost — (T(2k) - T(k)) / k with iterations
data-chained inside one jit — because each dispatch over the axon tunnel
carries a ~20-30ms fixed cost that otherwise inflates small-k averages.
"""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools


def main():
    import jax, jax.numpy as jnp
    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.diff_head import DiffHead, make_fused_sampler

    hidden, z, p, n2 = 1024, 32, 64, 2
    cfg = q3.Qwen3Config(vocab_size=4096, hidden_size=hidden,
                         intermediate_size=4096, num_hidden_layers=16,
                         num_attention_heads=16, num_key_value_heads=8,
                         head_dim=64)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    def fence(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    def marginal(fn, args, k):
        """(T(2k) - T(k)) / k with a warm cache for both variants."""
        fk = fn(k)
        f2k = fn(2 * k)
        fence(fk(*args)); fence(f2k(*args))            # compile
        ts = {}
        for name, f in (("k", fk), ("2k", f2k)):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                fence(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts[name] = best
        return (ts["2k"] - ts["k"]) / k

    max_len = 4480

    def make_llm(iters):
        @jax.jit
        def llm_chain(params, x0):
            cache = q3.init_kv_cache(cfg, n2, max_len, jnp.bfloat16)
            kv_start = jnp.zeros((n2,), jnp.int32)
            def step(carry, i):
                x, cache = carry
                pos = jnp.broadcast_to(jnp.arange(p)[None], (n2, p))
                h, cache = q3.qwen3_forward_cached(
                    params, cfg, x, pos, cache, jnp.int32(4000), kv_start,
                    False)
                return (x + 1e-6 * h.astype(x.dtype), cache), None
            (x, _), _ = jax.lax.scan(step, (x0, cache), jnp.arange(iters))
            return x
        return llm_chain

    x0 = jax.random.normal(jax.random.PRNGKey(3), (n2, p, hidden), jnp.bfloat16)
    t_llm = marginal(make_llm, (params, x0), 16)
    print(f"LLM 64-token block decode (16L, cache 4.4k): {t_llm*1e3:7.2f} ms")
    qparams = jax.jit(q3.quantize_qwen3_params)(params)
    t_llm_q = marginal(make_llm, (qparams, x0), 16)
    print(f"LLM 64-token block decode (int8 W8A8):       {t_llm_q*1e3:7.2f} ms")

    for quant in (False, True):
        head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=1024,
                        depth_latent=6, depth_adanln=2, parallel_num=p,
                        use_swiglu=True, dtype=jnp.bfloat16,
                        sample_weight_quant=quant)
        hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((2, p, z)),
                                jnp.zeros((2, p, hidden)),
                                jax.random.PRNGKey(2))

        def make_head_chain(iters):
            @jax.jit
            def head_chain(hp, cond0):
                sampler = make_fused_sampler(head, hp)
                def step(c, i):
                    out = sampler(c, jax.random.PRNGKey(0), jnp.float32(7.5),
                                  50, cfg_mult=2)
                    return c + (1e-6 * jnp.sum(out.astype(jnp.float32))
                                ).astype(c.dtype), None
                c, _ = jax.lax.scan(step, cond0, jnp.arange(iters))
                return c
            return head_chain

        cond0 = jax.random.normal(jax.random.PRNGKey(4), (n2, p, hidden),
                                  jnp.bfloat16)
        t_head = marginal(make_head_chain, (hp, cond0), 8)
        tag = "int8" if quant else "bf16"
        print(f"head sample (50 EM steps, {tag}): {t_head*1e3:7.2f} ms")
        tot = t_llm + t_head
        print(f"per-AR-step ({tag}): {tot*1e3:.1f} ms "
              f"(llm {100*t_llm/tot:.0f}% / head {100*t_head/tot:.0f}%)")


if __name__ == "__main__":
    main()
