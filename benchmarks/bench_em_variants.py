"""Isolate fused-EM-sampler cost components on TPU.

Variants, each timed as 16 chained 50-step samples inside one jit:
  A. old euler_maruyama (per-block fused kernels)
  B. DiffHead._fused_sample equivalent (stack + precompute INSIDE the scan)
  C. fused_em_sample with stacking OUTSIDE the scan (precompute inside —
     inherent, cond changes per AR step)
  D. C but also precompute outside (lower bound: kernel only)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.sampling import euler_maruyama, time_shift
from bitdance_tpu.ops.fused_head import (
    em_precompute,
    fused_em_sample,
    stack_diffnet_params,
)

HIDDEN, Z, P, N2, STEPS, ITERS = 1024, 32, 64, 2, 50, 16


def main():
    head = DiffHead(ch_target=Z, ch_cond=HIDDEN, ch_latent=1024,
                    depth_latent=6, depth_adanln=2, parallel_num=P,
                    use_swiglu=True, dtype=jnp.bfloat16)
    hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((2, P, Z)),
                            jnp.zeros((2, P, HIDDEN)), jax.random.PRNGKey(2))
    net_params = hp["params"]["net"]
    cond0 = jax.random.normal(jax.random.PRNGKey(3), (N2, P, HIDDEN),
                              jnp.bfloat16)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def chain(sample_fn):
        def run(hp_or_stacked, cond0):
            def step(c, i):
                out = sample_fn(hp_or_stacked, c)
                # scalar data dependency chains the iterations
                return c + (1e-6 * jnp.sum(out.astype(jnp.float32))
                            ).astype(c.dtype), None
            c, _ = jax.lax.scan(step, cond0, jnp.arange(ITERS))
            return c
        return jax.jit(run)

    # A: old lax.scan sampler
    def sample_old(hp, cond):
        def net_fn(xx, tt, cc):
            return head.apply(hp, xx, tt, cc,
                              method=lambda m, *a: m.net(*a))
        return euler_maruyama(net_fn, cond, jax.random.PRNGKey(0), Z,
                              cfg=7.5, cfg_mult=2, num_sampling_steps=STEPS)

    # B: fused, everything inside (what DiffHead._fused_sample does)
    def sample_fused_inside(hp, cond):
        return head.apply(hp, cond, jax.random.PRNGKey(0), jnp.float32(7.5),
                          STEPS, cfg_mult=2, method=DiffHead.sample)

    # C/D share pre-stacked weights
    stacked = stack_diffnet_params(net_params, 6, True, jnp.bfloat16)
    t_all = time_shift(jnp.linspace(0.0, 0.95, STEPS + 1), 1.0)
    dt_all = jnp.concatenate([t_all[1:] - t_all[:-1], jnp.zeros((1,))])
    cond_w = net_params["cond_embed"]["kernel"].astype(jnp.float32)
    cond_b = net_params["cond_embed"]["bias"].astype(jnp.float32)

    def kernel_call(stacked, allmods):
        x0 = jax.random.normal(jax.random.PRNGKey(4), (P, Z), jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(5), (STEPS, P, Z),
                                  jnp.float32)
        return fused_em_sample(
            stacked, x0, noise, allmods, t_all, dt_all,
            jnp.float32(7.5), num_blocks=6, num_ada=2, n_head=8, groups=N2,
            attention=True, bounded=True)

    def sample_stack_outside(stacked, cond):
        c_emb = cond.reshape(-1, HIDDEN).astype(jnp.float32) @ cond_w + cond_b
        allmods = em_precompute(stacked, c_emb, t_all)
        out = kernel_call(stacked, allmods)
        return out.reshape(1, P, Z)

    c_emb0 = cond0.reshape(-1, HIDDEN).astype(jnp.float32) @ cond_w + cond_b
    MODS0 = em_precompute(stacked, c_emb0, t_all)

    def sample_all_outside(stacked, cond):
        out = kernel_call(stacked, MODS0)
        return out.reshape(1, P, Z)

    # E: int8 weight-only quantized fused sampler
    head_q = DiffHead(ch_target=Z, ch_cond=HIDDEN, ch_latent=1024,
                      depth_latent=6, depth_adanln=2, parallel_num=P,
                      use_swiglu=True, dtype=jnp.bfloat16,
                      sample_weight_quant=True)

    def sample_fused_quant(hp, cond):
        return head_q.apply(hp, cond, jax.random.PRNGKey(0), jnp.float32(7.5),
                            STEPS, cfg_mult=2, method=DiffHead.sample)

    variants = [
        ("A old scan sampler   ", chain(sample_old), hp),
        ("B fused inside scan  ", chain(sample_fused_inside), hp),
        ("C stack outside      ", chain(sample_stack_outside), stacked),
        ("D kernel only (HOISTED - invalid lower bound)",
         chain(sample_all_outside), stacked),
        ("E fused int8 weights ", chain(sample_fused_quant), hp),
    ]
    for name, fn, arg in variants:
        t0 = time.time()
        out = fn(arg, cond0)
        fence(out)
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t1 = time.time()
            fence(fn(arg, cond0))
            ts.append(time.time() - t1)
        per = min(ts) / ITERS * 1e3
        print(f"{name}: {per:7.2f} ms/sample  (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
