"""Attribute the ImageNet sampling step time: AR backbone vs diffusion head.

Times each component as an isolated chained scan on the chip (same shapes
as the b128 bench) so round-2 optimization targets the real bottleneck.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models.imagenet_ar import (
        IMAGENET_MODELS,
        _forward_cached,
        _init_cache,
        init_ar_params,
        make_head,
    )
    from bitdance_tpu.models.sampling import euler_maruyama

    cfg = IMAGENET_MODELS["BitDance-B"](resolution=256)
    b2 = 256  # batch 128 * cfg_mult 2
    params = init_ar_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    head = make_head(cfg, jnp.bfloat16)
    hp = jax.jit(head.init)(jax.random.PRNGKey(1), jnp.zeros((2, cfg.token_dim)),
                            jnp.zeros((2, cfg.dim)), jax.random.PRNGKey(2))

    def fence(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    # --- backbone: one cached decode step, chained 64x ----------------------
    from bitdance_tpu.models.imagenet_ar import rope_table_2d, patch_center_coords_2d
    freqs = rope_table_2d(
        patch_center_coords_2d(cfg.resolution, cfg.down_size), cfg.head_dim,
        cls_token_num=cfg.prefix_len)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def backbone_chain(params, x0, window):
        cache = _init_cache(cfg, b2, jnp.bfloat16)

        def step(carry, i):
            x, cache = carry
            out, cache = _forward_cached(params, cfg, x, freqs[:1], cache,
                                         jnp.int32(64), False, window=window)
            return (x + 1e-6 * out, cache), None

        (x, _), _ = jax.lax.scan(step, (x0, cache),
                                 jnp.arange(64, dtype=jnp.int32))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(3), (b2, 1, cfg.dim), jnp.bfloat16)
    total = cfg.prefix_len + cfg.num_tokens
    t_backbone = None
    for window in (total, ((total // 2 + 7) // 8) * 8):
        fence(backbone_chain(params, x0, window))
        t0 = time.perf_counter()
        fence(backbone_chain(params, x0, window))
        dt = (time.perf_counter() - t0) / 64
        t_backbone = dt if t_backbone is None else t_backbone
        print(f"backbone decode step (24L, b{b2}, window {window}): "
              f"{dt*1e3:7.2f} ms")

    # --- head: one 100-step EM sample, chained 4x ----------------------------
    @jax.jit
    def head_chain(hp, cond0):
        def step(c, i):
            out = euler_maruyama(
                lambda xx, tt, cc: head.apply(
                    hp, xx, tt, cc, method=lambda m, *a: m.net(*a)),
                c, jax.random.PRNGKey(0), cfg.token_dim, cfg=jnp.float32(4.6),
                cfg_mult=2, num_sampling_steps=100)
            delta = jnp.pad(out, ((0, c.shape[0] - out.shape[0]),
                                  (0, c.shape[1] - out.shape[1])))
            return (c + 1e-6 * delta.astype(c.dtype)), None

        c, _ = jax.lax.scan(step, cond0, jnp.arange(4))
        return c

    cond0 = jax.random.normal(jax.random.PRNGKey(4), (b2, cfg.dim), jnp.bfloat16)
    fence(head_chain(hp, cond0))
    t0 = time.perf_counter()
    fence(head_chain(hp, cond0))
    t_head = (time.perf_counter() - t0) / 4
    print(f"head sample (100 EM steps, b{b2}): {t_head*1e3:7.2f} ms")
    total = t_backbone + t_head
    print(f"per-AR-step estimate: {total*1e3:.2f} ms "
          f"(backbone {100*t_backbone/total:.0f}% / head {100*t_head/total:.0f}%)")


if __name__ == "__main__":
    main()
