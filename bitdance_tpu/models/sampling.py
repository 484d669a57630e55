"""Flow-matching SDE/ODE samplers as `lax.scan` loops.

Re-design of modeling/vision_head/sampling_x.py:44-125 (and the ImageNet
copies imagenet_gen/src/sampling{,_parallel}.py): x-prediction rectified
flow, Euler–Maruyama updates with a velocity→score conversion, CFG applied
on velocity, and a final deterministic Euler step of size `last_step_size`.

Everything is shape-static and fp32 on the update math so the whole sampler
stays inside one compiled program (no host round-trips per step).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def time_shift(t: jax.Array, flow_shift: float = 1.0, sigma: float = 1.0) -> jax.Array:
    """(1/s) / ((1/s) + (1/t - 1)**sigma) (sampling_x.py:3-4)."""
    if flow_shift == 1.0 and sigma == 1.0:
        return t
    inv = 1.0 / flow_shift
    return inv / (inv + (1.0 / t - 1.0) ** sigma)


def _velocity_from_cfg(v: jax.Array, cfg: jax.Array, cfg_mult: int) -> jax.Array:
    """uncond + cfg*(cond-uncond); rows ordered [cond; uncond] (sampling_x.py:16-20)."""
    if cfg_mult == 2:
        cond_v, uncond_v = jnp.split(v, 2, axis=0)
        v = uncond_v + cfg * (cond_v - uncond_v)
    return v


def _score_from_velocity(v: jax.Array, x: jax.Array, t: jax.Array) -> jax.Array:
    """Velocity→score for the linear path (sampling_x.py:6-13)."""
    alpha_t, d_alpha_t = t, 1.0
    sigma_t, d_sigma_t = 1.0 - t, -1.0
    ratio = alpha_t / d_alpha_t
    var = sigma_t**2 - ratio * d_sigma_t * sigma_t
    return (ratio * v - x) / var


def _x_pred_to_velocity(out: jax.Array, combined: jax.Array, t: jax.Array) -> jax.Array:
    return (out - combined) / jnp.maximum(1.0 - t, 0.05)


def euler_maruyama(
    net_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    cond: jax.Array,
    key: jax.Array,
    input_dim: int,
    cfg: jax.Array | float = 1.0,
    cfg_mult: int | None = None,
    num_sampling_steps: int = 20,
    last_step_size: float = 0.05,
    flow_shift: float = 1.0,
    x_init: jax.Array | None = None,
    stochastic: bool = True,
) -> jax.Array:
    """Sample latents conditioned on `cond` (sampling_x.py:44-97).

    net_fn(x, t_batch, cond) -> x-prediction, same shape as x.
    cond rows are ordered [cond; uncond] when cfg_mult == 2.
    Returns latents with cond's leading dim // cfg_mult.

    x_init overrides the initial noise draw and stochastic=False drops the
    per-step diffusion noise (drift-only ODE) — both for reproducibility
    and golden-parity testing against the reference sampler.
    """
    if cfg_mult is None:
        assert isinstance(cfg, (int, float)), "traced cfg requires explicit cfg_mult"
        cfg_mult = 2 if cfg > 1.0 else 1
    cfg = jnp.asarray(cfg, jnp.float32)

    x_shape = list(cond.shape)
    x_shape[0] //= cfg_mult
    x_shape[-1] = input_dim

    key, k0 = jax.random.split(key)
    x = (jax.random.normal(k0, tuple(x_shape), jnp.float32)
         if x_init is None else x_init.astype(jnp.float32))

    t_all = jnp.linspace(0.0, 1.0 - last_step_size, num_sampling_steps + 1)
    t_all = time_shift(t_all, flow_shift)
    dts = t_all[1:] - t_all[:-1]
    ts = t_all[:-1]

    bcast = (-1,) + (1,) * (len(x_shape) - 1)

    def _predict_v(x, t):
        combined = jnp.concatenate([x] * cfg_mult, axis=0)
        t_batch = jnp.full((cond.shape[0],), t, jnp.float32)
        out = net_fn(combined, t_batch, cond).astype(jnp.float32)
        v = _x_pred_to_velocity(out, combined, t)
        return _velocity_from_cfg(v, cfg, cfg_mult)

    def step(carry, inp):
        x, key = carry
        t, dt = inp
        key, kn = jax.random.split(key)
        v = _predict_v(x, t)
        score = _score_from_velocity(v, x, t)
        drift = v + (1.0 - t) * score
        x = x + drift * dt
        if stochastic:
            noise_scale = jnp.sqrt(2.0 * (1.0 - t) * dt)
            x = x + noise_scale * jax.random.normal(kn, x.shape, jnp.float32)
        return (x, key), None

    (x, key), _ = jax.lax.scan(step, (x, key), (ts, dts))

    # final deterministic euler step at t = 1 - last_step_size
    t_last = jnp.asarray(1.0 - last_step_size, jnp.float32)
    v = _predict_v(x, t_last)
    x = x + v * last_step_size
    return x


def euler(
    net_fn: Callable,
    cond: jax.Array,
    key: jax.Array,
    input_dim: int,
    cfg: jax.Array | float = 1.0,
    cfg_mult: int = 2,
    num_sampling_steps: int = 50,
    x_init: jax.Array | None = None,
) -> jax.Array:
    """Plain Euler ODE variant (sampling_x.py:100-125)."""
    cfg = jnp.asarray(cfg, jnp.float32)
    x_shape = list(cond.shape)
    x_shape[0] //= cfg_mult
    x_shape[-1] = input_dim
    key, k0 = jax.random.split(key)
    x = (jax.random.normal(k0, tuple(x_shape), jnp.float32)
         if x_init is None else x_init.astype(jnp.float32))
    dt = 1.0 / num_sampling_steps
    ts = jnp.arange(num_sampling_steps, dtype=jnp.float32) * dt

    def step(x, t):
        combined = jnp.concatenate([x] * cfg_mult, axis=0)
        t_batch = jnp.full((cond.shape[0],), t, jnp.float32)
        v = net_fn(combined, t_batch, cond).astype(jnp.float32)
        v = _velocity_from_cfg(v, cfg, cfg_mult)
        return x + v * dt, None

    x, _ = jax.lax.scan(step, x, ts)
    return x
