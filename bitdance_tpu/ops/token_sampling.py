"""Categorical token sampling: temperature + top-k/top-p filtering.

Equivalent of modeling/utils.py:64-124 (top_k_top_p_filtering +
sample_codebook), as pure jax functions usable inside jit/scan (static k,
traced p). Used for text spans and the 'standard' vision head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -1e30


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits per row (static k)."""
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, FILTER_VALUE, logits)


def top_p_filter(logits: jax.Array, p: float,
                 min_tokens_to_keep: int = 1) -> jax.Array:
    """Nucleus filtering: drop the tail beyond cumulative prob p.

    Matches the reference's shift-by-one semantics (utils.py:77-88): the
    first token crossing the threshold is kept.
    """
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # shift right: keep the first token that crosses p
    remove_sorted = cum > p
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1)
    if min_tokens_to_keep > 1:
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
    # threshold logit = smallest kept sorted logit
    kept = jnp.where(remove_sorted, -jnp.inf, sorted_logits)
    threshold = jnp.min(jnp.where(jnp.isfinite(kept), kept, jnp.inf),
                        axis=-1, keepdims=True)
    return jnp.where(logits < threshold, FILTER_VALUE, logits)


def sample_tokens(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    do_sample: bool = True,
) -> jax.Array:
    """Temperature + filters + categorical draw (utils.py:93-124)."""
    logits = logits / max(temperature, 1e-5)
    if top_k > 0:
        logits = top_k_filter(logits, top_k)
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    if do_sample:
        return jax.random.categorical(key, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)
