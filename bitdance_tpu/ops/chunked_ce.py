"""Chunked-vocabulary cross entropy.

Replaces liger-kernel's fused CE (mllm.py:72-74): at the 14B's ~152k vocab,
materializing [N_text, V] fp32 logits costs gigabytes. This computes the CE
with a `lax.scan` over vocabulary chunks — online logsumexp plus a label
gather per chunk — so peak memory is [N, chunk]; the scan body is
rematerialized in the backward pass so the gradient has the same footprint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def chunked_cross_entropy(
    hidden: jax.Array,    # [N, D]
    lm_head: jax.Array,   # [D, V]
    labels: jax.Array,    # [N] int32
    vocab_chunk: int = 8192,
) -> jax.Array:
    """Per-row negative log likelihood [N], fp32.

    Equivalent to -log_softmax(hidden @ lm_head)[labels]; never materializes
    the full logits.
    """
    n, d = hidden.shape
    v = lm_head.shape[1]
    chunk = min(vocab_chunk, v)
    pad = (-v) % chunk
    if pad:
        lm_head = jnp.pad(lm_head, ((0, 0), (0, pad)))
    n_chunks = lm_head.shape[1] // chunk
    # chunk-major weight view for scan: [n_chunks, D, chunk]
    w = jnp.transpose(lm_head.reshape(d, n_chunks, chunk), (1, 0, 2))

    hf = hidden.astype(jnp.float32)
    labels = labels.astype(jnp.int32)

    @jax.checkpoint
    def body(carry, inp):
        m, s, label_logit = carry
        wc, base = inp
        logits = jax.lax.dot_general(
            hf, wc.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, chunk]
        # mask vocab padding
        col = base + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        valid = col < v
        logits = jnp.where(valid, logits, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        # gather the label logit if it falls in this chunk
        in_chunk = (labels >= base) & (labels < base + chunk)
        idx = jnp.clip(labels - base, 0, chunk - 1)
        ll = jnp.take_along_axis(logits, idx[:, None], axis=1)[:, 0]
        label_logit = jnp.where(in_chunk, ll, label_logit)
        return (m_new, s, label_logit), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (m, s, label_logit), _ = jax.lax.scan(body, init, (w, bases))
    logsumexp = m + jnp.log(s)
    return logsumexp - label_logit


def cross_entropy_reference(hidden, lm_head, labels):
    """Direct CE (for tests / small vocabs)."""
    logits = (hidden.astype(jnp.float32) @ lm_head.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                axis=1)[:, 0]
