"""Attention kernel tests: mask semantics, flash-vs-reference parity, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.ops import (
    attention_xla,
    flash_attention,
    masked_attention,
    decode_attention_xla,
    mask_from_ids,
    causal_ids,
    packed_ids_from_segments,
)


def _rand_qkv(key, b, lq, lk, hq, hkv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, lq, hq, d), dtype)
    k = jax.random.normal(kk, (b, lk, hkv, d), dtype)
    v = jax.random.normal(kv, (b, lk, hkv, d), dtype)
    return q, k, v


def test_mask_matches_reference_semantics():
    """(block, doc) ids reproduce flex-attention's composed mask exactly.

    Reference semantics (modeling/utils.py:22-62):
      allowed = (causal OR parallel_block) AND same_document
    """
    sample_lens = [10, 14]
    split_lens = [4, 6, 4, 10]
    attn_modes = ["causal", "parallel", "causal", "parallel"]
    parallel_num = 4
    parallel_causal_num = 2

    block, doc = packed_ids_from_segments(
        sample_lens, split_lens, attn_modes, parallel_num, parallel_causal_num
    )
    got = np.asarray(mask_from_ids(block, doc, block, doc))

    # independent re-derivation of the reference mask_mod
    total = sum(sample_lens)
    seg_ids, local_ids, is_par = [], [], []
    for sid, (l, m) in enumerate(zip(split_lens, attn_modes)):
        seg_ids += [sid] * l
        local_ids += list(range(l))
        is_par += [m == "parallel"] * l
    doc_ids = []
    for i, l in enumerate(sample_lens):
        doc_ids += [i] * l

    want = np.zeros((total, total), bool)
    for qi in range(total):
        for ki in range(total):
            causal = qi >= ki
            pblock = (
                seg_ids[qi] == seg_ids[ki]
                and is_par[qi]
                and local_ids[qi] >= parallel_causal_num
                and local_ids[ki] >= parallel_causal_num
                and (local_ids[qi] - parallel_causal_num) // parallel_num
                == (local_ids[ki] - parallel_causal_num) // parallel_num
            )
            want[qi, ki] = (causal or pblock) and doc_ids[qi] == doc_ids[ki]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dtype", [jnp.float32])
@pytest.mark.parametrize(
    "b,lq,lk,hq,hkv,d",
    [
        (1, 256, 256, 2, 2, 64),
        (2, 300, 300, 4, 2, 64),   # GQA + non-tile-multiple length
        (1, 128, 640, 2, 1, 128),  # cross lengths
    ],
)
def test_flash_matches_xla_causal(b, lq, lk, hq, hkv, d, dtype):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, lq, lk, hq, hkv, d, dtype)
    offset = lk - lq
    qb = jnp.broadcast_to(jnp.arange(lq, dtype=jnp.int32) + offset, (b, lq))
    qd = jnp.zeros((b, lq), jnp.int32)
    kb = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    kd = jnp.zeros((b, lk), jnp.int32)

    mask = jax.vmap(mask_from_ids)(qb, qd, kb, kd)
    want = attention_xla(q, k, v, mask[:, None])
    got = flash_attention(q, k, v, qb, qd, kb, kd, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_packed_parallel_blocks():
    sample_lens = [40, 88]
    split_lens = [8, 32, 24, 64]
    attn_modes = ["causal", "parallel", "causal", "parallel"]
    block, doc = packed_ids_from_segments(sample_lens, split_lens, attn_modes, 16)
    L = sum(sample_lens)
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, L, L, 2, 2, 64)
    qb = block[None]
    qd = doc[None]
    mask = jax.vmap(mask_from_ids)(qb, qd, qb, qd)
    want = attention_xla(q, k, v, mask[:, None])
    got = flash_attention(q, k, v, qb, qd, qb, qd, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_masked_attention_xla_path_equals_flash():
    L = 160
    block, doc = causal_ids(L)
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, L, L, 2, 2, 32)
    ids = (jnp.tile(block[None], (2, 1)), jnp.tile(doc[None], (2, 1)))
    a = masked_attention(q, k, v, ids[0], ids[1], ids[0], ids[1], implementation="xla")
    b_ = flash_attention(q, k, v, ids[0], ids[1], ids[0], ids[1],
                         block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-3)


def test_decode_attention_matches_full():
    """Block decode over a KV cache == full attention limited to valid keys."""
    b, max_len, hq, hkv, d = 2, 96, 4, 2, 32
    valid = jnp.asarray([50, 70], jnp.int32)
    key = jax.random.PRNGKey(3)
    q, kc, vc = _rand_qkv(key, b, 8, max_len, hq, hkv, d)
    got = decode_attention_xla(q, kc, vc, valid)
    for i in range(b):
        n = int(valid[i])
        want = attention_xla(q[i : i + 1], kc[i : i + 1, :n], vc[i : i + 1, :n])
        np.testing.assert_allclose(got[i], want[0], rtol=1e-4, atol=1e-5)


def test_attention_padding_rows_are_zero():
    """Padded q rows (doc -3) attend to nothing and output exactly 0."""
    L = 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, L, L, 1, 1, 32)
    qb = jnp.arange(L, dtype=jnp.int32)[None]
    qd = jnp.where(jnp.arange(L) < 40, 0, -3)[None].astype(jnp.int32)
    kb, kd = qb, jnp.where(jnp.arange(L) < 40, 0, -2)[None].astype(jnp.int32)
    out = flash_attention(q, k, v, qb, qd, kb, kd, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0, 40:]), 0.0)


def test_sparse_flash_matches_dense_packed():
    """Splash-style sparse iteration == dense flash == XLA on a packed
    multi-document mask, with max_live_kv < n_k."""
    from bitdance_tpu.ops.attention import flash_attention_sparse

    sample_lens = [120, 136, 128]
    split_lens = [24, 96, 8, 128, 128]
    attn_modes = ["causal", "parallel", "causal", "parallel", "causal"]
    block, doc = packed_ids_from_segments(sample_lens, split_lens, attn_modes, 16)
    L = sum(sample_lens)
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, L, L, 2, 1, 64)
    qb, qd = block[None], doc[None]
    mask = jax.vmap(mask_from_ids)(qb, qd, qb, qd)
    want = attention_xla(q, k, v, mask[:, None])
    # block 128 -> n_k = 3; docs <= 136 tokens -> at most 2 live kv tiles
    got = flash_attention_sparse(q, k, v, qb, qd, qb, qd, max_live_kv=2,
                                 block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sparse_flash_causal_single_doc():
    """Single causal doc: every prefix tile is live; sparse with
    max_live_kv = n_k must equal dense."""
    from bitdance_tpu.ops.attention import flash_attention_sparse

    b, l, h, d = 2, 384, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), b, l, l, h, h, d)
    qb = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b, l))
    qd = jnp.zeros((b, l), jnp.int32)
    want = flash_attention(q, k, v, qb, qd, qb, qd, block_q=128,
                           block_k=128, interpret=True)
    got = flash_attention_sparse(q, k, v, qb, qd, qb, qd, max_live_kv=3,
                                 block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_kv_tile_map_counts():
    from bitdance_tpu.ops.attention import kv_tile_map

    # two docs of 128 tokens each, causal: tile (q=1) only lives on kv=1
    qb = jnp.arange(256, dtype=jnp.int32)[None]
    qd = jnp.concatenate([jnp.zeros(128, jnp.int32),
                          jnp.ones(128, jnp.int32)])[None]
    tm, cnt = kv_tile_map(qb, qd, qb, qd, 128, 128, 2)
    assert cnt.tolist() == [[1, 1]]
    assert tm[0, 0, 0] == 0 and tm[0, 1, 0] == 1
    # trailing entries repeat the last live tile (no-op DMA)
    assert tm[0, 0, 1] == 0 and tm[0, 1, 1] == 1


@pytest.mark.parametrize(
    "b,lq,hq,hkv,d",
    [
        (1, 256, 2, 2, 64),
        (2, 300, 4, 2, 64),   # GQA + non-tile-multiple length
    ],
)
def test_flash_backward_matches_xla(b, lq, hq, hkv, d):
    """Pallas flash backward (custom VJP) == XLA attention grads, causal."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b, lq, lq, hq, hkv, d,
                        jnp.float32)
    qb = jnp.broadcast_to(jnp.arange(lq, dtype=jnp.int32), (b, lq))
    qd = jnp.zeros((b, lq), jnp.int32)
    w = jax.random.normal(jax.random.PRNGKey(6), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, qb, qd, qb, qd, block_q=128,
                            block_k=128, interpret=True)
        return jnp.sum(o * w)

    def loss_xla(q, k, v):
        mask = jax.vmap(mask_from_ids)(qb, qd, qb, qd)
        return jnp.sum(attention_xla(q, k, v, mask[:, None]) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_flash_backward_packed_docs():
    """Gradients under a packed multi-document parallel-block mask."""
    sample_lens = [40, 88]
    split_lens = [8, 32, 24, 64]
    attn_modes = ["causal", "parallel", "causal", "parallel"]
    block, doc = packed_ids_from_segments(sample_lens, split_lens,
                                          attn_modes, 16)
    L = sum(sample_lens)
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, L, L, 2, 2, 64)
    qb, qd = block[None], doc[None]
    w = jax.random.normal(jax.random.PRNGKey(8), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, qb, qd, qb, qd, block_q=128,
                            block_k=128, interpret=True)
        return jnp.sum(o * w)

    def loss_xla(q, k, v):
        mask = jax.vmap(mask_from_ids)(qb, qd, qb, qd)
        return jnp.sum(attention_xla(q, k, v, mask[:, None]) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_sparse_flash_backward_matches_xla():
    """The sparse-iteration forward differentiates via the dense backward
    kernels; grads must match the XLA reference on a packed mask."""
    from bitdance_tpu.ops.attention import flash_attention_sparse

    sample_lens = [128, 128, 128]
    split_lens = [16, 112, 16, 112, 16, 112]
    attn_modes = ["causal", "parallel"] * 3
    block, doc = packed_ids_from_segments(sample_lens, split_lens,
                                          attn_modes, 16)
    L = sum(sample_lens)
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, L, L, 2, 1, 64)
    qb, qd = block[None], doc[None]
    w = jax.random.normal(jax.random.PRNGKey(10), q.shape, jnp.float32)

    def loss_sparse(q, k, v):
        o = flash_attention_sparse(q, k, v, qb, qd, qb, qd, max_live_kv=2,
                                   block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * w)

    def loss_xla(q, k, v):
        mask = jax.vmap(mask_from_ids)(qb, qd, qb, qd)
        return jnp.sum(attention_xla(q, k, v, mask[:, None]) * w)

    got = jax.grad(loss_sparse, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")
