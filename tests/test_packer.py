"""Greedy stream packer tests (yaml packing budgets)."""

import numpy as np

from bitdance_tpu.data.packing import GreedyPacker, T2ISample, sample_token_len


def _sample(n_text, hw, p=4, z=8):
    rng = np.random.default_rng(n_text + hw)
    h = int(np.sqrt(hw))
    return T2ISample(
        text_ids=rng.integers(1, 100, n_text),
        image_latents=np.sign(rng.normal(size=(hw, z))).astype(np.float32),
        latent_h=h, latent_w=hw // h,
        vision_start_id=300, res_h_id=310, res_w_id=311,
        query_ids=np.arange(400, 400 + p - 1),
    )


def test_token_len():
    s = _sample(10, 16, p=4)
    assert sample_token_len(s, 4) == 10 + 3 + 3 + 16


def test_packer_emits_on_budget():
    packer = GreedyPacker(parallel_num=4, expected_num_tokens=100,
                          max_num_tokens=120, max_num_tokens_per_sample=80)
    emitted = []
    for _ in range(10):
        out = packer.add(_sample(10, 16))  # 32 tokens each
        if out:
            emitted.append(out)
    assert emitted, "packer never emitted"
    for batch in emitted:
        total = sum(sample_token_len(s, 4) for s in batch)
        assert total <= 120 - 1  # trash-slot budget
        assert total >= 64      # reasonably full


def test_packer_rejects_oversized():
    packer = GreedyPacker(parallel_num=4, expected_num_tokens=100,
                          max_num_tokens=120, max_num_tokens_per_sample=30)
    assert packer.add(_sample(10, 64)) is None  # 80 tokens > 30
    assert len(packer.buffer) == 0


def test_packer_flush_returns_remainder():
    packer = GreedyPacker(parallel_num=4, expected_num_tokens=1000,
                          max_num_tokens=1200)
    packer.add(_sample(10, 16))
    packer.add(_sample(12, 16))
    rest = packer.flush()
    assert len(rest) == 2
    assert packer.buffer == []


def test_packer_greedy_fit_keeps_overflow_in_buffer():
    packer = GreedyPacker(parallel_num=4, expected_num_tokens=60,
                          max_num_tokens=70, max_num_tokens_per_sample=60)
    packer.add(_sample(5, 16))    # 27
    batch = packer.add(_sample(30, 16))  # 52 -> total 79 >= 60 -> emit
    assert batch is not None
    emitted_total = sum(sample_token_len(s, 4) for s in batch)
    assert emitted_total <= 69
    # the sample that didn't fit stays buffered
    assert len(packer.buffer) + len(batch) == 2
