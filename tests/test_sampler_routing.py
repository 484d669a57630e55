"""Sampler dispatch routing at the serving geometries (r4 kernel flip).

Pins which sampler implementation each head geometry routes to — the
decision that round 3 got wrong-way-round is now measurement-backed
(streamed_em_preferred docstring) and must not silently flip back:

  - narrow heads (imagenet 768, 0.7B-class 1024): per-block weights fit
    VMEM -> fused_net/resident kernel family
  - the 5120-wide 14B head (int8/int4/bf16): manual-DMA streamed kernel
  - BITDANCE_STREAMED_EM=0 forces the stacked XLA sampler
  - the r3 grid-tiled kernel only via =force where dma is infeasible
"""

import pytest

from bitdance_tpu.ops.fused_head import (
    fused_net_available,
    streamed_dma_available,
    streamed_em_preferred,
)


@pytest.mark.parametrize("rows", [128, 256, 384])
@pytest.mark.parametrize("itemsize", [0.5, 1, 2])
def test_14b_head_prefers_dma_kernel(rows, itemsize, monkeypatch):
    monkeypatch.delenv("BITDANCE_STREAMED_EM", raising=False)
    assert not fused_net_available(5120, rows, attention=True)
    assert streamed_dma_available(5120, rows, True, 7680, itemsize)
    assert streamed_em_preferred(5120, rows, True, 7680, itemsize)


def test_narrow_heads_stay_on_resident_family():
    # imagenet (768) and 0.7B-class (1024) heads: per-block fits VMEM
    assert fused_net_available(768, 512, attention=False)
    assert fused_net_available(1024, 128, attention=True)


def test_env_zero_forces_stacked(monkeypatch):
    monkeypatch.setenv("BITDANCE_STREAMED_EM", "0")
    assert not streamed_em_preferred(5120, 256, True, 7680, 1)


def test_env_whitelist(monkeypatch):
    """BITDANCE_STREAMED_EM accepts only ''/'1'/'0'; legacy/typo values
    ("force", "yes") raise instead of silently routing (r4 advisor)."""
    monkeypatch.setenv("BITDANCE_STREAMED_EM", "1")
    assert streamed_em_preferred(5120, 256, True, 7680, 1)
    # non-attention head: the streamed kernel does not apply
    assert not streamed_em_preferred(5120, 256, False, 7680, 1)
    for bad in ("force", "yes", "2"):
        monkeypatch.setenv("BITDANCE_STREAMED_EM", bad)
        with pytest.raises(ValueError):
            streamed_em_preferred(5120, 256, True, 7680, 1)
