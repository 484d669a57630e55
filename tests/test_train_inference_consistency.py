"""Train/inference consistency: the packed training batch must condition
exactly like the generation pipeline decodes.

In generation (pipelines/t2i.py), the hidden states of window i-1 — starting
with [res_w, query_1..query_{p-1}] — condition the diffusion of image window
i. The packing builder (data/packing.py) must place vision_loss_indexes at
those same positions, with labels equal to window i's tokens, and give both
windows the same attention-block structure the decode path sees.
"""

import jax.numpy as jnp
import numpy as np

from bitdance_tpu.data.packing import T2ISample, pack_t2i_batch
from bitdance_tpu.ops.rotary import sincos_1d_table


def _sample(n_text=5, h=4, w=4, p=4, z=8):
    rng = np.random.default_rng(0)
    return T2ISample(
        text_ids=rng.integers(1, 100, n_text),
        image_latents=np.sign(rng.normal(size=(h * w, z))).astype(np.float32),
        latent_h=h, latent_w=w,
        vision_start_id=300, res_h_id=301 + h, res_w_id=301 + w,
        query_ids=np.arange(400, 400 + p - 1),
        text_loss=False,
    )


def test_loss_positions_are_previous_window():
    p = 4
    s = _sample(p=p)
    table = np.asarray(sincos_1d_table(8, 16))
    raw = pack_t2i_batch([s], p, 64, table)

    n_text = len(s.text_ids)
    hw = s.image_latents.shape[0]
    # sequence layout: [text, vision_start, res_h, res_w, q1..q3, img 0..15]
    first_window_start = n_text + 2           # res_w position
    img_start = n_text + 2 + p                # first image token position

    vli = raw["vision_loss_indexes"][: hw]
    # conditioning position for image token j is (first image window shifted
    # back by one window): res_w+queries for window 0, image window i-1 after
    want = np.arange(hw) + first_window_start
    np.testing.assert_array_equal(vli, want)

    # labels are the image tokens themselves, in order
    np.testing.assert_array_equal(raw["vision_label_indexes"][: hw],
                                  np.arange(hw))

    # conditioning for image token j sits exactly one attention window
    # before the token (strictly causal across windows)
    blocks = raw["block_ids"]
    for j in range(hw):
        assert blocks[vli[j]] == blocks[img_start + j] - 1
    # window structure: [res_w,q1..q3] is one block; image windows of p
    w0 = blocks[first_window_start: first_window_start + p]
    assert (w0 == w0[0]).all()
    for i in range(hw // p):
        wi = blocks[img_start + i * p: img_start + (i + 1) * p]
        assert (wi == wi[0]).all()
        assert wi[0] == w0[0] + 1 + i  # consecutive windows


def test_first_window_conditions_first_image_tokens():
    """Window 0 ([res_w, queries]) conditions image tokens 0..p-1 — matching
    the pipeline's prefill pass 2 (pipelines/t2i.py generate_tokens)."""
    p = 4
    s = _sample(p=p)
    table = np.asarray(sincos_1d_table(8, 16))
    raw = pack_t2i_batch([s], p, 64, table)
    n_text = len(s.text_ids)
    # the first p loss positions are exactly [res_w, q1, q2, q3]
    np.testing.assert_array_equal(
        raw["vision_loss_indexes"][:p],
        np.asarray([n_text + 2, n_text + 3, n_text + 4, n_text + 5]))
    np.testing.assert_array_equal(raw["vision_label_indexes"][:p],
                                  np.arange(p))


def test_pos_embed_matches_pipeline_raster():
    """The head conditioning pos-embeds in the packed batch equal the
    pipeline's ps-raster table rows for the same image geometry."""
    from bitdance_tpu.ops.rotary import pos_embed_2d

    p, h, w = 4, 4, 4
    s = _sample(p=p, h=h, w=w)
    table = np.asarray(sincos_1d_table(8, 16))
    raw = pack_t2i_batch([s], p, 64, table)
    pe = np.asarray(pos_embed_2d(jnp.asarray(table), h, w,
                                 ps=int(np.sqrt(p))))
    hw = h * w
    np.testing.assert_allclose(raw["vision_pos_embed"][:hw], pe, rtol=1e-6)
    np.testing.assert_allclose(raw["vision_input_pos_embed"][:hw], pe,
                               rtol=1e-6)
