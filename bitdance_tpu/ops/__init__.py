from bitdance_tpu.ops.norms import rms_norm, layer_norm, group_norm, swish
from bitdance_tpu.ops.rotary import (
    rope_table_1d,
    apply_rope_half,
    rope_table_2d,
    apply_rope_paired,
    patch_center_coords_2d,
    sincos_1d_table,
    pos_embed_2d,
)
from bitdance_tpu.ops.quantize import (
    sign_quantize,
    sign_quantize_ste,
    bits_to_indices,
    indices_to_bits,
    indices_to_codes,
    latents_to_indices,
    flip_bits_uniform_prob,
)
from bitdance_tpu.ops.attention import (
    attention_xla,
    flash_attention,
    flash_attention_sparse,
    kv_tile_map,
    masked_attention,
    decode_attention_xla,
    mask_from_ids,
    causal_ids,
    packed_ids_from_segments,
)
from bitdance_tpu.ops.decode_attention import (
    decode_attention_pallas,
    windowed_decode_attention,
)
from bitdance_tpu.ops.token_sampling import (
    sample_tokens,
    top_k_filter,
    top_p_filter,
)
