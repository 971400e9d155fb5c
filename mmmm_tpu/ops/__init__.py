from .attention import segment_attention, decode_attention, set_ring_context
from .rope import rope_cos_sin, apply_rope
from .norm import rms_norm, layer_norm
from .resample import (
    collapse_patch_weight_z,
    variable_patch_embed_3d,
    variable_upsample_3d,
    resample_nd,
)
from .hungarian import hungarian

__all__ = [
    "segment_attention",
    "decode_attention",
    "rope_cos_sin",
    "apply_rope",
    "rms_norm",
    "layer_norm",
    "collapse_patch_weight_z",
    "variable_patch_embed_3d",
    "variable_upsample_3d",
    "resample_nd",
    "hungarian",
]
