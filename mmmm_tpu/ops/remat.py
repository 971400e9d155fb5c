"""Rematerialization policies for the layer scans.

``remat=True`` recomputes everything (minimum memory); ``remat="dots"`` saves
matmul outputs and recomputes only elementwise ops (can exceed HBM at scale);
``remat="attn"`` saves only tensors tagged ``checkpoint_name(..., "attn_out")``
— the attention context per layer (B*S*C, tiny) — so the backward pass never
re-runs the flash forward kernel while everything else recomputes.
"""
from __future__ import annotations

import jax


def remat_policy(remat):
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if remat == "attn":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    return None  # full recompute
