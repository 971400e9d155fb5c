"""CogVLM for causal LM: token embedding, vision splice, LM head, weighted CE.

Equivalent surface to ``CogVLMForCausalLM`` (``modeling_cogvlm.py:629-715``),
restructured for static shapes: each bucketed batch carries images of one
shape, so the vision tokens are spliced with a static-width concatenation at
positions [1, 1+T') (matching ``modeling_cogvlm.py:449-453`` where image
features overwrite the placeholder embeddings right after ``bos``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import CogVLMConfig
from .decoder import init_llm_params, llm_forward
from .vit import init_vit_params, vit_forward

CE_IGNORE_INDEX = -100


def init_cogvlm_params(key, cfg: CogVLMConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "llm": init_llm_params(k1, cfg, dtype),
        "vision": init_vit_params(k2, cfg, dtype),
    }


def splice_vision_embeds(inputs_embeds: jnp.ndarray, vision_embeds: jnp.ndarray) -> jnp.ndarray:
    """Overwrite embeddings [1, 1+T') with vision features (static width)."""
    n = vision_embeds.shape[1]
    return jnp.concatenate(
        [inputs_embeds[:, :1], vision_embeds.astype(inputs_embeds.dtype), inputs_embeds[:, 1 + n :]],
        axis=1,
    )


def cogvlm_forward(
    params: dict,
    cfg: CogVLMConfig,
    input_ids: jnp.ndarray,  # (B, S)
    token_type_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (B, S)
    segments: jnp.ndarray,  # (B, S); 0 = padding
    image: jnp.ndarray | None = None,  # (B, C, D, H, W)
    patch_size: tuple[int, int, int] | None = None,
    pool_size: tuple[int, int, int] | None = None,
    *,
    attn_impl: str = "auto",
    remat: bool = False,
    return_kv: bool = False,
    return_logits: bool = True,
    vis_span: tuple[int, int] | str | None = None,
):
    """Returns (hidden_states, logits_fp32[, kv]) for a full packed sequence.

    ``return_logits=False`` skips the dense (B, S, V) fp32 projection and
    returns ``(hidden, None[, kv])`` — the training step computes the LM loss
    through the fused blockwise CE instead (``ops/fused_ce.py``).

    ``vis_span``: static vision-token span for single-expert routing (see
    ``llm_forward``). ``"auto"`` derives ``(1, 1 + n_vis)`` from the spliced
    vision width — exact under the data layer's layout guarantee
    (``input_builder.prepare_vlm_inputs``: vision-typed tokens are ALWAYS
    [1, 1 + n_img) when an image is present, matching the reference splice
    ``modeling_cogvlm.py:449-453``) — and falls back to the dual masked
    matmuls for text-only batches. Halves expert matmul FLOPs; training
    previously always paid the dual dense path (both experts for every
    token) even though every image bucket satisfies the layout."""
    emb = params["llm"]["embed_tokens"][input_ids]
    if image is not None:
        vis = vit_forward(
            params["vision"], cfg, image, patch_size, pool_size, attn_impl=attn_impl, remat=remat
        )
        emb = splice_vision_embeds(emb, vis)
        if vis_span == "auto":
            vis_span = (1, 1 + vis.shape[1])
    elif vis_span == "auto":
        vis_span = None
    out = llm_forward(
        params["llm"],
        cfg,
        emb,
        token_type_ids,
        position_ids,
        segments,
        attn_impl=attn_impl,
        remat=remat,
        return_kv=return_kv,
        vis_span=vis_span,
    )
    hidden = out[0] if return_kv else out
    from ...ops.quant import qdot

    logits = (
        qdot(hidden, params["llm"]["lm_head"]).astype(jnp.float32)
        if return_logits
        else None
    )
    if return_kv:
        return hidden, logits, out[1]
    return hidden, logits


def weighted_ce_loss(
    logits: jnp.ndarray,  # (B, S, V) fp32
    labels: jnp.ndarray,  # (B, S) already shifted by the data layer
    weight: jnp.ndarray | None = None,  # (B, S) per-token weight
) -> jnp.ndarray:
    """Sample-weighted CE (``modeling_cogvlm.py:610-627``): the weighted sum of
    per-token CE over non-ignored tokens, normalized by the *count* of
    non-ignored tokens (weights scale contributions, not the denominator)."""
    mask = labels != CE_IGNORE_INDEX
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    ce = jnp.where(mask, ce, 0.0)
    denom = jnp.maximum(mask.sum(), 1)
    if weight is None:
        return ce.sum() / denom
    return (ce * weight.astype(jnp.float32)).sum() / denom
