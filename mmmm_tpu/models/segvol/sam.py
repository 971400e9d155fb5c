"""Sam / InstanceSam forward passes over fixed-size target axes.

Equivalent of ``mmmm/models/segvol/modeling/sam.py:23-95,394-432``. The
reference loops Python lists of per-sample prompts; here every batch carries a
padded (B, N_targets) prompt tensor plus a validity mask, and the mask decoder
is vmapped over targets and batch — one static program per bucket, no host
loops. Padded targets produce garbage masks that the loss masks out.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.resample import trilinear_resize
from .config import SamConfig
from .decoder import (
    dense_pe,
    init_mask_decoder_params,
    init_prompt_encoder_params,
    mask_decoder_forward,
)
from .encoder import encoder_forward, init_encoder_params


@dataclasses.dataclass
class InstanceSamOutput:
    """All arrays carry (B, N_targets, ...) axes; padded targets are invalid."""

    masks_logits: jnp.ndarray  # (B, N, K+1, D, H, W) upsampled to image grid
    masks_logits_low_res: jnp.ndarray  # (B, N, K+1, d', h', w')
    boxes: jnp.ndarray  # (B, N, K+1, 6) CenterSize in [0, 1]
    disc_logit: jnp.ndarray  # (B, N, K)


def init_sam_params(key, cfg: SamConfig, instance: bool = False, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "encoder": init_encoder_params(k1, cfg, dtype),
        "prompt": init_prompt_encoder_params(k2, cfg, dtype),
        "decoder": init_mask_decoder_params(k3, cfg, dtype),
    }
    if instance:
        c = cfg.embed_dim
        std = 0.02

        def nrm(k, shape):
            return (jax.random.normal(k, shape) * std).astype(dtype)

        kb = jax.random.split(k4, 3)
        params["box_head"] = {
            "w1": nrm(kb[0], (c, c)), "b1": jnp.zeros((c,), dtype),
            "w2": nrm(kb[1], (c, c)), "b2": jnp.zeros((c,), dtype),
            "w3": nrm(kb[2], (c, 6)), "b3": jnp.zeros((6,), dtype),
        }
        kd = jax.random.split(k5, 2)
        params["disc_head"] = {
            "w1": nrm(kd[0], (c, c)), "b1": jnp.zeros((c,), dtype),
            "w2": nrm(kd[1], (c, 1)), "b2": jnp.zeros((1,), dtype),
        }
    return params


def _decode_all_targets(params, cfg, embeds, prompts, patch_size_z, attn_impl):
    """vmap the mask decoder over (batch, target).

    embeds: (B, C, gd, gh, gw); prompts: (B, N, C).
    Returns masks (B, N, K+1, d', h', w'), token_embeds (B, N, K+1, C).
    """
    grid = embeds.shape[2:]
    pe = dense_pe(params["prompt"], grid)
    dense = jnp.broadcast_to(
        params["prompt"]["no_mask_embed"].reshape(-1, 1, 1, 1), (embeds.shape[1], *grid)
    )

    def one(emb_b, prompt_bn):
        return mask_decoder_forward(
            params["decoder"], cfg, emb_b, pe, prompt_bn[None], dense, prompt_bn, patch_size_z
        )

    per_target = jax.vmap(one, in_axes=(None, 0))
    per_batch = jax.vmap(per_target, in_axes=(0, 0))
    return per_batch(embeds, prompts)


def sam_forward(
    params: dict,
    cfg: SamConfig,
    image: jnp.ndarray,  # (B, C, D, H, W)
    patch_size: tuple[int, int, int],
    prompts: jnp.ndarray,  # (B, N, C) vg_proj/text prompts, padded over N
    *,
    upsample_to_image: bool = True,
    attn_impl: str = "auto",
    remat: bool = False,
):
    """Semantic path (``sam.py:72-87``): returns (B, N, D, H, W) mask logits
    (semantic token only), plus the low-res logits."""
    embeds = encoder_forward(params["encoder"], cfg, image, patch_size, attn_impl=attn_impl, remat=remat)
    masks, _ = _decode_all_targets(params, cfg, embeds, prompts, patch_size[0], attn_impl)
    semantic_low = masks[:, :, 0]  # (B, N, d', h', w')
    if not upsample_to_image:
        return semantic_low, semantic_low
    full = jax.vmap(lambda m: trilinear_resize(m, image.shape[2:]))(semantic_low)
    return full, semantic_low


def sam_forward_prompted(
    params: dict,
    cfg: SamConfig,
    image: jnp.ndarray,  # (1, C, D, H, W) single sample
    patch_size: tuple[int, int, int],
    *,
    points: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    boxes: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    text_embedding: jnp.ndarray | None = None,
    upsample_to_image: bool = True,
    attn_impl: str = "auto",
):
    """Interactive segmentation from point/box/mask (and optionally text)
    prompts — the SegVol prompt modes beyond MMMM's text-only path (ref
    ``prompt_encoder.py:123-151`` + ``sam.py`` forward). Point coords are
    un-normalized (x, y, z) against the (H, W, D) input size; boxes are
    (x0, y0, z0, x1, y1, z1). Returns (mask logits (D, H, W), low-res)."""
    from .decoder import encode_prompts

    embeds = encoder_forward(params["encoder"], cfg, image, patch_size, attn_impl=attn_impl)
    grid = embeds.shape[2:]
    d, h, w = image.shape[2:]
    sparse, dense = encode_prompts(
        params["prompt"], grid, (h, w, d),
        points=points, boxes=boxes, mask=mask, text_embedding=text_embedding,
    )
    pe = dense_pe(params["prompt"], grid)
    masks, _ = mask_decoder_forward(
        params["decoder"], cfg, embeds[0], pe, sparse, dense,
        text_embedding, patch_size[0],
    )
    low = masks[0]  # semantic mask token
    if not upsample_to_image:
        return low, low
    return trilinear_resize(low[None], image.shape[2:])[0], low


def instance_sam_forward(
    params: dict,
    cfg: SamConfig,
    image: jnp.ndarray,
    patch_size: tuple[int, int, int],
    prompts: jnp.ndarray,  # (B, N, C)
    *,
    upsample_to_image: bool = True,
    attn_impl: str = "auto",
    remat: bool = False,
) -> InstanceSamOutput:
    """Instance path (``sam.py:410-432``): masks + DETR-style box/presence heads."""
    embeds = encoder_forward(params["encoder"], cfg, image, patch_size, attn_impl=attn_impl, remat=remat)
    masks_low, token_embeds = _decode_all_targets(
        params, cfg, embeds, prompts, patch_size[0], attn_impl
    )
    bh, dh = params["box_head"], params["disc_head"]
    x = jax.nn.relu(token_embeds @ bh["w1"] + bh["b1"])
    x = jax.nn.relu(x @ bh["w2"] + bh["b2"])
    boxes = jax.nn.sigmoid((x @ bh["w3"] + bh["b3"]).astype(jnp.float32))  # (B, N, K+1, 6)
    y = jax.nn.relu(token_embeds[:, :, 1:] @ dh["w1"] + dh["b1"])
    disc = (y @ dh["w2"] + dh["b2"])[..., 0].astype(jnp.float32)  # (B, N, K)
    if upsample_to_image:
        full = jax.vmap(jax.vmap(lambda m: trilinear_resize(m, image.shape[2:])))(masks_low)
    else:
        full = masks_low
    return InstanceSamOutput(full, masks_low, boxes, disc)
