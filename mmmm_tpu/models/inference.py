"""Grounded generation: text + masks/boxes from one forward pipeline.

Equivalent of the reference's inference flow (``scripts/demo.py`` +
``MMMMForCausalLM.visual_grounding``, ``mmmm.py:180-223``): greedy-generate a
report, parse ``<p> ... </p>`` spans from the generated ids, project the
hidden states that produced each ``</p>`` into SAM prompt space, and run the
semantic SAM (masks) or instance SAM (boxes + presence) on the grounding
image.

The generate pass is fully jitted; target parsing happens on host between the
two jitted stages (the grounding head consumes a fixed-size padded prompt
tensor, so the second stage also compiles once per bucket).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import MMMMTokenizer
from .generate import greedy_generate
from .mmmm import MMMMConfig, vg_project
from .segvol import instance_sam_forward, sam_forward


@dataclasses.dataclass
class GroundedResult:
    text: list[str]
    tokens: np.ndarray  # (B, max_new)
    targets: list[list[str] | None]  # parsed grounded phrases per sample
    masks: np.ndarray | None = None  # (B, N, D, H, W) sigmoid-able logits
    boxes: np.ndarray | None = None  # (B, N, K, 6) CenterSize in [0, 1]
    disc_logit: np.ndarray | None = None  # (B, N, K)
    target_valid: np.ndarray | None = None  # (B, N)


def generate_grounded(
    params: dict,
    cfg: MMMMConfig,
    tokenizer: MMMMTokenizer,
    input_ids: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    image: jnp.ndarray | None,
    patch_size,
    pool_size,
    *,
    max_new_tokens: int = 256,
    max_targets: int = 8,
    grounding_image: jnp.ndarray | None = None,
    instance: bool = False,
    attn_impl: str = "auto",
) -> GroundedResult:
    res = greedy_generate(
        params["cogvlm"], cfg.vlm, input_ids, token_type_ids, position_ids, prompt_len,
        max_new_tokens=max_new_tokens,
        eos_token_id=tokenizer.eos_token_id,
        bop_token_id=tokenizer.bop_token_id,
        eop_token_id=tokenizer.eop_token_id,
        image=image, patch_size=patch_size, pool_size=pool_size,
        attn_impl=attn_impl,
    )
    tokens = np.asarray(res.tokens)
    texts = [
        tokenizer.decode([int(t) for t in row if int(t) != tokenizer.eos_token_id])
        for row in tokens
    ]
    targets = tokenizer.parse_targets(tokens)

    out = GroundedResult(text=texts, tokens=tokens, targets=targets)
    if grounding_image is None:
        return out

    b = tokens.shape[0]
    positions = np.zeros((b, max_targets), np.int64)
    valid = np.zeros((b, max_targets), bool)
    for i in range(b):
        (eops,) = np.nonzero(tokens[i] == tokenizer.eop_token_id)
        eops = eops[: max_targets]
        positions[i, : len(eops)] = eops
        valid[i, : len(eops)] = True
    out.target_valid = valid

    if not valid.any():
        return out
    hidden = res.hidden.astype(jnp.float32)  # (B, max_new, C), aligned with tokens
    gathered = jnp.take_along_axis(hidden, jnp.asarray(positions)[..., None], axis=1)
    prompts = vg_project(params, gathered)  # (B, N, prompt_dim)
    g_image = grounding_image.astype(jnp.float32)
    if instance:
        o = instance_sam_forward(params["isam"], cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl)
        out.boxes = np.asarray(o.boxes[:, :, 1:])
        out.disc_logit = np.asarray(o.disc_logit)
    else:
        masks, _ = sam_forward(params["sam"], cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl)
        out.masks = np.asarray(masks)
    return out
