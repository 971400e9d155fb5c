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
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import MMMMTokenizer
from .generate import greedy_generate
from .mmmm import MMMMConfig, vg_project
from .segvol import instance_sam_forward, sam_forward


@functools.lru_cache(maxsize=8)
def _generate_stage(
    cfg: MMMMConfig,
    max_new_tokens: int,
    eos_token_id: int,
    bop_token_id: int,
    eop_token_id: int,
    patch_size,
    pool_size,
    attn_impl: str,
    has_image: bool,
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
    spec_draft_len: int = 0,
):
    """Jitted first stage: the full prefill + decode scan.

    ``greedy_generate`` is pure jnp; without a jit wrapper its prefill
    (ViT + LLM forward, hundreds of primitives) dispatches eagerly — fine on
    a local chip, ~45 ms per op through the axon relay. Compiles once per
    (config, generation-params) bucket.

    ``spec_draft_len > 0`` routes the decode loop through n-gram speculative
    verification (``models/speculate.py``) — token-identical to greedy."""

    def stage(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        if spec_draft_len > 0:
            from .speculate import ngram_speculative_generate

            gen_fn = functools.partial(
                ngram_speculative_generate, draft_len=spec_draft_len
            )
        else:
            gen_fn = greedy_generate
        res = gen_fn(
            params["cogvlm"], cfg.vlm, input_ids, token_type_ids, position_ids,
            prompt_len, max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            bop_token_id=bop_token_id, eop_token_id=eop_token_id,
            image=image if has_image else None,
            patch_size=patch_size, pool_size=pool_size, attn_impl=attn_impl,
            vis_span=vis_span, kv_cache_dtype=kv_cache_dtype,
        )
        # plain tuple: GenerateResult is not a registered pytree
        return res.tokens, res.hidden, res.prefill_hidden, res.num_generated

    jitted = jax.jit(stage)

    def run(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        from .generate import GenerateResult

        return GenerateResult(*jitted(
            params, input_ids, token_type_ids, position_ids, prompt_len, image
        ))

    return run


@functools.lru_cache(maxsize=8)
def _grounding_stage(cfg: MMMMConfig, patch_size, instance: bool, attn_impl: str):
    """Jitted second stage: hidden-state gather -> vg_proj -> SAM head.

    Without this the grounding pass runs eagerly op-by-op — harmless on a
    local chip, catastrophic through the axon relay (~45 ms per dispatch).
    Compiles once per (config, patch, mode) bucket; shapes are already
    static (padded max_targets)."""

    def stage(params, hidden, positions, g_image):
        gathered = jnp.take_along_axis(
            hidden.astype(jnp.float32), positions[..., None], axis=1
        )
        prompts = vg_project(params, gathered)  # (B, N, prompt_dim)
        g_image = g_image.astype(jnp.float32)
        if instance:
            o = instance_sam_forward(
                params["isam"], cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl
            )
            return o.boxes[:, :, 1:], o.disc_logit
        masks, _ = sam_forward(
            params["sam"], cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl
        )
        return masks

    return jax.jit(stage)


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
    fetch_grounding: bool = True,
    force_grounding: bool = False,
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
    spec_draft_len: int = 0,
) -> GroundedResult:
    gen = _generate_stage(
        cfg, max_new_tokens, tokenizer.eos_token_id, tokenizer.bop_token_id,
        tokenizer.eop_token_id,
        tuple(patch_size) if patch_size is not None else None,
        tuple(pool_size) if pool_size is not None else None,
        attn_impl, image is not None,
        tuple(vis_span) if vis_span is not None else None,
        kv_cache_dtype, spec_draft_len,
    )
    res = gen(params, input_ids, token_type_ids, position_ids, prompt_len, image)
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
        if not force_grounding:
            return out
        # benchmarking/testing hook: run the mask pass on position-0 hidden
        # states even when the generation produced no </p> spans
        valid[:, 0] = True
        out.target_valid = valid
    # fetch_grounding=False keeps masks/boxes as device arrays — callers on a
    # slow host link (the axon relay moves ~10 MB/s) fence with an on-device
    # reduction instead of shipping (B, N, D, H, W) fp32 masks to host
    fetch = np.asarray if fetch_grounding else (lambda x: x)
    stage = _grounding_stage(cfg, tuple(patch_size), instance, attn_impl)
    if instance:
        boxes, disc = stage(params, res.hidden, jnp.asarray(positions), grounding_image)
        out.boxes = fetch(boxes)
        out.disc_logit = fetch(disc)
    else:
        out.masks = fetch(stage(params, res.hidden, jnp.asarray(positions), grounding_image))
    return out
