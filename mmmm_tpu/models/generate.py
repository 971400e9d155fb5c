"""Greedy generation with static KV caches + grounded decoding.

Equivalent of the reference's HF ``generate`` plumbing
(``mmmm/models/mmmm.py:354-406``, ``modeling_cogvlm.py:725-780``): prefill the
full multimodal prompt once, then a ``lax.scan`` decode loop over a
preallocated cache — one compiled program per (prompt-bucket, max-new) shape.

CogVLM position quirk during decode (``mmmm.py:383-388``): the position id of
the token being fed does NOT advance when the previous token is ``<p>`` or the
fed token itself is ``</p>`` — grounded phrase tags are positionally invisible.

Per-step last-layer hidden states are collected so grounded inference can
gather the states that generated each ``</p>`` and prompt the SAM heads
(``mmmm.py:180-223``) without a second forward pass.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from ..ops.quant import qdot
from .cogvlm import CogVLMConfig
from .cogvlm.decoder import LANGUAGE_TOKEN_TYPE, llm_decode_step, llm_prefill
from .cogvlm.model import splice_vision_embeds
from .cogvlm.vit import vit_forward


@dataclasses.dataclass
class GenerateResult:
    tokens: jnp.ndarray  # (B, max_new) generated ids (eos-padded after stop)
    hidden: jnp.ndarray  # (B, max_new, C) hidden state that generated each token
    prefill_hidden: jnp.ndarray  # (B, S_prompt, C)
    num_generated: jnp.ndarray  # (B,) tokens before (and including) eos


def prefill_decode_state(
    params: dict,
    cfg: CogVLMConfig,
    input_ids: jnp.ndarray,  # (B, S_prompt) right-padded prompt
    token_type_ids: jnp.ndarray,  # (B, S_prompt)
    position_ids: jnp.ndarray,  # (B, S_prompt)
    prompt_len: jnp.ndarray,  # (B,) true prompt lengths
    *,
    smax: int,
    eos_token_id: int,
    image: jnp.ndarray | None = None,
    patch_size=None,
    pool_size=None,
    attn_impl: str = "auto",
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
    vis_embeds: jnp.ndarray | None = None,
):
    """Prefill the multimodal prompt and build the initial decode-loop state.

    Shared by the greedy scan (below) and the speculative verify loop
    (``models/speculate.py``). Returns ``(state, prefill_hidden, last_hidden)``
    where ``state`` carries the per-layer caches sized to ``smax`` slots, the
    first generated token, and the <p>-freeze position bookkeeping.

    ``vis_embeds`` short-circuits the ViT: already-encoded vision tokens
    (B, T_vis, C_llm) are spliced instead of running ``vit_forward`` — used by
    the ViT-only chunked-prefill mode, which bounds the ViT transients with a
    batch-chunked ``lax.map`` but runs the LLM prefill once at the full batch
    (one W8A16 dequant pass instead of one per chunk).
    """
    b, s_prompt = input_ids.shape
    segments = (jnp.arange(s_prompt)[None, :] < prompt_len[:, None]).astype(jnp.int32)

    # ---- prefill ----------------------------------------------------------
    emb = params["llm"]["embed_tokens"][input_ids]
    if vis_embeds is not None:
        emb = splice_vision_embeds(emb, vis_embeds)
    elif image is not None:
        vis = vit_forward(params["vision"], cfg, image, patch_size, pool_size, attn_impl=attn_impl)
        emb = splice_vision_embeds(emb, vis)
    # per-layer (B, H, Smax, D) cache pairs: decode-friendly layout; the
    # unrolled prefill writes each layer's K/V straight into its preallocated
    # cache (no stacked (L, B, S, H, D) transient — that transient set the
    # serving batch ceiling). kv_cache_dtype="int8" stores per-slot-quantized
    # caches (half the bandwidth-bound decode reads; per (b, h, slot) scales).
    hidden, caches = llm_prefill(
        params["llm"], cfg, emb, token_type_ids, position_ids, segments,
        smax=smax, attn_impl=attn_impl, vis_span=vis_span,
        kv_cache_dtype=kv_cache_dtype,
    )

    last_idx = prompt_len - 1  # (B,)
    take = lambda arr: jnp.take_along_axis(arr, last_idx[:, None, None], axis=1)[:, 0] if arr.ndim == 3 else jnp.take_along_axis(arr, last_idx[:, None], axis=1)[:, 0]
    last_hidden = take(hidden)  # (B, C)
    logits0 = qdot(last_hidden, params["llm"]["lm_head"]).astype(jnp.float32)
    tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)  # first generated token
    last_tok = take(input_ids)  # token that generated tok0
    last_pos = take(position_ids)

    state = {
        "caches": caches,
        "tok": tok0,  # token to feed next
        "prev_tok": last_tok,  # token before it (for the <p> freeze rule)
        "pos": last_pos,  # position of prev token
        "write": prompt_len,  # cache slot for the fed token
        "done": tok0 == eos_token_id,
    }
    return state, hidden, last_hidden


def chunked_prefill_decode_state(
    params: dict,
    cfg: CogVLMConfig,
    input_ids: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    *,
    chunk: int,
    chunk_mode: str = "all",
    slice_to_batch: bool = False,
    image: jnp.ndarray | None = None,
    patch_size=None,
    pool_size=None,
    attn_impl: str = "auto",
    **kw,
):
    """``prefill_decode_state`` with the prefill sequenced over batch
    sub-chunks via an in-program ``lax.map`` (one chunk's ViT/patch-embed
    transients live at a time; the stacked map outputs are the full-batch
    caches). Token-identical to the fused form — prefill is batch-parallel.

    ``chunk_mode="vit"``: only the ViT runs chunked; the LLM prefill runs
    once at the full (true) batch — one W8A16 dequant pass per batch instead
    of per chunk, and nothing downstream sees the chunk-padded batch.

    ``slice_to_batch``: in "all" mode the map output is padded to a whole
    number of chunks; True slices state/hidden back to the true batch (one
    cache-sized copy when padding occurred), False returns the padded batch
    and leaves slicing to the caller (the serving path decodes at the padded
    batch and slices outputs — established behavior, see CLAUDE.md gotcha)."""
    b, s = input_ids.shape
    if chunk <= 0 or chunk >= b:
        return prefill_decode_state(
            params, cfg, input_ids, token_type_ids, position_ids, prompt_len,
            image=image, patch_size=patch_size, pool_size=pool_size,
            attn_impl=attn_impl, **kw,
        )
    bp = -(-b // chunk) * chunk
    nchunk = bp // chunk

    def padb(x, fill=0):
        if bp == b:
            return x
        return jnp.pad(
            x, ((0, bp - b),) + ((0, 0),) * (x.ndim - 1), constant_values=fill
        )

    resh = lambda x: x.reshape((nchunk, chunk) + x.shape[1:])

    if chunk_mode == "vit" and image is not None:
        vis = jax.lax.map(
            lambda im: vit_forward(
                params["vision"], cfg, im, patch_size, pool_size,
                attn_impl=attn_impl,
            ),
            resh(padb(image)),
        )
        vis = vis.reshape((bp,) + vis.shape[2:])[:b]
        return prefill_decode_state(
            params, cfg, input_ids, token_type_ids, position_ids, prompt_len,
            vis_embeds=vis, attn_impl=attn_impl, **kw,
        )

    xs = [
        resh(padb(input_ids)), resh(padb(token_type_ids)),
        resh(padb(position_ids)),
        # pad rows get prompt_len=1 (any valid length; their outputs are
        # sliced off by the caller / slice_to_batch)
        resh(padb(prompt_len, fill=1)),
    ]
    if image is not None:
        xs.append(resh(padb(image)))

    def body(args):
        img_c = args[4] if image is not None else None
        return prefill_decode_state(
            params, cfg, args[0], args[1], args[2], args[3],
            image=img_c, patch_size=patch_size, pool_size=pool_size,
            attn_impl=attn_impl, **kw,
        )

    state, hidden, last_hidden = jax.lax.map(body, tuple(xs))
    unchunk = lambda x: x.reshape((bp,) + x.shape[2:])
    state = jax.tree.map(unchunk, state)
    hidden, last_hidden = unchunk(hidden), unchunk(last_hidden)
    if slice_to_batch and bp != b:
        state = jax.tree.map(lambda x: x[:b], state)
        hidden, last_hidden = hidden[:b], last_hidden[:b]
    return state, hidden, last_hidden


def greedy_decode_from_state(
    params: dict,
    cfg: CogVLMConfig,
    state: dict,
    hidden: jnp.ndarray,  # (B, S_prompt, C) prefill hidden states
    last_hidden: jnp.ndarray,  # (B, C)
    *,
    max_new_tokens: int,
    eos_token_id: int,
    bop_token_id: int,
    eop_token_id: int,
    attn_impl: str = "auto",
    return_final_state: bool = False,
):
    """The greedy decode scan over a prefilled state (see
    ``prefill_decode_state``). Split out so callers can jit prefill and decode
    separately — chunked prefill (``models/serving.py`` slot refill, the
    bench's large-batch path) prefills in sub-batches whose transients fit
    HBM, concatenates the states, and decodes at the full batch.

    ``return_final_state=True`` additionally returns the post-scan state.
    Callers that jit this function with donated input state MUST return the
    final caches as outputs — XLA only honors input donation when the buffer
    can alias an output, so a decode program that drops the caches keeps TWO
    copies of them alive (measured: the r04 B48/B56 bench OOMs came exactly
    from this)."""
    b = state["tok"].shape[0]

    def step(state, _):
        tok, prev = state["tok"], state["prev_tok"]
        keep = (prev == bop_token_id) | (tok == eop_token_id)
        pos = state["pos"] + 1 - keep.astype(state["pos"].dtype)
        emb_t = params["llm"]["embed_tokens"][tok][:, None, :]  # (B, 1, C)
        tt = jnp.full((b, 2), LANGUAGE_TOKEN_TYPE, jnp.int32)
        hidden_t, caches = llm_decode_step(
            params["llm"], cfg, emb_t, tt, pos[:, None], state["caches"],
            state["write"], state["write"] + 1, attn_impl=attn_impl,
        )
        hidden_t = hidden_t[:, 0]  # (B, C)
        logits = qdot(hidden_t, params["llm"]["lm_head"]).astype(jnp.float32)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(state["done"], eos_token_id, next_tok)
        out = {"token": state["tok"], "hidden": hidden_t, "done": state["done"]}
        new_state = {
            "caches": caches,
            "tok": next_tok,
            "prev_tok": tok,
            "pos": pos,
            "write": state["write"] + 1,
            "done": state["done"] | (next_tok == eos_token_id),
        }
        return new_state, out

    # MMMM_DECODE_UNROLL>1 unrolls the decode scan body (token-identical;
    # trades compile time + code size for less per-step loop overhead and
    # cross-step scheduling freedom. A/B knob for the serving bench — the
    # decode step runs ~11 ms vs ~6.5 ms analytic and part of the gap may be
    # per-iteration fixed cost).
    unroll = int(os.environ.get("MMMM_DECODE_UNROLL", "1"))
    state, outs = jax.lax.scan(
        step, state, None, length=max_new_tokens, unroll=unroll
    )
    tokens = outs["token"].T  # (B, max_new): token fed at each step == generated seq
    step_hidden = outs["hidden"].transpose(1, 0, 2)  # (B, max_new, C)
    # align so hidden[:, t] is the state that *produced* tokens[:, t]
    gen_hidden = jnp.concatenate([last_hidden[:, None], step_hidden[:, :-1]], axis=1)
    was_done = outs["done"].T  # done *before* each step
    tokens = jnp.where(was_done, eos_token_id, tokens)
    num_generated = (~was_done).sum(axis=1)
    res = GenerateResult(tokens, gen_hidden, hidden, num_generated)
    if return_final_state:
        return res, state
    return res


def greedy_generate(
    params: dict,
    cfg: CogVLMConfig,
    input_ids: jnp.ndarray,  # (B, S_prompt) right-padded prompt
    token_type_ids: jnp.ndarray,  # (B, S_prompt)
    position_ids: jnp.ndarray,  # (B, S_prompt)
    prompt_len: jnp.ndarray,  # (B,) true prompt lengths
    *,
    max_new_tokens: int,
    eos_token_id: int,
    bop_token_id: int,
    eop_token_id: int,
    image: jnp.ndarray | None = None,
    patch_size=None,
    pool_size=None,
    attn_impl: str = "auto",
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
) -> GenerateResult:
    b, s_prompt = input_ids.shape
    state, hidden, last_hidden = prefill_decode_state(
        params, cfg, input_ids, token_type_ids, position_ids, prompt_len,
        smax=s_prompt + max_new_tokens, eos_token_id=eos_token_id,
        image=image, patch_size=patch_size, pool_size=pool_size,
        attn_impl=attn_impl, vis_span=vis_span, kv_cache_dtype=kv_cache_dtype,
    )
    return greedy_decode_from_state(
        params, cfg, state, hidden, last_hidden,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        bop_token_id=bop_token_id, eop_token_id=eop_token_id,
        attn_impl=attn_impl,
    )
