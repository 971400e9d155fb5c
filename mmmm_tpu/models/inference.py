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
import os

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
    prefill_chunk: int = 0,
    w8a8: bool = False,
    decode_unroll: int = 1,
    kv_append: bool = True,
    chunk_mode: str = "all",
):
    """Jitted first stage: the full prefill + decode scan.

    ``w8a8``, ``decode_unroll`` and ``kv_append`` are read from MMMM_W8A8 /
    MMMM_DECODE_UNROLL / MMMM_KV_APPEND by the caller and exist here only as
    lru_cache keys: all three are consumed at TRACE time (decoder lang-only
    branch / decode scan / cache-append form), so flipping the env
    mid-process must not reuse a stale compiled stage.

    ``greedy_generate`` is pure jnp; without a jit wrapper its prefill
    (ViT + LLM forward, hundreds of primitives) dispatches eagerly — fine on
    a local chip, ~45 ms per op through the axon relay. Compiles once per
    (config, generation-params) bucket.

    ``spec_draft_len > 0`` routes the decode loop through n-gram speculative
    verification (``models/speculate.py``) — token-identical to greedy.

    ``prefill_chunk > 0`` splits prefill into batch sub-chunks: the ViT /
    patch-embed / prefill-activation transients — the single-chip batch
    ceiling (B32 OOMs on them at bf16 KV while the caches themselves fit,
    ROADMAP round 3) — are bounded by the chunk size, the per-layer KV caches
    are written into full-batch buffers, and the decode scan (whose only
    per-slot cost is cache rows) runs at the full batch. Token-identical to
    the fused path: prefill is batch-parallel, so chunking the batch changes
    nothing numerically."""

    def stage(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        stats = None
        if spec_draft_len > 0:
            from .speculate import ngram_speculative_generate

            res, stats = ngram_speculative_generate(
                params["cogvlm"], cfg.vlm, input_ids, token_type_ids,
                position_ids, prompt_len, max_new_tokens=max_new_tokens,
                eos_token_id=eos_token_id, bop_token_id=bop_token_id,
                eop_token_id=eop_token_id, image=image if has_image else None,
                patch_size=patch_size, pool_size=pool_size, attn_impl=attn_impl,
                vis_span=vis_span, kv_cache_dtype=kv_cache_dtype,
                draft_len=spec_draft_len, return_stats=True,
                prefill_chunk=prefill_chunk, chunk_mode=chunk_mode,
            )
        else:
            res = greedy_generate(
                params["cogvlm"], cfg.vlm, input_ids, token_type_ids, position_ids,
                prompt_len, max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
                bop_token_id=bop_token_id, eop_token_id=eop_token_id,
                image=image if has_image else None,
                patch_size=patch_size, pool_size=pool_size, attn_impl=attn_impl,
                vis_span=vis_span, kv_cache_dtype=kv_cache_dtype,
            )
        # plain tuple: GenerateResult is not a registered pytree
        return (res.tokens, res.hidden, res.prefill_hidden, res.num_generated,
                stats)

    if prefill_chunk > 0 and spec_draft_len == 0:
        return _chunked_generate_stage(
            cfg, max_new_tokens, eos_token_id, bop_token_id, eop_token_id,
            patch_size, pool_size, attn_impl, has_image, vis_span,
            kv_cache_dtype, prefill_chunk, chunk_mode,
        )

    jitted = jax.jit(stage)

    def run(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        from .generate import GenerateResult

        out = jitted(
            params, input_ids, token_type_ids, position_ids, prompt_len, image
        )
        return GenerateResult(*out[:4]), out[4]

    return run


def _chunked_generate_stage(
    cfg: MMMMConfig,
    max_new_tokens: int,
    eos_token_id: int,
    bop_token_id: int,
    eop_token_id: int,
    patch_size,
    pool_size,
    attn_impl: str,
    has_image: bool,
    vis_span,
    kv_cache_dtype: str,
    chunk: int,
    chunk_mode: str = "all",
):
    """Chunked-prefill generate: see ``_generate_stage(prefill_chunk=...)``.

    ONE compiled program: ``lax.map`` sequences prefill over batch sub-chunks
    (one chunk's ViT/patch-embed transients live at a time; the stacked map
    outputs ARE the full-batch caches), then the decode scan runs at the full
    batch in the same program — so there is no per-chunk relay dispatch tax
    (~32 ms each, PROBE_LONGCTX_r04) and no cross-program donation hazard
    (in-program, XLA's copy-insertion aliases the map outputs into the scan
    carry). An earlier three-program version (separate prefill/insert/decode
    jits with explicit donation) measured 0.2–0.7 s/batch of pure dispatch
    overhead at B40–56; this supersedes it.

    ``chunk_mode="vit"`` (MMMM_PREFILL_CHUNK_MODE): only the ViT runs under
    the chunked ``lax.map`` — the transients that set the batch ceiling are
    the ViT/patch-embed ones (ROADMAP round 3) — while the LLM prefill runs
    ONCE at the full batch, so the W8A16 weight dequant traffic (int8 read +
    bf16 materialize per matmul, ~16 GB per pass over the 3.3 GB expert
    weights) is paid once instead of once per chunk. Token-identical to
    "all": chunking is batch-parallel either way."""
    from .generate import GenerateResult, chunked_prefill_decode_state, greedy_decode_from_state

    def stage(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        b, s = input_ids.shape
        state, hidden, last_hidden = chunked_prefill_decode_state(
            params["cogvlm"], cfg.vlm, input_ids, token_type_ids,
            position_ids, prompt_len, chunk=chunk, chunk_mode=chunk_mode,
            smax=s + max_new_tokens, eos_token_id=eos_token_id,
            image=image if has_image else None, patch_size=patch_size,
            pool_size=pool_size, attn_impl=attn_impl, vis_span=vis_span,
            kv_cache_dtype=kv_cache_dtype,
        )
        # "all" mode decodes at the chunk-padded batch and slices outputs
        # (established serving behavior, CLAUDE.md gotcha); "vit" mode never
        # padded anything past the ViT, so everything below is size b already
        res = greedy_decode_from_state(
            params["cogvlm"], cfg.vlm, state, hidden, last_hidden,
            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            bop_token_id=bop_token_id, eop_token_id=eop_token_id,
            attn_impl=attn_impl,
        )
        return (res.tokens[:b], res.hidden[:b], res.prefill_hidden[:b],
                res.num_generated[:b])

    jitted = jax.jit(stage)

    def run(params, input_ids, token_type_ids, position_ids, prompt_len, image):
        out = jitted(
            params, input_ids, token_type_ids, position_ids, prompt_len, image
        )
        return GenerateResult(*out), None

    return run


@functools.lru_cache(maxsize=8)
def _grounding_stage(
    cfg: MMMMConfig, patch_size, instance: bool, attn_impl: str, chunk: int = 0,
    sam_bf16: bool = False,
):
    """Jitted second stage: hidden-state gather -> vg_proj -> SAM head.

    Without this the grounding pass runs eagerly op-by-op — harmless on a
    local chip, catastrophic through the axon relay (~45 ms per dispatch).
    Compiles once per (config, patch, mode) bucket; shapes are already
    static (padded max_targets).

    ``chunk > 0`` sequences the SAM pass over batch sub-chunks with
    ``lax.map`` INSIDE the one program (the encoder's fp32 transients scale
    with batch like the ViT's; chunking bounds them without per-chunk
    dispatches).

    ``sam_bf16`` (MMMM_SAM_BF16=1, serving-only knob, default off): run the
    SAM head in bf16 instead of the reference's fp32 grounding policy
    (``MyPrecision``, ref mmmm.py:468-492 — a TRAINING-stability policy).
    fp32 matmuls take the slow MXU path (~4x bf16 peak), and at serving time
    the masks are thresholded sigmoids, so bf16 rounding of the logits is
    far below the decision noise floor. vg_proj stays fp32 (its output is
    cast); the fp32 path remains the default for parity."""

    def one(params, hidden, positions, g_image):
        gathered = jnp.take_along_axis(
            hidden.astype(jnp.float32), positions[..., None], axis=1
        )
        prompts = vg_project(params, gathered)  # (B, N, prompt_dim)
        cdt = jnp.bfloat16 if sam_bf16 else jnp.float32
        g_image = g_image.astype(cdt)
        prompts = prompts.astype(cdt)
        head = params["isam" if instance else "sam"]
        if sam_bf16:
            head = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, head
            )
        if instance:
            o = instance_sam_forward(
                head, cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl
            )
            return o.boxes[:, :, 1:].astype(jnp.float32), o.disc_logit.astype(jnp.float32)
        masks, _ = sam_forward(
            head, cfg.sam, g_image, patch_size, prompts, attn_impl=attn_impl
        )
        return masks

    def stage(params, hidden, positions, g_image):
        b = hidden.shape[0]
        if chunk <= 0 or chunk >= b:
            return one(params, hidden, positions, g_image)
        bp = -(-b // chunk) * chunk

        def padb(x):
            if bp == b:
                return x
            return jnp.pad(x, ((0, bp - b),) + ((0, 0),) * (x.ndim - 1))

        resh = lambda x: padb(x).reshape((bp // chunk, chunk) + x.shape[1:])
        out = jax.lax.map(
            lambda args: one(params, *args),
            (resh(hidden), resh(positions), resh(g_image)),
        )
        return jax.tree.map(lambda x: x.reshape((bp,) + x.shape[2:])[:b], out)

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
    # speculative-decoding gauge (spec_draft_len > 0 only): {"iters": verify
    # steps run, "tokens_per_step": mean committed tokens per weight pass}
    spec_stats: dict | None = None


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
    prefill_chunk: int = 0,
) -> GroundedResult:
    gen = _generate_stage(
        cfg, max_new_tokens, tokenizer.eos_token_id, tokenizer.bop_token_id,
        tokenizer.eop_token_id,
        tuple(patch_size) if patch_size is not None else None,
        tuple(pool_size) if pool_size is not None else None,
        attn_impl, image is not None,
        tuple(vis_span) if vis_span is not None else None,
        kv_cache_dtype, spec_draft_len, prefill_chunk,
        os.environ.get("MMMM_W8A8", "0") == "1",
        int(os.environ.get("MMMM_DECODE_UNROLL", "1")),
        os.environ.get("MMMM_KV_APPEND", "1") == "1",
        os.environ.get("MMMM_PREFILL_CHUNK_MODE", "all"),
    )
    res, spec_stats = gen(
        params, input_ids, token_type_ids, position_ids, prompt_len, image
    )
    tokens = np.asarray(res.tokens)
    texts = [
        tokenizer.decode([int(t) for t in row if int(t) != tokenizer.eos_token_id])
        for row in tokens
    ]
    targets = tokenizer.parse_targets(tokens)

    out = GroundedResult(
        text=texts, tokens=tokens, targets=targets, spec_stats=spec_stats
    )
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
    # chunk the SAM pass with the prefill: its encoder transients scale with
    # batch the same way the ViT's do (in-program lax.map — no dispatch tax)
    stage = _grounding_stage(
        cfg, tuple(patch_size), instance, attn_impl, prefill_chunk,
        os.environ.get("MMMM_SAM_BF16", "0") == "1",
    )
    o = stage(params, res.hidden, jnp.asarray(positions), grounding_image)
    if instance:
        out.boxes = fetch(o[0])
        out.disc_logit = fetch(o[1])
    else:
        out.masks = fetch(o)
    return out
