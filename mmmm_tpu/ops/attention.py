"""Segment-id attention: the one attention family for the whole framework.

The reference uses xformers CUDA varlen attention with ragged lists of tensors
(BlockDiagonalMask / BlockDiagonalCausalMask) in four places: the EVA ViT over
packed multi-image batches, the LLM causal attention over padded ragged batches,
the SAM image encoder, and single-token decode (``modeling_cogvlm.py:106-142``,
``visual.py:97``, ``segvol/modeling/image_encoder.py:126-136``).

The TPU-native design replaces ragged lists with *static shapes + segment ids*:
tokens may attend to each other iff they carry the same nonzero segment id
(segment id 0 = padding). A causal flag adds the lower-triangular constraint.
This one contract covers padded batches (one segment per row), packed
multi-image streams (one segment per image), and mixed packing.

Two interchangeable implementations:
  - ``xla``: reference einsum implementation, differentiable, runs anywhere.
  - ``pallas``: flash-attention kernels (``flash.py``) — Pallas forward plus
    Pallas dq and dk/dv backward kernels wired via ``jax.custom_vjp``, all
    streaming K/V (resp. q/dO) blocks from HBM.

Numerics: softmax in fp32; fully-masked query rows produce zeros (matching the
reference's zero-initialized output buffer, ``modeling_cogvlm.py:119``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# sequence-parallel (ring) context: set by the trainer when the mesh carries a
# sequence axis; ``segment_attention(impl="ring")`` consults it. A global is
# the pragmatic dependency direction (ops must not import parallel eagerly).
_RING_CONTEXT: tuple | None = None  # (mesh, seq_axis, batch_axis)


def set_ring_context(mesh, axis: str = "seq", batch_axis: str | None = "data") -> None:
    """Enable ``impl="ring"`` dispatch: sequence-shard attention over
    ``mesh[axis]`` (ring K/V exchange), batch over ``batch_axis``. Pass
    ``mesh=None`` to clear."""
    global _RING_CONTEXT
    _RING_CONTEXT = None if mesh is None else (mesh, axis, batch_axis)


def get_ring_context():
    return _RING_CONTEXT


def _build_mask(
    q_segments: jnp.ndarray,  # (B, Sq) int
    kv_segments: jnp.ndarray,  # (B, Skv) int
    causal: bool,
    q_offset: int = 0,
) -> jnp.ndarray:
    """(B, Sq, Skv) bool validity mask."""
    valid = (
        (q_segments[:, :, None] == kv_segments[:, None, :])
        & (q_segments[:, :, None] != 0)
        & (kv_segments[:, None, :] != 0)
    )
    if causal:
        sq, skv = q_segments.shape[1], kv_segments.shape[1]
        q_pos = jnp.arange(sq)[:, None] + q_offset
        kv_pos = jnp.arange(skv)[None, :]
        valid = valid & (q_pos >= kv_pos)
    return valid


def _xla_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, H, D)
    v: jnp.ndarray,  # (B, Skv, H, D)
    mask: jnp.ndarray,  # (B, Sq, Skv) bool
    scale: float,
) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
    # fp32 softmax; rows with no valid key must output exactly zero
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - jax.lax.stop_gradient(m))
    unnorm = jnp.where(mask[:, None, :, :], unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def _xla_attention_dense(q, k, v, scale):
    """All-valid bidirectional attention: no mask build, minimal softmax
    passes. The (B, S, S) mask materialization + the extra where/max passes
    cost ~240 ms of the 24-image ViT prefill (measured round 3); serving
    batches are one image per row so every position is valid."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def segment_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segments: jnp.ndarray,
    kv_segments: jnp.ndarray | None = None,
    *,
    causal: bool = False,
    scale: float | None = None,
    impl: str = "auto",
    all_valid: bool = False,
) -> jnp.ndarray:
    """Block-diagonal (optionally causal) attention with segment-id masking.

    Args:
        q: (B, Sq, H, D) queries.
        k, v: (B, Skv, H, D) keys/values.
        q_segments: (B, Sq) int segment ids; 0 marks padding.
        kv_segments: (B, Skv); defaults to ``q_segments`` (self-attention).
        causal: add the lower-triangular constraint (absolute positions).
        scale: logit scale; defaults to ``D ** -0.5``.
        impl: "auto" | "xla" | "pallas".
        all_valid: caller guarantees every q/kv position is a real token in
            one shared segment (e.g. the serving ViT, whose segments are
            built as ones); enables the no-mask fast path for xla
            bidirectional attention. Semantically a no-op.

    Returns: (B, Sq, H, D) in the dtype of ``v``; masked rows are zero.
    """
    self_attn = kv_segments is None
    if kv_segments is None:
        kv_segments = q_segments
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "ring":
        # sequence-parallel ring attention over the context mesh's seq axis;
        # call sites that can't ring (cross-attention, seq not divisible by
        # the ring size) fall back to the local impl — same math, unsharded
        ctx = _RING_CONTEXT
        if ctx is not None:
            mesh, axis, batch_axis = ctx
            n = mesh.shape[axis]
            if self_attn and n > 1 and q.shape[1] % n == 0:
                from ..parallel.ring_attention import ring_segment_attention

                return ring_segment_attention(
                    q, k, v, q_segments, mesh, axis,
                    batch_axis=batch_axis, causal=causal, scale=scale,
                )
        impl = "auto"
    if impl == "auto":
        if all_valid and not causal and jax.default_backend() == "tpu":
            # encoder sites (ViT / SAM): whole-K/V-in-VMEM dense kernel —
            # XLA materializes the (B, H, S, S) fp32 logits (429 ms of the
            # 780 ms B24 ViT prefill) and flash underfeeds the MXU at D=88
            from .dense_attn import dense_attention, fits_dense_kernel

            if fits_dense_kernel(q.shape[1], q.shape[-1]):
                return dense_attention(q, k, v, scale)
        # flash wins where its streaming pays: causal masks (skip half the
        # blocks) or 128-multiple head dims. Bidirectional attention with a
        # padded head dim (EVA ViT: 88 -> 128 lanes, SAM encoder: 64) runs
        # faster as plain XLA batched matmuls — measured on-chip at bench
        # shapes: ViT 559 ms (xla) vs 714 ms (flash) per 16-image prefill.
        use_pallas = jax.default_backend() == "tpu" and (
            causal or q.shape[-1] % 128 == 0
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .flash import flash_segment_attention

        return flash_segment_attention(
            q, k, v, q_segments, kv_segments, causal=causal, scale=scale
        )
    if all_valid and not causal:
        return _xla_attention_dense(q, k, v, scale)
    mask = _build_mask(q_segments, kv_segments, causal)
    return _xla_attention(q, k, v, mask, scale)


def decode_attention(
    q: jnp.ndarray,  # (B, 1, H, D) current-token query
    k_cache: jnp.ndarray,  # (B, Smax, H, D)
    v_cache: jnp.ndarray,  # (B, Smax, H, D)
    kv_valid: jnp.ndarray,  # (B, Smax) bool: which cache slots hold real keys
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Single-token attention against a static KV cache.

    Matches the reference decode path (``modeling_cogvlm.py:129-141``): invalid
    slots are excluded via -inf logits, softmax in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(kv_valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v_cache.dtype), v_cache)
    return out


def decode_attention_bhsd(
    q: jnp.ndarray,  # (B, Sq, H, D) — Sq=1 single-token, Sq=k verify window
    k_cache: jnp.ndarray,  # (B, H, Smax, D) — decode-friendly layout
    v_cache: jnp.ndarray,  # (B, H, Smax, D)
    kv_valid: jnp.ndarray,  # (B, Smax), or (B, Sq, Smax) per-query validity
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Same math as ``decode_attention`` over the (B, H, S, D) cache layout.

    With (b, h) as leading batch dims and d minor, the contraction needs no
    physical cache transpose per step — measured 66% of decode time came from
    attention with the (B, S, H, D) layout.

    A 3-D ``kv_valid`` gives each query position its own cache-slot mask —
    the speculative-decode verify window, where window position j may attend
    only slots < write_index + j + 1 (causal within the window).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, Sq, D)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, k_cache, preferred_element_type=jnp.float32)
    logits = logits * scale
    mask = kv_valid[:, None, None, :] if kv_valid.ndim == 2 else kv_valid[:, None, :, :]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_cache.dtype), v_cache)
    return jnp.swapaxes(out, 1, 2)  # (B, Sq, H, D)
