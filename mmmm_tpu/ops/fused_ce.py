"""Fused (blockwise) cross-entropy over the vocabulary projection.

The naive LM loss materializes fp32 logits (B, S, V) plus a log-softmax
intermediate — at B8 x S1024 x V32k that is ~2 GB of activations, the largest
single buffer in the training step (ROADMAP: "weighted-CE fusion"). This op
computes per-token CE directly from the hidden states and the lm_head in
vocab blocks with a running (max, sumexp) — the flash-attention trick applied
to the softmax-cross-entropy — so peak extra memory is one (T, block_v) f32
buffer. The custom VJP recomputes block logits in the backward pass and
produces dh and d(lm_head) blockwise, every matmul MXU-shaped (bf16 operands,
fp32 accumulation).

Semantics match ``weighted_ce_loss`` (``modeling_cogvlm.py:610-627``): this
op returns raw per-token CE; masking/weighting/normalization stay in the
caller where they are cheap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _pad_vocab(lm_head: jnp.ndarray, block_v: int) -> jnp.ndarray:
    v = lm_head.shape[1]
    v_pad = -(-v // block_v) * block_v
    if v_pad == v:
        return lm_head
    return jnp.pad(lm_head, ((0, 0), (0, v_pad - v)))


def _fwd_scan(hidden, lm_head_p, labels, v_real, block_v):
    """hidden (T, C), lm_head_p (C, V_pad), labels (T,) -> (ce, m, s)."""
    t = hidden.shape[0]
    nb = lm_head_p.shape[1] // block_v

    def body(carry, vb):
        m, s, tgt = carry
        off = vb * block_v
        w_blk = lax.dynamic_slice(lm_head_p, (0, off), (lm_head_p.shape[0], block_v))
        logits = jnp.dot(hidden, w_blk, preferred_element_type=jnp.float32)
        col = off + lax.broadcasted_iota(jnp.int32, (1, block_v), 1)
        logits = jnp.where(col < v_real, logits, NEG_INF)
        bm = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, bm)
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), -1)
        local = labels - off
        in_blk = (local >= 0) & (local < block_v)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, block_v - 1)[:, None], axis=-1
        )[:, 0]
        tgt = jnp.where(in_blk, picked, tgt)
        return (m_new, s, tgt), None

    m0 = jnp.full((t,), NEG_INF, jnp.float32)
    s0 = jnp.zeros((t,), jnp.float32)
    tgt0 = jnp.zeros((t,), jnp.float32)
    (m, s, tgt), _ = lax.scan(body, (m0, s0, tgt0), jnp.arange(nb))
    ce = m + jnp.log(jnp.maximum(s, 1e-30)) - tgt
    return ce, m, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce(hidden, lm_head, labels, block_v: int = 4096):
    """Per-token cross-entropy of ``softmax(hidden @ lm_head)`` vs ``labels``.

    hidden: (T, C) (any float dtype; logits accumulate in fp32 like the
    reference's fp32-logit policy). lm_head: (C, V). labels: (T,) int —
    out-of-range labels (e.g. the CE ignore index) produce garbage CE that
    the caller masks, exactly as with dense logits.
    Returns ce (T,) fp32.
    """
    v = lm_head.shape[1]
    ce, _, _ = _fwd_scan(hidden, _pad_vocab(lm_head, block_v), labels, v, block_v)
    return ce


def _fused_ce_fwd(hidden, lm_head, labels, block_v):
    v = lm_head.shape[1]
    lm_head_p = _pad_vocab(lm_head, block_v)
    ce, m, s = _fwd_scan(hidden, lm_head_p, labels, v, block_v)
    return ce, (hidden, lm_head_p, labels, m, s, v)


def _fused_ce_bwd(block_v, res, g):
    hidden, lm_head_p, labels, m, s, v_real = res
    t, c = hidden.shape
    nb = lm_head_p.shape[1] // block_v
    inv_s = 1.0 / jnp.maximum(s, 1e-30)

    def body(carry, vb):
        dh, dw = carry
        off = vb * block_v
        w_blk = lax.dynamic_slice(lm_head_p, (0, off), (c, block_v))
        logits = jnp.dot(hidden, w_blk, preferred_element_type=jnp.float32)
        col = off + lax.broadcasted_iota(jnp.int32, (1, block_v), 1)
        logits = jnp.where(col < v_real, logits, NEG_INF)
        p = jnp.exp(logits - m[:, None]) * inv_s[:, None]  # (T, bv)
        local = labels - off
        onehot = (col == labels[:, None]).astype(jnp.float32)
        gtok = (p - onehot) * g[:, None]  # dCE/dlogits * upstream
        gtok = gtok.astype(hidden.dtype)
        dh = dh + jnp.dot(gtok, w_blk.T, preferred_element_type=jnp.float32)
        dw_blk = jnp.dot(hidden.T, gtok, preferred_element_type=jnp.float32)
        dw = lax.dynamic_update_slice(dw, dw_blk, (0, off))
        return (dh, dw), None

    dh0 = jnp.zeros((t, c), jnp.float32)
    dw0 = jnp.zeros(lm_head_p.shape, jnp.float32)
    (dh, dw), _ = lax.scan(body, (dh0, dw0), jnp.arange(nb))
    v = v_real
    return dh.astype(hidden.dtype), dw[:, :v].astype(lm_head_p.dtype), None


fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_weighted_ce_loss(
    hidden: jnp.ndarray,  # (B, S, C)
    lm_head: jnp.ndarray,  # (C, V)
    labels: jnp.ndarray,  # (B, S), CE_IGNORE_INDEX marks ignored tokens
    weight: jnp.ndarray | None = None,  # (B, S)
    *,
    ignore_index: int = -100,
    block_v: int = 4096,
) -> jnp.ndarray:
    """Drop-in for ``weighted_ce_loss`` fed hidden states instead of logits:
    weighted sum of per-token CE over non-ignored tokens, normalized by the
    COUNT of non-ignored tokens (weights scale contributions only)."""
    b, s, c = hidden.shape
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    ce = fused_ce(hidden.reshape(b * s, c), lm_head, safe.reshape(-1), block_v)
    ce = ce.reshape(b, s)
    ce = jnp.where(mask, ce, 0.0)
    denom = jnp.maximum(mask.sum(), 1)
    if weight is None:
        return ce.sum() / denom
    return (ce * weight.astype(jnp.float32)).sum() / denom
