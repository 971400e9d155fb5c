"""Pallas TPU flash-attention forward kernel with segment-id masking.

Online-softmax (flash) attention: for each (batch, head, q-block) grid cell the
kernel streams K/V blocks from VMEM, keeping running max/denominator, so the
S x S logit matrix is never materialized. Segment-id masking implements
block-diagonal (packed / padded-ragged) attention; the causal variant also
skips K blocks strictly above the diagonal via a data-independent loop bound.

Backward currently recomputes via the XLA reference implementation (sequences
in this framework are <= ~2.5k tokens, so the memory trade is acceptable); a
dedicated flash backward kernel is a planned optimization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _fwd_kernel(
    qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, block_k: int
):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    skv = k_ref.shape[2]
    num_k_blocks = skv // block_k
    iq = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, D)
    qseg = qseg_ref[0, 0].astype(jnp.int32)  # (bq,)
    q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    def body(kb, carry):
        acc, m, l = carry
        # offsets are multiples of block_k (a multiple of 128) — Mosaic needs
        # the lane-dim alignment to be statically provable
        off = pl.multiple_of(kb * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(off, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(off, block_k), :].astype(jnp.float32)
        kseg = kseg_ref[0, 0, pl.ds(off, block_k)].astype(jnp.int32)
        s = lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        mask = (
            (qseg[:, None] == kseg[None, :])
            & (qseg[:, None] != 0)
            & (kseg[None, :] != 0)
        )
        if causal:
            k_pos = kb * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + lax.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    if causal:
        # last K block that any row of this Q block may see
        hi = jnp.minimum(((iq + 1) * block_q - 1) // block_k + 1, num_k_blocks)
    else:
        hi = num_k_blocks
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, hi, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-30)
    out = jnp.where(l > 0, out, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)


def _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    batch, sq, heads, head_dim = q.shape
    skv = k.shape[1]
    # (B, S, H, D) -> (B, H, S, D); XLA fuses these transposes into the producers
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, block_q)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)
    # segment ids ride as (B, 1, S): the TPU lowering requires the last two
    # block dims to be (8k, 128k) or match the array dims — a sublane dim of
    # exactly 1 satisfies the latter.
    qseg = _pad_to(q_segments.astype(jnp.int32), 1, block_q)[:, None, :]
    kseg = _pad_to(kv_segments.astype(jnp.int32), 1, block_k)[:, None, :]
    sq_pad, skv_pad = qt.shape[2], kt.shape[2]
    grid = (batch, heads, sq_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, 1, skv_pad), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq_pad, head_dim), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qseg, kseg, qt, kt, vt)
    return jnp.swapaxes(out[:, :, :sq, :], 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    return _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k)


def _flash_vjp_fwd(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    out = _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k)
    return out, (q, k, v, q_segments, kv_segments)


def _flash_vjp_bwd(causal, scale, block_q, block_k, residuals, g):
    from .attention import _build_mask, _xla_attention

    q, k, v, q_segments, kv_segments = residuals
    mask = _build_mask(q_segments, kv_segments, causal)

    def ref(q_, k_, v_):
        return _xla_attention(q_, k_, v_, mask, scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_segment_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segments: jnp.ndarray,
    kv_segments: jnp.ndarray,
    *,
    causal: bool,
    scale: float,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Flash attention entry point; see ``segment_attention`` for the contract.

    Block sizes stay multiples of 128: Mosaic requires dynamic lane-dim offsets
    to be provably 128-aligned, so shorter sequences are padded up rather than
    shrinking the block.
    """
    if block_q % 128 or block_k % 128:
        raise ValueError(f"block sizes must be multiples of 128, got {block_q}, {block_k}")
    return _flash(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k)
