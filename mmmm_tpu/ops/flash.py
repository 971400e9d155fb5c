"""Pallas TPU flash attention (forward + backward) with segment-id masking.

Online-softmax (flash) attention: for each (batch, head, q-block) grid cell the
kernel streams K/V blocks, keeping running max/denominator, so the S x S logit
matrix is never materialized. Segment-id masking implements block-diagonal
(packed / padded-ragged) attention; the causal variant skips K blocks strictly
above the diagonal via data-independent loop bounds.

Backward is the standard two-kernel flash recomputation: the forward saves the
per-row logsumexp; ``delta = rowsum(dO * O)`` is computed in XLA; the dq kernel
re-walks K/V blocks per q block, the dk/dv kernel re-walks q blocks per K
block. Memory stays O(S), and every matmul hits the MXU in fp32 accumulation.

TPU lowering constraints honored throughout (learned on-chip): block sizes are
multiples of 128 so dynamic lane-dim offsets are provably aligned, and 1-D
per-row tensors (segments, lse, delta) ride with a singleton sublane dim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _mask_block(qseg, kseg, causal, q_pos, k_pos):
    mask = (
        (qseg[:, None] == kseg[None, :])
        & (qseg[:, None] != 0)
        & (kseg[None, :] != 0)
    )
    if causal:
        mask = mask & (q_pos >= k_pos)
    return mask


def _fwd_kernel(
    qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, scale: float, causal: bool, block_k: int
):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    skv = k_ref.shape[2]
    num_k_blocks = skv // block_k
    iq = pl.program_id(2)

    q = q_ref[0, 0]  # (bq, D) in input dtype: bf16 ops ride the MXU fast path
    qseg = qseg_ref[0, 0].astype(jnp.int32)  # (bq,)
    q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    def body(kb, carry):
        acc, m, l = carry
        off = pl.multiple_of(kb * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(off, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(off, block_k), :]
        kseg = kseg_ref[0, 0, pl.ds(off, block_k)].astype(jnp.int32)
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk) f32
        k_pos = kb * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + lax.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    if causal:
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
    # per-row logsumexp of the *scaled* logits; finite filler for empty rows
    lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
    lse_ref[0, 0, 0] = lse[:, 0]


def _dq_kernel(
    qseg_ref, kseg_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref, do_ref, dq_ref,
    *, scale: float, causal: bool, block_k: int
):
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    num_k_blocks = k_ref.shape[2] // block_k
    iq = pl.program_id(2)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    qseg = qseg_ref[0, 0].astype(jnp.int32)
    lse = lse_ref[0, 0, 0].astype(jnp.float32)[:, None]  # (bq, 1)
    delta = delta_ref[0, 0, 0].astype(jnp.float32)[:, None]
    q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    def body(kb, dq):
        off = pl.multiple_of(kb * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(off, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(off, block_k), :]
        kseg = kseg_ref[0, 0, pl.ds(off, block_k)].astype(jnp.int32)
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_pos = kb * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # (bq, bk)
        dp = lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - delta)
        return dq + scale * lax.dot(
            ds.astype(k_blk.dtype), k_blk, preferred_element_type=jnp.float32
        )

    if causal:
        hi = jnp.minimum(((iq + 1) * block_q - 1) // block_k + 1, num_k_blocks)
    else:
        hi = num_k_blocks
    dq = lax.fori_loop(0, hi, body, jnp.zeros((block_q, head_dim), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    qseg_ref, kseg_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref, do_ref,
    dk_ref, dv_ref, *, scale: float, causal: bool, block_q: int
):
    block_k = k_ref.shape[2]
    head_dim = k_ref.shape[3]
    num_q_blocks = q_ref.shape[2] // block_q
    ik = pl.program_id(2)

    k_blk = k_ref[0, 0]  # (bk, D)
    v_blk = v_ref[0, 0]
    kseg = kseg_ref[0, 0].astype(jnp.int32)
    k_pos = ik * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)

    def body(qb, carry):
        dk, dv = carry
        off = pl.multiple_of(qb * block_q, block_q)
        q = q_ref[0, 0, pl.ds(off, block_q), :]
        do = do_ref[0, 0, pl.ds(off, block_q), :]
        qseg = qseg_ref[0, 0, pl.ds(off, block_q)].astype(jnp.int32)
        lse = lse_ref[0, 0, 0, pl.ds(off, block_q)].astype(jnp.float32)[:, None]
        delta = delta_ref[0, 0, 0, pl.ds(off, block_q)].astype(jnp.float32)[:, None]
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        q_pos = qb * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_new = dv + lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, D)
        dp = lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - delta)
        dk_new = dk + scale * lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, D)
        return dk_new, dv_new

    lo = (ik * block_k) // block_q if causal else 0
    zeros = jnp.zeros((block_k, head_dim), jnp.float32)
    dk, dv = lax.fori_loop(lo, num_q_blocks, body, (zeros, zeros))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)


def _prep(q, k, v, q_segments, kv_segments, block_q, block_k):
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, block_q)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)
    # 1-D per-row tensors ride as (B, 1, S): the last two block dims must be
    # (8k, 128k) or match the array dims; a singleton sublane satisfies it
    qseg = _pad_to(q_segments.astype(jnp.int32), 1, block_q)[:, None, :]
    kseg = _pad_to(kv_segments.astype(jnp.int32), 1, block_k)[:, None, :]
    return qt, kt, vt, qseg, kseg


def _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    batch, sq, heads, head_dim = q.shape
    qt, kt, vt, qseg, kseg = _prep(q, k, v, q_segments, kv_segments, block_q, block_k)
    sq_pad, skv_pad = qt.shape[2], kt.shape[2]
    grid = (batch, heads, sq_pad // block_q)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, 1, skv_pad), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, sq_pad, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, 1, sq_pad), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qseg, kseg, qt, kt, vt)
    return jnp.swapaxes(out[:, :, :sq, :], 1, 2), lse


def _flash_bwd_impl(
    q, k, v, q_segments, kv_segments, out, lse, g, causal, scale, block_q, block_k
):
    batch, sq, heads, head_dim = q.shape
    skv = k.shape[1]
    qt, kt, vt, qseg, kseg = _prep(q, k, v, q_segments, kv_segments, block_q, block_k)
    dot = _pad_to(jnp.swapaxes(g, 1, 2), 2, block_q)  # (B, H, Sq_pad, D)
    ot = _pad_to(jnp.swapaxes(out, 1, 2), 2, block_q)
    sq_pad, skv_pad = qt.shape[2], kt.shape[2]
    # delta = rowsum(dO * O) — cheap elementwise, XLA fuses it
    delta = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)[:, :, None, :]

    common_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b, h, i: (b, 0, i)),
        pl.BlockSpec((1, 1, skv_pad), lambda b, h, i: (b, 0, 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, skv_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
    ]
    interpret = jax.default_backend() != "tpu"
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal, block_k=block_k),
        grid=(batch, heads, sq_pad // block_q),
        in_specs=common_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq_pad, head_dim), q.dtype),
        interpret=interpret,
    )(qseg, kseg, lse, delta, qt, kt, vt, dot)

    kv_specs = [
        pl.BlockSpec((1, 1, sq_pad), lambda b, h, i: (b, 0, 0)),
        pl.BlockSpec((1, 1, block_k), lambda b, h, i: (b, 0, i)),
        pl.BlockSpec((1, 1, 1, sq_pad), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, 1, sq_pad), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, sq_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, sq_pad, head_dim), lambda b, h, i: (b, h, 0, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal, block_q=block_q),
        grid=(batch, heads, skv_pad // block_k),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i: (b, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, skv_pad, head_dim), k.dtype),
            jax.ShapeDtypeStruct((batch, heads, skv_pad, head_dim), v.dtype),
        ),
        interpret=interpret,
    )(qseg, kseg, lse, delta, qt, kt, vt, dot)
    dq = jnp.swapaxes(dq[:, :, :sq, :], 1, 2)
    dk = jnp.swapaxes(dk[:, :, :skv, :], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :skv, :], 1, 2)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    out, _ = _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k)
    return out


def _flash_vjp_fwd(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k)
    return out, (q, k, v, q_segments, kv_segments, out, lse)


def _flash_vjp_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, q_segments, kv_segments, out, lse = residuals
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, q_segments, kv_segments, out, lse, g, causal, scale, block_q, block_k
    )
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
