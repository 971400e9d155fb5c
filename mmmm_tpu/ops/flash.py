"""Pallas TPU flash attention (forward + backward) with segment-id masking.

Online-softmax (flash) attention: the grid is (batch, head, q-block, k-block)
with the k-block dimension innermost, so K/V arrive as VMEM blocks streamed
(and double-buffered) from HBM by the Pallas pipeline — sequence length is
bounded by HBM, not VMEM. Running max/denominator/accumulator live in VMEM
scratch that persists across the innermost grid dimension; the S x S logit
matrix is never materialized. Segment-id masking implements block-diagonal
(packed / padded-ragged) attention; the causal variant skips the compute for
K blocks strictly above the diagonal via ``pl.when`` (their DMA still streams
— the standard TPU flash trade, cf. jax's reference kernel).

Backward is the standard two-kernel flash recomputation: the forward saves the
per-row logsumexp; ``delta = rowsum(dO * O)`` is computed in XLA; the dq kernel
re-walks K/V blocks per q block (K/V streamed the same way), the dk/dv kernel
re-walks q blocks per K block (q/dO streamed). Memory stays O(S) and every
matmul hits the MXU with fp32 accumulation.

TPU lowering constraints honored throughout (learned on-chip): block sizes are
multiples of 128 so lane-dim offsets are provably aligned; 1-D per-row tensors
(segments, lse, delta) ride with a singleton sublane dim; scratch accumulators
for m/l are lane-width (bq, 128) rather than (bq, 1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _causal_live(iq, ik, block_q, block_k):
    # a (q-block, k-block) cell contributes iff its max q_pos >= min k_pos
    return (iq + 1) * block_q - 1 >= ik * block_k


def _fwd_kernel(
    qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, num_k_blocks: int
):
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def _compute():
        q = q_ref[0, 0]  # (bq, D) input dtype: bf16 ops ride the MXU fast path
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        qseg = qseg_ref[0, 0].astype(jnp.int32)
        kseg = kseg_ref[0, 0].astype(jnp.int32)
        m = m_ref[...][:, :1]  # lanes hold identical copies
        l = l_ref[...][:, :1]
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk) f32
        q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        k_pos = ik * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + lax.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    if causal:
        pl.when(_causal_live(iq, ik, block_q, block_k))(_compute)
    else:
        _compute()

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_ref[...][:, :1]
        m = m_ref[...][:, :1]
        acc = acc_ref[...]
        out = acc / jnp.maximum(l, 1e-30)
        out = jnp.where(l > 0, out, 0.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # per-row logsumexp of the *scaled* logits; finite filler for empty rows
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
        lse_ref[0, 0, 0] = lse[:, 0]


def _dq_kernel(
    qseg_ref, kseg_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref, do_ref, dq_ref,
    dq_acc_ref,
    *, scale: float, causal: bool, num_k_blocks: int
):
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        k_blk = k_ref[0, 0]
        v_blk = v_ref[0, 0]
        qseg = qseg_ref[0, 0].astype(jnp.int32)
        kseg = kseg_ref[0, 0].astype(jnp.int32)
        lse = lse_ref[0, 0, 0].astype(jnp.float32)[:, None]  # (bq, 1)
        delta = delta_ref[0, 0, 0].astype(jnp.float32)[:, None]
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        k_pos = ik * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # (bq, bk)
        dp = lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - delta)
        dq_acc_ref[...] = dq_acc_ref[...] + scale * lax.dot(
            ds.astype(k_blk.dtype), k_blk, preferred_element_type=jnp.float32
        )

    if causal:
        pl.when(_causal_live(iq, ik, block_q, block_k))(_compute)
    else:
        _compute()

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(
    qseg_ref, kseg_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref, do_ref,
    dk_ref, dv_ref, dk_acc_ref, dv_acc_ref,
    *, scale: float, causal: bool, num_q_blocks: int
):
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    def _compute():
        k_blk = k_ref[0, 0]  # (bk, D)
        v_blk = v_ref[0, 0]
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        qseg = qseg_ref[0, 0].astype(jnp.int32)
        kseg = kseg_ref[0, 0].astype(jnp.int32)
        lse = lse_ref[0, 0, 0].astype(jnp.float32)[:, None]
        delta = delta_ref[0, 0, 0].astype(jnp.float32)[:, None]
        s = scale * lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        q_pos = iq * block_q + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        k_pos = ik * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = _mask_block(qseg, kseg, causal, q_pos, k_pos)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_acc_ref[...] = dv_acc_ref[...] + lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, D)
        dp = lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - delta)
        dk_acc_ref[...] = dk_acc_ref[...] + scale * lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, D)

    if causal:
        pl.when(_causal_live(iq, ik, block_q, block_k))(_compute)
    else:
        _compute()

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[...].astype(dv_ref.dtype)


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


_STREAM_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
)


def _flash_fwd_impl(q, k, v, q_segments, kv_segments, causal, scale, block_q, block_k):
    batch, sq, heads, head_dim = q.shape
    qt, kt, vt, qseg, kseg = _prep(q, k, v, q_segments, kv_segments, block_q, block_k)
    sq_pad, skv_pad = qt.shape[2], kt.shape[2]
    num_k_blocks = skv_pad // block_k
    grid = (batch, heads, sq_pad // block_q, num_k_blocks)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, num_k_blocks=num_k_blocks
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, sq_pad, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, 1, sq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, head_dim), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=_STREAM_PARAMS,
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
    num_q_blocks = sq_pad // block_q
    num_k_blocks = skv_pad // block_k
    # delta = rowsum(dO * O) — cheap elementwise, XLA fuses it
    delta = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)[:, :, None, :]

    interpret = jax.default_backend() != "tpu"
    dq_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
        pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, causal=causal, num_k_blocks=num_k_blocks
        ),
        grid=(batch, heads, num_q_blocks, num_k_blocks),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, sq_pad, head_dim), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        compiler_params=_STREAM_PARAMS,
        interpret=interpret,
    )(qseg, kseg, lse, delta, qt, kt, vt, dot)

    # dk/dv: grid is (b, h, k-block, q-block) — q/dO/lse/delta stream innermost
    kv_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, j)),
        pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, i)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, j)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, j)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, j, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, causal=causal, num_q_blocks=num_q_blocks
        ),
        grid=(batch, heads, num_k_blocks, num_q_blocks),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, skv_pad, head_dim), k.dtype),
            jax.ShapeDtypeStruct((batch, heads, skv_pad, head_dim), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, head_dim), jnp.float32),
            pltpu.VMEM((block_k, head_dim), jnp.float32),
        ],
        compiler_params=_STREAM_PARAMS,
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
