"""Big-block dense (all-valid, bidirectional) attention kernel.

The encoder attention sites (EVA ViT, SAM encoder) attend all-to-all within a
bucketed batch — no padding, no packing, no causality. The generic paths are
mis-fit there, measured on-chip at B24 bench shapes (S=1153, H=16, D=88):

  - XLA einsum attention materializes the (B, H, S, S) fp32 logits in HBM and
    re-walks it for the softmax — 429 ms of the 780 ms ViT prefill;
  - the flash kernel (128x128 blocks, online softmax) pays its streaming
    rescale machinery for a sequence that FITS IN VMEM, and at D=88 its tiny
    matmuls underfeed the MXU (1060 ms).

At these sizes the whole K/V plus one fat q-block fit in VMEM at once
(~6 MB), so this kernel does the textbook thing: one (bq, S) logit tile, ONE
full-row fp32 softmax (no online rescaling), one PV matmul — logits never
touch HBM. Grid (B, H, S/bq); D rides as the trailing block dim equal to the
array dim (88 needs no padding under the "equal to array dims" Mosaic rule).

Backward recomputes through the XLA path (``jax.custom_vjp``): training perf
is unchanged, serving prefill gets the fused forward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# per-cell VMEM budget: k+v + q + fp32 logits + bf16 probs + out (bytes)
_VMEM_BUDGET = 12 * 1024 * 1024


def _fast_softmax() -> bool:
    import os

    return os.environ.get("MMMM_DENSE_FAST_SOFTMAX", "0") == "1"


def _softmax_rows(s, v, out_dtype, fast: bool):
    """Shared softmax+PV tail. ``fast``: the (bq, Sp) logit tile is where
    the VPU ops/element budget lives (vitattn probe: the kernel runs at ~8%
    MFU because softmax VPU work, not the matmuls, dominates at S=1153), so
    (a) exp runs on bf16 operands (packed 2/lane) and (b) the row
    normalization moves to the (bq, D) OUTPUT of the PV matmul — Sp/D ~ 15x
    fewer divides. The bf16-exp relative error (~0.4%) is far inside the
    bf16 output rounding; MMMM_DENSE_FAST_SOFTMAX=0 restores the f32 form."""
    m = jnp.max(s, axis=-1, keepdims=True)
    if fast:
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return (o / denom).astype(out_dtype)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_real: int,
            fast_softmax: bool = False):
    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (Sp, D)
    v = v_ref[0, 0]
    s = scale * lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Sp)
    sp = k.shape[0]
    if s_real < sp:  # mask the padded tail columns
        kpos = lax.broadcasted_iota(jnp.int32, (1, sp), 1)
        s = jnp.where(kpos < s_real, s, NEG_INF)
    o_ref[0, 0] = _softmax_rows(s, v, o_ref.dtype, fast_softmax)


def _pick_bq(s_pad: int, d: int) -> int | None:
    # prefer fat q-tiles: each cell re-streams the whole K/V, so fewer cells
    # means proportionally less HBM traffic (bq 640 vs 256 at S=1280: 2.5x)
    for bq in (640, 512, 384, 256, 128):
        if s_pad % bq:
            continue
        need = 2 * s_pad * d * 2 + bq * d * 2 + bq * s_pad * (4 + 2) + bq * d * 4
        if need <= _VMEM_BUDGET:
            return bq
    return None


def fits_dense_kernel(s: int, d: int) -> bool:
    s_pad = -(-s // 128) * 128
    return _pick_bq(s_pad, d) is not None


def _dense_fwd_bhsd(qt, kt, vt, scale, *, s_real: int):
    """The raw pallas call on (B, H, Spad, D) inputs (already transposed and
    S-padded); returns the same layout. Exposed so probes can time the kernel
    with the layout moves hoisted out (scripts/tpu_probes.py vitattn)."""
    b, h, s_pad, d = qt.shape
    bq = _pick_bq(s_pad, d)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, s_real=s_real,
                          fast_softmax=_fast_softmax()),
        grid=(b, h, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i: (bi, hi, i, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, i: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, i: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i: (bi, hi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), vt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt)


def _kernel_bshd(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_real: int,
                 hgrp: int, fast_softmax: bool = False):
    """Layout-native variant: blocks arrive in the layer's natural
    (B, S, H, D) order carrying ``hgrp`` heads (sublane dim — 8 satisfies
    the Mosaic last-two-dims rule where a single head would not), so the
    HBM-level swapaxes+pad round trips of the bhsd path disappear; the
    per-head (S, D) views are VMEM sublane shuffles (~13 ms total at B48
    vs ~100+ ms of HBM transposes). Math identical to ``_kernel``."""
    for h in range(hgrp):
        q = q_ref[0, :, h, :]  # (bq, D)
        k = k_ref[0, :, h, :]  # (Sp, D)
        v = v_ref[0, :, h, :]
        s = scale * lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, Sp)
        sp = k.shape[0]
        if s_real < sp:
            kpos = lax.broadcasted_iota(jnp.int32, (1, sp), 1)
            s = jnp.where(kpos < s_real, s, NEG_INF)
        o_ref[0, :, h, :] = _softmax_rows(s, v, o_ref.dtype, fast_softmax)


def _pick_bq_bshd(s_pad: int, d: int, hgrp: int) -> int | None:
    d_phys = -(-d // 128) * 128  # VMEM pads lanes to 128
    for bq in (640, 512, 384, 256, 128):
        if s_pad % bq:
            continue
        need = (2 * s_pad * hgrp * d_phys * 2      # K + V blocks
                + 2 * bq * hgrp * d_phys * 2       # q + out blocks
                + bq * s_pad * (4 + 2))            # fp32 logits + bf16 probs
        if need <= _VMEM_BUDGET:
            return bq
    return None


def _dense_fwd_bshd(q, k, v, scale):
    """(B, S, H, D) in/out with no HBM transposes: pad S only, grid
    (B, H/hgrp, S/bq); K/V blocks are constant across the innermost q-block
    axis so they stream once per (sample, head-group).

    MEASURED NEGATIVE RESULT (2026-08-20 on-chip): Mosaic cannot lower the
    per-head sublane view ``q_ref[0, :, h, :]`` of an (bq, 8, 88) block —
    "infer-vector-layout: unsupported shape cast" — AND the motivating
    hypothesis died the same day: PROBE_VITATTN_r05 shows the bhsd kernel
    with layouts hoisted runs at the same speed as the full transpose path
    (11.09 vs 11.31 ms/layer at B48), i.e. the transposes the bshd layout
    avoids are nearly free; the kernel itself (softmax VPU chain) is the
    cost. Kept interpret-mode-correct for documentation; MMMM_DENSE_BSHD
    stays default-off."""
    b, s, h, d = q.shape
    s_pad = -(-s // 128) * 128
    hgrp = 8
    bq = _pick_bq_bshd(s_pad, d, hgrp)
    qp, kp, vp = (
        jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0), (0, 0))) for t in (q, k, v)
    )
    out = pl.pallas_call(
        functools.partial(_kernel_bshd, scale=scale, s_real=s, hgrp=hgrp,
                          fast_softmax=_fast_softmax()),
        grid=(b, h // hgrp, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hgrp, d), lambda bi, hi, i: (bi, i, hi, 0)),
            pl.BlockSpec((1, s_pad, hgrp, d), lambda bi, hi, i: (bi, 0, hi, 0)),
            pl.BlockSpec((1, s_pad, hgrp, d), lambda bi, hi, i: (bi, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hgrp, d), lambda bi, hi, i: (bi, i, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :s]


def fits_dense_bshd(s: int, h: int, d: int) -> bool:
    s_pad = -(-s // 128) * 128
    return h % 8 == 0 and _pick_bq_bshd(s_pad, d, 8) is not None


def _dense_fwd(q, k, v, scale):
    b, s, h, d = q.shape
    import os

    if os.environ.get("MMMM_DENSE_BSHD", "0") == "1" and fits_dense_bshd(s, h, d):
        return _dense_fwd_bshd(q, k, v, scale)
    s_pad = -(-s // 128) * 128
    qt, kt, vt = (
        jnp.pad(jnp.swapaxes(t, 1, 2), ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        for t in (q, k, v)
    )
    out = _dense_fwd_bhsd(qt, kt, vt, scale, s_real=s)
    return jnp.swapaxes(out[:, :, :s], 1, 2)  # (B, S, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_attention(q, k, v, scale):
    """All-valid bidirectional attention, (B, S, H, D) -> (B, S, H, D)."""
    return _dense_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return _dense_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, residuals, g):
    # recompute through the XLA dense path: O(S^2) HBM like any XLA bwd, but
    # the backward only runs in training where that is already the baseline
    from .attention import _xla_attention_dense

    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention_dense(q_, k_, v_, scale), q, k, v)
    return vjp(g)


dense_attention.defvjp(_vjp_fwd, _vjp_bwd)
