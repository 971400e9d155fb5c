"""Fused W4A16 matmul: int4-packed weights dequantized in VMEM (Pallas).

Decode on one chip is HBM-bound on weight reads (ROADMAP: 3.3 GB int8
weights + 2.35 GB KV per step at ~81% of the 819 GB/s roofline). Int4 halves
the weight bytes again, but XLA cannot exploit it: every unpack formulation
(concat, split-matmul, grouped dot) materializes the unpacked int8 tensor to
HBM first — measured 159-178 GB/s effective vs int8's ~400 (round-3 probes).
The unpack has to happen *after* the HBM read, inside the kernel; that is
exactly what this Pallas kernel does: stream the packed (K/2, N) int8 array
through VMEM, sign-extend both nibbles on the VPU, scale by the per-group
factors, and feed bf16 operands to the MXU.

Packing layout ("split halves", chosen so no in-kernel interleave is needed):
``packed[i, n]`` holds original row ``i`` in its low nibble and original row
``K/2 + i`` in its high nibble. A k-block of ``group`` packed rows then covers
exactly one scale group in each half, and the kernel does two matmuls per
block — ``x[:, k-th lo slice] @ w_lo + x[:, k-th hi slice] @ w_hi`` — with the
two x slices delivered by passing ``x`` twice under different index maps.

Scales are per (group of 128 input rows, output column), the standard W4
grouping; per-column-only int4 scales cost too much accuracy on real LLM
weights.

Measured verdict (round 3, one v5e): correct on-chip, but SLOWER than int8
end-to-end — 5.73 vs 9.97 reports/sec at the batch-24 serving bench — because
the per-element VPU unpack+dequant (~6 int/convert ops per packed byte)
outweighs the 1.65 GB/step HBM saving, the same physics that made the int8 KV
kernel lose at short S. W4 therefore ships as a *capacity* option (halve
weight HBM to fit bigger models or longer caches on one chip), not the
serving-throughput default; serving stays W8A16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(K, N) int8 values in [-8, 7] -> (K/2, N) packed int8, split-halves
    layout: low nibble = rows [0, K/2), high nibble = rows [K/2, K)."""
    k = q.shape[0]
    lo = q[: k // 2].astype(jnp.int32)
    hi = q[k // 2 :].astype(jnp.int32)
    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``pack_int4``: (K/2, N) int8 -> (K, N) int8 in [-8, 7]."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _w4_kernel(x_lo_ref, x_hi_ref, q4_ref, s_ref, o_ref, acc_ref, *, g_half, k_blocks):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = q4_ref[...].astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8  # sign-extend low nibble
    hi = p >> 4  # arithmetic shift sign-extends the high nibble
    s_lo = s_ref[pl.ds(k, 1), :].astype(jnp.float32)  # (1, bn)
    s_hi = s_ref[pl.ds(g_half + k, 1), :].astype(jnp.float32)
    w_lo = (lo.astype(jnp.float32) * s_lo).astype(jnp.bfloat16)
    w_hi = (hi.astype(jnp.float32) * s_hi).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        x_lo_ref[...], w_lo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi_ref[...], w_hi, preferred_element_type=jnp.float32)

    @pl.when(k == k_blocks - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4_matmul(
    x: jnp.ndarray,  # (M, K) bf16 activations
    q4: jnp.ndarray,  # (K/2, N) packed int4 weights
    s: jnp.ndarray,  # (K/group, N) fp32 group scales
    out_dtype=None,
) -> jnp.ndarray:
    m, k = x.shape
    k2, n = q4.shape
    g_total = s.shape[0]
    group = k // g_total  # packed rows per k-block == one scale group per half
    assert k == 2 * k2 and k2 % group == 0, (k, k2, group)
    out_dtype = out_dtype or x.dtype

    bn = 512 if n % 512 == 0 else 256
    assert n % bn == 0, f"pad N to a multiple of 256 at quantize time (n={n})"
    bm = m if m <= 256 else 256
    assert m % bm == 0, f"pad M to a multiple of 8 (m={m})"
    k_blocks = k2 // group

    kernel = functools.partial(
        _w4_kernel, g_half=g_total // 2, k_blocks=k_blocks
    )
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, k_blocks),
        in_specs=[
            pl.BlockSpec((bm, group), lambda i, j, kk: (i, kk)),  # x low half
            pl.BlockSpec((bm, group), lambda i, j, kk, _kb=k_blocks: (i, kk + _kb)),
            pl.BlockSpec((group, bn), lambda i, j, kk: (kk, j)),  # packed w
            pl.BlockSpec((g_total, bn), lambda i, j, kk: (0, j)),  # all scales
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, x, q4, s)


def w4_matmul_xla(x, q4, s, out_dtype=None):
    """Reference/CPU path: unpack to int8 in HBM, scale, one bf16 matmul.
    Slower than int8 on TPU (the unpack doesn't fuse) — kernel fallback only."""
    k = 2 * q4.shape[0]
    group = k // s.shape[0]
    w = unpack_int4(q4).astype(jnp.float32) * jnp.repeat(s, group, axis=0)
    y = jnp.dot(x, w.astype(x.dtype))
    return y.astype(out_dtype or x.dtype)
