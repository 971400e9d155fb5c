"""Pallas decode-attention kernel: one query token vs a (B, H, S, D) KV cache.

Decode attention is a pure memory-bandwidth op (per step: read K and V once,
a handful of FLOPs per byte). The XLA einsum pair measured ~25% of HBM
roofline at serving batch sizes; this kernel streams each sample's cache
through VMEM exactly once and does the whole softmax-weighted reduction on
the VPU (matvecs gain nothing from the MXU).

Grid: one cell per batch sample; the head loop is unrolled (H <= 32), all
math fp32, invalid cache slots masked by ``kv_len``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kv_append_kernel(widx_ref, knew_ref, vnew_ref, kblk_ref, vblk_ref, ko_ref, vo_ref):
    """Blend one new K/V row into the aligned 8-slot cache window holding it.

    bf16 tiles the second-minor axis in sublanes, so a 1-slot slice of
    the (B, H, Smax, D) cache is unlowerable in any memory space ("must be
    aligned to tiling"). Instead the BlockSpec index map (scalar-prefetch
    on the write index) selects the aligned 8-slot block [8*(t//8), +8) per
    sample; the kernel rewrites that block with the new row blended in at
    row t%8. Only this 8-slot block moves (H*8*D*2 B ≈ 64 KB/sample), and
    ``input_output_aliases`` pins the output to the input buffer, so the
    append is in-place BY CONSTRUCTION — unlike the vmapped
    dynamic_update_slice this replaces, which lowers to a scatter that
    XLA's TPU emitter pairs with a full-cache copy each decode step when
    the scattered cache also feeds the attention read (measured: ~4.4 ms
    of the 12.75 ms decode step at B40, PROBE_DECODE_r04.jsonl)."""
    i = pl.program_id(0)
    row = widx_ref[i] % 8
    sel = lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == row  # (1, 8, 1)
    ko_ref[0] = jnp.where(sel, knew_ref[0], kblk_ref[0])  # (H, 8, D)
    vo_ref[0] = jnp.where(sel, vnew_ref[0], vblk_ref[0])


def kv_append_pallas(
    k_cache: jnp.ndarray,  # (B, H, Smax, D)
    v_cache: jnp.ndarray,  # (B, H, Smax, D)
    k_new: jnp.ndarray,  # (B, H, 1, D)
    v_new: jnp.ndarray,  # (B, H, 1, D)
    write_index: jnp.ndarray,  # (B,) slot to write per sample
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-place single-token KV-cache append; returns the (aliased) caches.

    On non-TPU backends falls back to the vmapped dynamic_update_slice form
    (bit-identical semantics; the Pallas blocked-blend path needs real Mosaic
    lowering, and on CPU the copy pathology this kernel exists to avoid
    doesn't bind)."""
    b, h, smax, d = k_cache.shape
    # Non-TPU backends keep the DUS form (the copy pathology is a TPU-emitter
    # artifact and the kernel needs real Mosaic lowering); an unaligned Smax
    # (arbitrary demo prompt lengths) also keeps it rather than failing the
    # trace — the 8-slot window needs 8 | Smax. Perf paths align Smax.
    if jax.default_backend() != "tpu" or smax % 8:
        upd = jax.vmap(
            lambda c, u, i: lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
        )
        return upd(k_cache, k_new, write_index), upd(v_cache, v_new, write_index)

    def blk_map(i, widx):
        return (i, 0, widx[i] // 8, 0)

    kc, vc = pl.pallas_call(
        _kv_append_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                # singleton slot dims are legal as BLOCK dims (block == array
                # dims on the last two axes); only sub-tile SLICES are not
                pl.BlockSpec((1, h, 1, d), lambda i, widx: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, d), lambda i, widx: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 8, d), blk_map),
                pl.BlockSpec((1, h, 8, d), blk_map),
            ],
            out_specs=[
                pl.BlockSpec((1, h, 8, d), blk_map),
                pl.BlockSpec((1, h, 8, d), blk_map),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
    )(write_index.astype(jnp.int32), k_new, v_new, k_cache, v_cache)
    return kc, vc


def _kv_append_multi_kernel(
    widx_ref, knew_ref, vnew_ref, kblk_ref, vblk_ref, ko_ref, vo_ref,
    *, n_new: int, n_blocks: int,
):
    """K-row variant of ``_kv_append_kernel`` for the speculative verify
    window: blend rows [t, t+K) into the (up to two) aligned 8-slot blocks
    covering them. Grid is (B, 2): cell j handles block ``min(t//8 + j,
    n_blocks - 1)`` (the same clamped index the BlockSpec maps, so compute
    and copy agree). When the window does not spill into a second block the
    j=1 cell revisits j=0's block and recomputes the identical blend from
    the elided (original) input — a harmless idempotent write."""
    i, j = pl.program_id(0), pl.program_id(1)
    t = widx_ref[i]
    blk = jnp.minimum(t // 8 + j, n_blocks - 1)
    slot = blk * 8 + lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)  # (1, 8, 1)
    out_k, out_v = kblk_ref[0], vblk_ref[0]  # (H, 8, D)
    for r in range(n_new):
        m = slot == t + r
        out_k = jnp.where(m, knew_ref[0, :, r : r + 1, :], out_k)
        out_v = jnp.where(m, vnew_ref[0, :, r : r + 1, :], out_v)
    ko_ref[0] = out_k
    vo_ref[0] = out_v


def kv_append_pallas_multi(
    k_cache: jnp.ndarray,  # (B, H, Smax, D)
    v_cache: jnp.ndarray,  # (B, H, Smax, D)
    k_new: jnp.ndarray,  # (B, H, K, D), K <= 8
    v_new: jnp.ndarray,  # (B, H, K, D)
    write_index: jnp.ndarray,  # (B,) first slot to write per sample
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-place K-token KV-cache append (speculative verify windows).

    The spec verify loop otherwise appends its k-wide window with a vmapped
    dynamic_update_slice — the same scatter whose pairing with the cache
    read makes XLA materialize a full-cache copy per step (the r4 decode
    bisect's ~4.4 ms term; the reason the r4 spec row LOST to greedy at
    equal batch). Two aligned 8-slot blocks per sample move (~256 KB)
    instead of the 2.9 GB cache. CPU/odd-Smax fall back to the DUS form
    (``interpret=True`` forces the kernel semantics on CPU for tests)."""
    b, h, smax, d = k_cache.shape
    n_new = k_new.shape[2]
    if (jax.default_backend() != "tpu" and not interpret) or smax % 8 or n_new > 8:
        upd = jax.vmap(
            lambda c, u, i: lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
        )
        return upd(k_cache, k_new, write_index), upd(v_cache, v_new, write_index)

    n_blocks = smax // 8

    def blk_map(i, j, widx):
        return (i, 0, jnp.minimum(widx[i] // 8 + j, n_blocks - 1), 0)

    kc, vc = pl.pallas_call(
        functools.partial(_kv_append_multi_kernel, n_new=n_new, n_blocks=n_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 2),
            in_specs=[
                pl.BlockSpec((1, h, n_new, d), lambda i, j, widx: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, n_new, d), lambda i, j, widx: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 8, d), blk_map),
                pl.BlockSpec((1, h, 8, d), blk_map),
            ],
            out_specs=[
                pl.BlockSpec((1, h, 8, d), blk_map),
                pl.BlockSpec((1, h, 8, d), blk_map),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret and jax.default_backend() != "tpu",
    )(write_index.astype(jnp.int32), k_new, v_new, k_cache, v_cache)
    return kc, vc


def _kv_append_q8_kernel(
    widx_ref,
    kqn_ref, ksn_ref, vqn_ref, vsn_ref,
    kq_ref, ks_ref, vq_ref, vs_ref,
    kqo_ref, kso_ref, vqo_ref, vso_ref,
):
    """int8-KV variant of _kv_append_kernel: blend the new quantized row +
    its bf16 scale into the aligned 32-slot window (int8 tiles the
    second-minor axis in 32-sublane groups, so the window is 32 slots;
    the bf16 scales ride the same window — 32 is a multiple of their
    8-sublane tile)."""
    i = pl.program_id(0)
    row = widx_ref[i] % 32
    sel = lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1) == row  # (1, 32, 1)
    kqo_ref[0] = jnp.where(sel, kqn_ref[0], kq_ref[0])  # (H, 32, D) int8
    kso_ref[0] = jnp.where(sel, ksn_ref[0], ks_ref[0])  # (H, 32, 1) bf16
    vqo_ref[0] = jnp.where(sel, vqn_ref[0], vq_ref[0])
    vso_ref[0] = jnp.where(sel, vsn_ref[0], vs_ref[0])


def kv_append_pallas_q8(
    cache: dict,  # {"kq","ks","vq","vs"}: (B,H,Smax,D) int8 / (B,H,Smax,1) bf16
    kq_new: jnp.ndarray,  # (B, H, 1, D) int8
    ks_new: jnp.ndarray,  # (B, H, 1, 1) bf16
    vq_new: jnp.ndarray,  # (B, H, 1, D) int8
    vs_new: jnp.ndarray,  # (B, H, 1, 1) bf16
    write_index: jnp.ndarray,  # (B,)
) -> dict:
    """In-place single-token append into the int8-quantized KV cache.

    Same copy pathology as the bf16 path (the vmapped-DUS scatter feeding
    the q8 attention read makes XLA duplicate the whole cache per step),
    and it matters MORE here: int8 KV is the long-context capacity option,
    and the copy scales with Smax — at S=8192 it costs both the bandwidth
    and a transient equal to the entire pool. CPU falls back to DUS."""
    if jax.default_backend() != "tpu":
        upd = jax.vmap(
            lambda c, u, i: lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
        )
        return {
            "kq": upd(cache["kq"], kq_new, write_index),
            "ks": upd(cache["ks"], ks_new, write_index),
            "vq": upd(cache["vq"], vq_new, write_index),
            "vs": upd(cache["vs"], vs_new, write_index),
        }
    b, h, smax, d = cache["kq"].shape
    if smax % 32:
        # the 32-slot window needs an aligned cache length; odd Smax keeps
        # the (slower, copy-prone) DUS form rather than failing the trace —
        # int8 KV is an opt-in capacity path and every serving Smax is a
        # multiple of 32 in practice
        upd = jax.vmap(
            lambda c, u, i: lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
        )
        return {
            "kq": upd(cache["kq"], kq_new, write_index),
            "ks": upd(cache["ks"], ks_new, write_index),
            "vq": upd(cache["vq"], vq_new, write_index),
            "vs": upd(cache["vs"], vs_new, write_index),
        }

    def q_map(i, widx):
        return (i, 0, widx[i] // 32, 0)

    new_specs = [
        pl.BlockSpec((1, h, 1, d), lambda i, widx: (i, 0, 0, 0)),
        pl.BlockSpec((1, h, 1, 1), lambda i, widx: (i, 0, 0, 0)),
    ]
    blk_specs = [
        pl.BlockSpec((1, h, 32, d), q_map),
        pl.BlockSpec((1, h, 32, 1), q_map),
    ]
    kq, ks, vq, vs = pl.pallas_call(
        _kv_append_q8_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=new_specs + new_specs + blk_specs + blk_specs,
            out_specs=blk_specs + blk_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(cache[k].shape, cache[k].dtype)
            for k in ("kq", "ks", "vq", "vs")
        ],
        # inputs: widx(0) kqn(1) ksn(2) vqn(3) vsn(4) kq(5) ks(6) vq(7) vs(8)
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
    )(
        write_index.astype(jnp.int32),
        kq_new, ks_new, vq_new, vs_new,
        cache["kq"], cache["ks"], cache["vq"], cache["vs"],
    )
    return {"kq": kq, "ks": ks, "vq": vq, "vs": vs}


def _decode_kernel(klen_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _, heads, smax, head_dim = k_ref.shape
    klen = klen_ref[pl.program_id(0)]
    slot = lax.broadcasted_iota(jnp.int32, (smax, 1), 0)
    valid = slot < klen
    outs = []
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32)  # (D,)
        k = k_ref[0, h].astype(jnp.float32)  # (S, D)
        v = v_ref[0, h].astype(jnp.float32)  # (S, D)
        s = jnp.sum(k * q[None, :], axis=-1, keepdims=True) * scale  # (S, 1)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
        outs.append(jnp.sum(v * (p / denom), axis=0))  # (D,)
    o_ref[0] = jnp.stack(outs).astype(o_ref.dtype)  # (H, D) single store


def _decode_kernel_q8(klen_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, *, scale: float):
    """Int8-KV variant: K/V stream from HBM as int8 + per-slot bf16 scales
    (half the cache BYTES of bf16 — a capacity option; measured slower than
    bf16 at every S because the (S, D) int8->f32 casts are VPU work that
    scales with S). logits = (q . k_q) * k_s; out = sum (p * v_s) * v_q.

    Grid is (B, H / head_chunk) with chunked K/V blocks: a fully-unrolled
    32-head loop holds every head's f32 temporaries on the scoped-vmem stack
    at once (overflows the 16 MB limit at serving batch sizes), while a
    per-head grid pays dispatch/pipelining overhead 32x per sample — 8-head
    chunks sit in between. q/o carry a singleton slot dim so every block's
    last two dims equal the array dims (Mosaic rule; no dynamic sublane
    indexing)."""
    _, chunk, smax, head_dim = kq_ref.shape
    klen = klen_ref[pl.program_id(0)]
    slot = lax.broadcasted_iota(jnp.int32, (smax, 1), 0)
    valid = slot < klen
    for h in range(chunk):
        q = q_ref[0, h, 0].astype(jnp.float32)  # (D,)
        kq = kq_ref[0, h].astype(jnp.float32)  # (S, D) int8 -> f32 in VMEM
        ks = ks_ref[0, h].astype(jnp.float32)  # (S, 1)
        s = jnp.sum(kq * q[None, :], axis=-1, keepdims=True) * ks * scale  # (S, 1)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
        w = (p / denom) * vs_ref[0, h].astype(jnp.float32)  # (S, 1)
        o_ref[0, h, 0] = jnp.sum(vq_ref[0, h].astype(jnp.float32) * w, axis=0).astype(o_ref.dtype)


def decode_attention_pallas_q8(
    q: jnp.ndarray,  # (B, 1, H, D)
    k_q: jnp.ndarray,  # (B, H, S, D) int8
    k_s: jnp.ndarray,  # (B, H, S, 1) bf16 scales
    v_q: jnp.ndarray,  # (B, H, S, D) int8
    v_s: jnp.ndarray,  # (B, H, S, 1)
    kv_len: jnp.ndarray,  # (B,)
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Int8-KV-cache decode attention; contract matches ``decode_attention_pallas``.
    Dispatches to the ragged (length-aware-read) variant when the cache is
    long enough for skipped blocks to pay (MMMM_RAGGED_DECODE gate).
    MMMM_Q8_MXU=1 opts into the split-int8 MXU kernel — measured SLOWER than
    the VPU-dequant kernel on-chip (see ``_decode_kernel_q8_mxu``), kept as a
    documented negative result."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, _, h, d = q.shape
    smax = k_q.shape[2]
    chunk = 8 if h % 8 == 0 else (4 if h % 4 == 0 else 1)
    # per-cell footprint: (1, chunk, S, D) int8 K+V plus their scales
    full_bytes = 2 * chunk * smax * (d + k_s.dtype.itemsize)
    bs = _ragged_choice(smax, full_bytes, default=False)
    # The MXU kernel's true VMEM footprint includes Mosaic's f32 upcast of
    # each (S, D) int8 matmul operand (~8 bytes/elem live at once); past
    # ~S=1024 at chunk 8 it blows the 16 MB scoped budget, so only route
    # short caches to it.
    mxu_ok = 8 * chunk * smax * d <= _FULL_READ_VMEM_BUDGET
    if bs is None and mxu_ok and os.environ.get("MMMM_Q8_MXU", "0") == "1":
        return decode_attention_pallas_q8_mxu(
            q, k_q, k_s, v_q, v_s, kv_len, scale=scale
        )
    if bs is not None:
        return decode_attention_pallas_q8_ragged(
            q, k_q, k_s, v_q, v_s, kv_len, scale=scale, block_s=bs
        )
    return _decode_attention_pallas_q8_full(
        q, k_q, k_s, v_q, v_s, kv_len, scale=scale
    )


def _decode_attention_pallas_q8_full(q, k_q, k_s, v_q, v_s, kv_len, *, scale):
    """Full-read int8-KV kernel; only lowerable while one sample's chunked
    K+V (+scales) fits VMEM — the dispatcher guards this."""
    b, _, h, d = q.shape
    smax = k_q.shape[2]
    chunk = 8 if h % 8 == 0 else (4 if h % 4 == 0 else 1)
    qh = jnp.swapaxes(q, 1, 2).reshape(b, h, 1, d)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, scale=scale),
        grid=(b, h // chunk),
        in_specs=[
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, 1, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, 1), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, 1, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(kv_len.astype(jnp.int32), qh, k_q, k_s, v_q, v_s)
    return out.reshape(b, 1, h, d)


def _decode_window_kernel(widx_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """K-query verify-window decode attention (speculative decoding).

    Query position j attends cache slots < write_index + j + 1 — causal
    within the freshly-appended window, full over the prefix (the exact
    ``kv_len = write + arange(1, k+1)`` contract of the spec verify loop,
    ``models/speculate.py:171``).

    Layout mirrors the 0.9-of-roofline single-token kernel: grid
    (B, H/chunk) head-chunked cells so DMA pipelines across many parallel
    cells, logits shaped (K, S) — queries on sublanes, cache slots on LANES,
    so the softmax chain runs full-width — and bf16 matmul operands (the
    round-5 gate measured the first cut, grid (B,) + (S, K=8) logits + f32
    operands, at 46 GB/s effective: 8/128 lane occupancy for the whole
    softmax + the slow fp32 MXU path + 48 serial cells)."""
    chunk = q_ref.shape[1]
    smax = k_ref.shape[2]
    nq = q_ref.shape[2]
    t = widx_ref[pl.program_id(0)]
    slot = lax.broadcasted_iota(jnp.int32, (nq, smax), 1)
    qrow = lax.broadcasted_iota(jnp.int32, (nq, smax), 0)
    valid = slot < t + qrow + 1  # (K, S)
    for h in range(chunk):
        q = q_ref[0, h]  # (K, D) bf16
        k = k_ref[0, h]  # (S, D) bf16
        v = v_ref[0, h]  # (S, D) bf16
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (K, S) f32 — slots on lanes
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)  # (K, 1)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        o = lax.dot_general(
            (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, D)
        o_ref[0, h] = o.astype(o_ref.dtype)


def decode_attention_pallas_window(
    q: jnp.ndarray,  # (B, K, H, D) — K verify-window queries
    k_cache: jnp.ndarray,  # (B, H, Smax, D) with the window already appended
    v_cache: jnp.ndarray,  # (B, H, Smax, D)
    write_index: jnp.ndarray,  # (B,) first window slot per sample
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Returns (B, K, H, D). Speculative-verify attention at the single-token
    kernel's bandwidth: the XLA bhsd path this replaces read the cache at
    ~25% of the HBM roofline (and its scatter-paired append copied the whole
    cache), which is why the r4 spec gauge lost to greedy. Falls back to
    None (caller uses the XLA path) when one sample's K+V exceeds VMEM."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, nq, h, d = q.shape
    smax = k_cache.shape[2]
    chunk = 8 if h % 8 == 0 else h  # (B, H/8) grid, q8-kernel lesson
    full_bytes = 2 * chunk * smax * d * k_cache.dtype.itemsize
    if full_bytes > _FULL_READ_VMEM_BUDGET:
        return None
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, K, D)
    out = pl.pallas_call(
        functools.partial(_decode_window_kernel, scale=scale),
        grid=(b, h // chunk),
        in_specs=[
            # rank-1 SMEM blocks must span the whole array; index per cell
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, nq, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, nq, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(write_index.astype(jnp.int32), qh, k_cache, v_cache)
    return jnp.swapaxes(out, 1, 2)


def _decode_kernel_ragged(
    klen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, scale: float, block_s: int, nblk: int,
):
    """Online-softmax decode attention over S blocks (flash-decoding style).

    Grid is (B, nblk) with the KV index map clamping block j to the last
    valid block for the sample: consecutive grid steps that resolve to the
    same block index elide the HBM copy, so cache slots past ``kv_len`` are
    never re-read — the decode read stream scales with the true sequence
    length, not the padded cache size. Compute for fully-invalid blocks is
    skipped via ``pl.when``; the boundary block masks per-slot."""
    i, j = pl.program_id(0), pl.program_id(1)
    klen = klen_ref[i]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kstart = j * block_s

    @pl.when(kstart < klen)
    def _block():
        heads = q_ref.shape[1]
        slot = kstart + lax.broadcasted_iota(jnp.int32, (block_s, 1), 0)
        valid = slot < klen
        for h in range(heads):
            q = q_ref[0, h].astype(jnp.float32)  # (D,)
            k = k_ref[0, h].astype(jnp.float32)  # (bs, D)
            s = jnp.sum(k * q[None, :], axis=-1, keepdims=True) * scale  # (bs, 1)
            s = jnp.where(valid, s, NEG_INF)
            m_prev = m_ref[h]  # (1,)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
            alpha = jnp.exp(m_prev - m_new)  # (1,)
            p = jnp.exp(s - m_new[None, :])
            p = jnp.where(valid, p, 0.0)  # (bs, 1)
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=0)
            acc_ref[h] = acc_ref[h] * alpha + jnp.sum(
                v_ref[0, h].astype(jnp.float32) * p, axis=0
            )
            m_ref[h] = m_new

    @pl.when(j == nblk - 1)
    def _flush():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


def _q14_split(x: jnp.ndarray, amax_axes) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact 14-bit split-int8 encoding: x ≈ (hi*128 + lo) * s with hi, lo
    int8 and s = amax/16256. hi = floor(x14/128) ∈ [-127, 127], lo = x14 -
    128*hi ∈ [0, 127]; both fit int8 so a pair of int8 MXU dots reconstructs
    the 14-bit dot exactly (128*⟨k, hi⟩ + ⟨k, lo⟩)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=amax_axes, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 16256.0
    x14 = jnp.round(xf / s).astype(jnp.int32)
    hi = x14 >> 7  # arithmetic shift = floor division by 128
    lo = x14 - hi * 128
    return hi.astype(jnp.int8), lo.astype(jnp.int8), s


def _decode_kernel_q8_mxu(
    klen_ref, qs_ref, qpair_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
    *, scale: float, chunk: int,
):
    """Int8-KV decode with the contractions expressed as int8 MXU matmuls.

    MEASURED NEGATIVE RESULT (2026-08-18 on-chip, B28 H32 D128 S=320):
    1.410 ms vs 1.106 (VPU-dequant q8) vs 0.854 (bf16 full read). The idea —
    the plain q8 kernel's cost is the (S, D) int8->f32 dequant casts, so feed
    the int8 bytes to the MXU directly:

      logits  = (128*⟨kq, q_hi⟩ + ⟨kq, q_lo⟩) * ks * (qs*scale)   int8xint8->int32
      weights = softmax row, folded with vs, re-split to (w_hi, w_lo)
      out     = (128*⟨vqᵀ, w_hi⟩ + ⟨vqᵀ, w_lo⟩) * ws              int8xint8->int32

    Both splits are exact 14-bit encodings (see _q14_split) and the kernel is
    numerically correct (max_abs_err 0.0039 vs the dequantized reference).
    But Mosaic on this stack has no native si8 matmul path: the VMEM OOM at
    S=2048 (24 MB scoped for an 8 MB f32 image of the int8 operand) shows it
    EMULATES the dot by upcasting the (S, D) operand to f32 — i.e. it does
    the same casts the VPU kernel does, plus matmul padding overhead. Kept
    behind MMMM_Q8_MXU=1 so the experiment is reproducible when Mosaic gains
    a native int8 MXU path. Grid (B, H/chunk) like the plain q8 kernel."""
    i, j = pl.program_id(0), pl.program_id(1)
    _, _, smax, _ = kq_ref.shape
    klen = klen_ref[i]
    slot = lax.broadcasted_iota(jnp.int32, (smax, 1), 0)
    valid = slot < klen
    dot32 = functools.partial(
        lax.dot_general, preferred_element_type=jnp.int32
    )
    for h in range(chunk):
        kq = kq_ref[0, h]  # (S, D) int8, stays int8
        qpair = qpair_ref[0, h]  # (2, D) int8: rows = (hi, lo)
        # (S, D) x (D, 2) int8 matmul on the MXU, int32 accumulation. The
        # 2-column rhs dodges Mosaic's matrix-VECTOR special case (a VPU
        # multiply+reduce that only supports f32); s14 = 128*hi-col + lo-col
        # recombines the exact 14-bit dot.
        sp = dot32(kq, qpair, (((1,), (1,)), ((), ())))  # (S, 2)
        s32 = sp[:, 0:1] * 128 + sp[:, 1:2]  # (S, 1)
        qs = qs_ref[i, j * chunk + h]  # f32 scalar (SMEM)
        s = s32.astype(jnp.float32) * ks_ref[0, h].astype(jnp.float32) * (qs * scale)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
        w = (p / denom) * vs_ref[0, h].astype(jnp.float32)  # (S, 1) >= 0
        wmax = jnp.maximum(jnp.max(w), 1e-30)
        ws = wmax / 16256.0
        w14 = jnp.round(w / ws).astype(jnp.int32)
        whi = w14 >> 7  # [0, 127]
        wpair = jnp.concatenate(
            [whi, w14 - whi * 128], axis=1
        ).astype(jnp.int8)  # (S, 2)
        vq = vq_ref[0, h]  # (S, D) int8
        # contract S: (S, D) x (S, 2) -> (D, 2)
        op = dot32(vq, wpair, (((0,), (0,)), ((), ())))
        o32 = op[:, 0] * 128 + op[:, 1]  # (D,)
        o_ref[0, h, 0] = (o32.astype(jnp.float32) * ws).astype(o_ref.dtype)


def decode_attention_pallas_q8_mxu(
    q: jnp.ndarray,  # (B, 1, H, D)
    k_q: jnp.ndarray,  # (B, H, S, D) int8
    k_s: jnp.ndarray,  # (B, H, S, 1) bf16 scales
    v_q: jnp.ndarray,  # (B, H, S, D) int8
    v_s: jnp.ndarray,  # (B, H, S, 1)
    kv_len: jnp.ndarray,  # (B,)
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """MXU-native int8-KV decode; contract matches ``decode_attention_pallas_q8``."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, _, h, d = q.shape
    smax = k_q.shape[2]
    chunk = 8 if h % 8 == 0 else (4 if h % 4 == 0 else 1)
    qh = jnp.swapaxes(q, 1, 2).reshape(b, h, 1, d)
    qhi, qlo, qs = _q14_split(qh, amax_axes=(-1, -2))
    qpair = jnp.concatenate([qhi, qlo], axis=2)  # (B, H, 2, D)
    qs_bh = qs.reshape(b, h)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8_mxu, scale=scale, chunk=chunk),
        grid=(b, h // chunk),
        in_specs=[
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, h), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, 2, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, chunk, smax, 1), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, 1, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(kv_len.astype(jnp.int32), qs_bh, qpair, k_q, k_s, v_q, v_s)
    return out.reshape(b, 1, h, d)


def _decode_kernel_q8_ragged(
    klen_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref,
    *, scale: float, block_s: int, nblk: int, cast: str = "f32",
):
    """Ragged (length-aware-read) int8-KV decode: the S-block/online-softmax
    structure of ``_decode_kernel_ragged`` x the head-chunked int8 dequant of
    ``_decode_kernel_q8``. Grid (B, H/chunk, nblk); KV blocks past ``kv_len``
    remap to the last valid block (copy elided), so the dominant long-context
    read stream scales with the true sequence length.

    ``cast="bf16"``: dequant the (bs, D) int8 streams to bf16 instead of f32
    — half the retile/multiply register work (bf16 packs 2/lane; the int8
    (32,128)-tile unpack targets (16,128) instead of (8,128)) at the cost of
    bf16 products feeding the f32 reductions. The quantization error floor
    (int8 = 2^-7 relative) dwarfs bf16 rounding, so accuracy is unchanged in
    practice; the probe gate (scripts/tpu_probes.py longctx) measures both."""
    i, j = pl.program_id(0), pl.program_id(2)
    _, chunk, _, _ = kq_ref.shape
    klen = klen_ref[i]
    cdt = jnp.bfloat16 if cast == "bf16" else jnp.float32

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kstart = j * block_s

    @pl.when(kstart < klen)
    def _block():
        slot = kstart + lax.broadcasted_iota(jnp.int32, (block_s, 1), 0)
        valid = slot < klen
        for h in range(chunk):
            q = q_ref[0, h, 0].astype(cdt)  # (D,)
            kq = kq_ref[0, h].astype(cdt)  # (bs, D)
            ks = ks_ref[0, h].astype(jnp.float32)  # (bs, 1)
            # products in ``cast`` precision, reduction accumulated in f32
            s = jnp.sum(
                (kq * q[None, :]).astype(jnp.float32), axis=-1, keepdims=True
            ) * ks * scale
            s = jnp.where(valid, s, NEG_INF)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[None, :])
            p = jnp.where(valid, p, 0.0)
            w = (p * vs_ref[0, h].astype(jnp.float32)).astype(cdt)  # (bs, 1)
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=0)
            acc_ref[h] = acc_ref[h] * alpha + jnp.sum(
                (vq_ref[0, h].astype(cdt) * w).astype(jnp.float32), axis=0
            )
            m_ref[h] = m_new

    @pl.when(j == nblk - 1)
    def _flush():
        o_ref[0, :, 0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)).astype(
            o_ref.dtype
        )


def decode_attention_pallas_q8_ragged(
    q: jnp.ndarray,  # (B, 1, H, D)
    k_q: jnp.ndarray,  # (B, H, S, D) int8
    k_s: jnp.ndarray,  # (B, H, S, 1)
    v_q: jnp.ndarray,  # (B, H, S, D) int8
    v_s: jnp.ndarray,  # (B, H, S, 1)
    kv_len: jnp.ndarray,  # (B,)
    *,
    scale: float | None = None,
    block_s: int,
    cast: str | None = None,
) -> jnp.ndarray:
    """Length-aware int8-KV decode; contract matches ``decode_attention_pallas_q8``.
    ``cast`` (default env MMMM_Q8_CAST or "f32") selects the dequant precision
    — see ``_decode_kernel_q8_ragged``."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if cast is None:
        cast = os.environ.get("MMMM_Q8_CAST", "f32")
    b, _, h, d = q.shape
    smax = k_q.shape[2]
    nblk = smax // block_s
    chunk = 8 if h % 8 == 0 else (4 if h % 4 == 0 else 1)
    qh = jnp.swapaxes(q, 1, 2).reshape(b, h, 1, d)

    def kv_map(i, c, j, klen):
        last = jnp.maximum((klen[i] + block_s - 1) // block_s - 1, 0)
        return (i, c, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel_q8_ragged, scale=scale, block_s=block_s, nblk=nblk,
            cast=cast,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // chunk, nblk),
            in_specs=[
                pl.BlockSpec((1, chunk, 1, d), lambda i, c, j, klen: (i, c, 0, 0)),
                pl.BlockSpec((1, chunk, block_s, d), kv_map),
                pl.BlockSpec((1, chunk, block_s, 1), kv_map),
                pl.BlockSpec((1, chunk, block_s, d), kv_map),
                pl.BlockSpec((1, chunk, block_s, 1), kv_map),
            ],
            out_specs=pl.BlockSpec((1, chunk, 1, d), lambda i, c, j, klen: (i, c, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((chunk, 1), jnp.float32),
                pltpu.VMEM((chunk, 1), jnp.float32),
                pltpu.VMEM((chunk, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(kv_len.astype(jnp.int32), qh, k_q, k_s, v_q, v_s)
    return out.reshape(b, 1, h, d)


def _ragged_block(smax: int) -> int | None:
    """Largest S-block in [8, 128] dividing smax; None if ragged reads can't
    pay (cache too short to skip anything)."""
    if smax <= 128:
        return None
    for bs in (128, 64, 32, 16, 8):
        if smax % bs == 0:
            return bs
    return None


# The full-read kernels load one sample's ENTIRE K+V per grid cell; past this
# footprint Mosaic refuses to lower ("scoped vmem limit exceeded" — measured
# on-chip at S=2048 bf16: 64 MB vs the 16 MB budget), so long caches MUST take
# the blocked ragged kernel regardless of the MMMM_RAGGED_DECODE setting.
_FULL_READ_VMEM_BUDGET = 12 * 1024 * 1024


def _ragged_choice(smax: int, full_read_bytes: int, default: bool) -> int | None:
    """Block size for the ragged kernel, or None to use the full-read kernel.

    On-chip (2026-08-18, B24/B28 H32 D128): the isolated-kernel smoke had
    bf16 ragged ~7% faster at S=320, but END-TO-END serving at B28 measured
    the full read faster (11.91 vs 11.72 rep/s — the serving decode schedule
    spends most steps at S<320 where skipped blocks don't pay), so bf16 now
    defaults to the full read too (MMMM_RAGGED_DECODE=1 opts in). The
    int8-KV ragged kernel measured slower at both S (VPU dequant dominates;
    0.296 vs 0.173 ms at S=320) — q8 likewise defaults to the full read.
    Either way the ragged kernel is forced when the full K+V read cannot
    lower at all (S=2048 bf16: 64 MB > VMEM)."""
    env = os.environ.get("MMMM_RAGGED_DECODE")
    want = default if env is None else env == "1"
    must = full_read_bytes > _FULL_READ_VMEM_BUDGET
    if not (want or must):
        return None
    bs = _ragged_block(smax)
    if bs is None and must:
        raise ValueError(
            f"decode cache smax={smax} needs the blocked ragged kernel (full "
            f"K+V read = {full_read_bytes/2**20:.0f} MB > VMEM) but no block "
            f"in [8,128] divides it — pad the cache length to a multiple of 8"
        )
    return bs


def decode_attention_pallas_ragged(
    q: jnp.ndarray,  # (B, 1, H, D)
    k_cache: jnp.ndarray,  # (B, H, S, D)
    v_cache: jnp.ndarray,  # (B, H, S, D)
    kv_len: jnp.ndarray,  # (B,)
    *,
    scale: float | None = None,
    block_s: int,
) -> jnp.ndarray:
    """Length-aware decode attention: reads only ⌈kv_len/block_s⌉ KV blocks
    per sample. Same contract as ``decode_attention_pallas``."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, _, h, d = q.shape
    smax = k_cache.shape[2]
    nblk = smax // block_s
    qh = jnp.swapaxes(q, 1, 2).reshape(b, h, d)

    def kv_map(i, j, klen):
        last = jnp.maximum((klen[i] + block_s - 1) // block_s - 1, 0)
        return (i, 0, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel_ragged, scale=scale, block_s=block_s, nblk=nblk
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nblk),
            in_specs=[
                pl.BlockSpec((1, h, d), lambda i, j, klen: (i, 0, 0)),
                pl.BlockSpec((1, h, block_s, d), kv_map),
                pl.BlockSpec((1, h, block_s, d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, h, d), lambda i, j, klen: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(kv_len.astype(jnp.int32), qh, k_cache, v_cache)
    return out.reshape(b, 1, h, d)


def decode_attention_pallas(
    q: jnp.ndarray,  # (B, 1, H, D)
    k_cache: jnp.ndarray,  # (B, H, S, D)
    v_cache: jnp.ndarray,  # (B, H, S, D)
    kv_len: jnp.ndarray,  # (B,) number of valid slots
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Returns (B, 1, H, D); same contract as ``decode_attention_bhsd`` with a
    prefix-valid mask (slots [0, kv_len) are real). Dispatches to the ragged
    (length-aware-read) kernel per ``_ragged_choice``: default OFF at serving
    lengths (MMMM_RAGGED_DECODE=1 opts in), forced when the full K+V read
    exceeds VMEM."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, _, h, d = q.shape
    smax = k_cache.shape[2]
    # per-cell footprint: the (1, H, S, D) K+V blocks the full-read kernel loads
    full_bytes = 2 * h * smax * d * k_cache.dtype.itemsize
    bs = _ragged_choice(smax, full_bytes, default=False)
    if bs is not None:
        return decode_attention_pallas_ragged(
            q, k_cache, v_cache, kv_len, scale=scale, block_s=bs
        )
    return _decode_attention_pallas_full(q, k_cache, v_cache, kv_len, scale=scale)


def _decode_attention_pallas_full(q, k_cache, v_cache, kv_len, *, scale):
    """The full-read kernel (one grid cell loads a sample's entire K+V); only
    lowerable while that fits VMEM — the dispatcher guards this."""
    b, _, h, d = q.shape
    smax = k_cache.shape[2]
    qh = jnp.swapaxes(q, 1, 2).reshape(b, h, d)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid=(b,),
        in_specs=[
            # rank-1 SMEM blocks must span the whole array; index per cell
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, smax, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, smax, d), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(kv_len.astype(jnp.int32), qh, k_cache, v_cache)
    return out.reshape(b, 1, h, d)
