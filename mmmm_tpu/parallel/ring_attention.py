"""Ring attention: sequence-parallel segment attention over a mesh axis.

Scaling path for long-CT token streams (ROADMAP "sequence/context
parallelism"): Q, K, V and segment ids are sharded along the sequence axis
over a mesh axis; each device computes flash partials against its local K/V
shard, then the K/V shards rotate around the ring via ``lax.ppermute`` —
after ``n`` steps every query has seen every key, with per-step partials
merged exactly in log-sum-exp space (the flash combination rule). Collectives
ride ICI; no device ever holds more than its sequence shard.

Causality with a sharded sequence uses absolute positions: a (q-shard,
k-shard) step is fully live when the K source sits strictly earlier in the
sequence, causal on the diagonal step, and dead when the source is strictly
later (computed but masked out — the ring is lockstep, so skipping would not
save wall-clock).

Backward is a custom VJP that re-runs the ring instead of saving per-step
rotated K/V (plain scan-autodiff would hold O(steps x shard) = a full
sequence copy per device): residuals are just (q, k, v, out, lse) shards.
dK/dV contributions accumulate in buffers that rotate alongside K/V, so after
``n`` steps each device's gradient arrives back home — the standard
ring-attention backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_mask(qseg, kseg, q_off, k_off, sq, sk, causal):
    """(B, Sq, Sk) validity mask for one (q-shard, k-shard) pair."""
    mask = (
        (qseg[:, :, None] == kseg[:, None, :])
        & (qseg[:, :, None] != 0)
        & (kseg[:, None, :] != 0)
    )
    if causal:
        q_pos = q_off + jnp.arange(sq)
        k_pos = k_off + jnp.arange(sk)
        mask = mask & (q_pos[:, None] >= k_pos[None, :])
    return mask


def _local_attention(q, k, v, qseg, kseg, q_off, k_off, scale, causal):
    """Single-device flash-style partial: returns (out_unnorm, m, l).

    q (B, Sq, H, D); k/v (B, Sk, H, D); positions are absolute via offsets.
    out_unnorm = sum_j exp(s_j - m) v_j (unnormalized), m/l per (B, Sq, H).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    mask = _block_mask(qseg, kseg, q_off, k_off, q.shape[1], k.shape[1], causal)
    s = jnp.where(mask[:, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (B, H, Sq)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask[:, None], p, 0.0)
    l = p.sum(-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return out.astype(jnp.float32), m.transpose(0, 2, 1), l.transpose(0, 2, 1)


def _merge(acc, new):
    """Log-sum-exp merge of flash partials: (out_unnorm, m, l) pairs."""
    out_a, m_a, l_a = acc
    out_n, m_n, l_n = new
    m = jnp.maximum(m_a, m_n)
    a = jnp.exp(m_a - m)
    n = jnp.exp(m_n - m)
    out = out_a * a[..., None] + out_n * n[..., None]
    return out, m, l_a * a + l_n * n


def _ring_perm(n):
    return [(i, (i - 1) % n) for i in range(n)]


def _fwd_local(axis, n, shard, scale, causal, q, k, v, segments):
    """Per-device forward; returns (out, lse) with lse = m + log(l)."""
    idx = lax.axis_index(axis)
    q_off = idx * shard

    def step(carry, step_i):
        acc, k_cur, v_cur, kseg_cur = carry
        src = (idx + step_i) % n
        part = _local_attention(
            q, k_cur, v_cur, segments, kseg_cur, q_off, src * shard, scale, causal
        )
        acc = _merge(acc, part)
        perm = _ring_perm(n)
        return (
            acc,
            lax.ppermute(k_cur, axis, perm),
            lax.ppermute(v_cur, axis, perm),
            lax.ppermute(kseg_cur, axis, perm),
        ), None

    b, sq, h, d = q.shape
    acc0 = (
        jnp.zeros((b, sq, h, d), jnp.float32),
        jnp.full((b, sq, h), NEG_INF, jnp.float32),
        jnp.zeros((b, sq, h), jnp.float32),
    )
    (acc, _, _, _), _ = lax.scan(step, (acc0, k, v, segments), jnp.arange(n))
    out_u, m, l = acc
    out = out_u / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.where((l > 0)[..., None], out, 0.0)
    lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
    return out.astype(v.dtype), lse


def _bwd_local(axis, n, shard, scale, causal, q, k, v, segments, out, lse, g):
    """Per-device backward ring: recompute probabilities per step; dK/dV
    accumulators travel with K/V and arrive home after n rotations."""
    idx = lax.axis_index(axis)
    q_off = idx * shard
    gf = g.astype(jnp.float32)
    of = out.astype(jnp.float32)
    delta = jnp.sum(gf * of, axis=-1)  # (B, Sq, H)
    qf = q.astype(jnp.float32)

    def step(carry, step_i):
        dq, k_cur, v_cur, kseg_cur, dk_acc, dv_acc = carry
        src = (idx + step_i) % n
        k_off = src * shard
        kf = k_cur.astype(jnp.float32)
        vf = v_cur.astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        mask = _block_mask(segments, kseg_cur, q_off, k_off,
                           q.shape[1], k_cur.shape[1], causal)
        p = jnp.where(mask[:, None], jnp.exp(s - lse.transpose(0, 2, 1)[..., None]), 0.0)
        dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
        ds = p * (dp - delta.transpose(0, 2, 1)[..., None]) * scale
        dq = dq + jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
        dk_c = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
        dv_c = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
        perm = _ring_perm(n)
        return (
            dq,
            lax.ppermute(k_cur, axis, perm),
            lax.ppermute(v_cur, axis, perm),
            lax.ppermute(kseg_cur, axis, perm),
            lax.ppermute(dk_acc + dk_c, axis, perm),
            lax.ppermute(dv_acc + dv_c, axis, perm),
        ), None

    b, sq, h, d = q.shape
    zeros_q = jnp.zeros((b, sq, h, d), jnp.float32)
    zeros_k = jnp.zeros(k.shape, jnp.float32)
    (dq, _, _, _, dk, dv), _ = lax.scan(
        step, (zeros_q, k, v, segments, zeros_k, zeros_k), jnp.arange(n)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _ring(mesh, axis, batch_axis, causal, scale, q, k, v, segments):
    out, _ = _ring_call(mesh, axis, batch_axis, causal, scale, q, k, v, segments)
    return out


def _ring_call(mesh, axis, batch_axis, causal, scale, q, k, v, segments):
    n = mesh.shape[axis]
    shard = q.shape[1] // n
    spec = P(batch_axis, axis, None, None)
    seg_spec = P(batch_axis, axis)
    return shard_map(
        functools.partial(_fwd_local, axis, n, shard, scale, causal),
        mesh=mesh,
        in_specs=(spec, spec, spec, seg_spec),
        out_specs=(spec, P(batch_axis, axis, None)),
        check_vma=False,
    )(q, k, v, segments)


def _ring_fwd(mesh, axis, batch_axis, causal, scale, q, k, v, segments):
    out, lse = _ring_call(mesh, axis, batch_axis, causal, scale, q, k, v, segments)
    return out, (q, k, v, segments, out, lse)


def _ring_bwd(mesh, axis, batch_axis, causal, scale, res, g):
    q, k, v, segments, out, lse = res
    n = mesh.shape[axis]
    shard = q.shape[1] // n
    spec = P(batch_axis, axis, None, None)
    seg_spec = P(batch_axis, axis)
    dq, dk, dv = shard_map(
        functools.partial(_bwd_local, axis, n, shard, scale, causal),
        mesh=mesh,
        in_specs=(spec, spec, spec, seg_spec, spec, P(batch_axis, axis, None), spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )(q, k, v, segments, out, lse, g)
    return dq, dk, dv, None


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_segment_attention(
    q: jnp.ndarray,  # (B, S, H, D) sequence-sharded over ``axis``
    k: jnp.ndarray,
    v: jnp.ndarray,
    segments: jnp.ndarray,  # (B, S)
    mesh: Mesh,
    axis: str = "model",
    *,
    batch_axis: str | None = None,
    causal: bool = False,
    scale: float | None = None,
) -> jnp.ndarray:
    """Sequence-parallel segment attention over ``mesh[axis]``.

    Semantics match ``ops.attention.segment_attention`` (block-diagonal by
    nonzero segment id, optional causal, masked rows -> 0); the sequence axis
    of every operand is sharded over ``axis``. ``batch_axis`` additionally
    shards the batch dim (composes with data parallelism — without it the
    shard_map would all-gather the batch across ``data`` ranks).
    Differentiable with O(shard) residual memory (custom ring VJP).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"sequence {q.shape[1]} not divisible by ring size {n}")
    return _ring(mesh, axis, batch_axis, causal, float(scale), q, k, v, segments)
