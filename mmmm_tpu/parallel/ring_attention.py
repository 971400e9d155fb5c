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

The ring loop is a ``lax.scan``, so reverse-mode autodiff works out of the
box (each step's rotated K/V are rematerialized from the carried buffers;
residual memory is O(steps x shard) — fine at the scales the trainer runs;
a custom ring VJP that re-rotates instead of saving is the next optimization).
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


def _local_attention(q, k, v, qseg, kseg, q_off, k_off, scale, causal):
    """Single-device flash-style partial: returns (out_unnorm, m, l).

    q (B, Sq, H, D); k/v (B, Sk, H, D); positions are absolute via offsets.
    out_unnorm = sum_j exp(s_j - m) v_j (unnormalized), m/l per (B, Sq, H).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    mask = (
        (qseg[:, :, None] == kseg[:, None, :])
        & (qseg[:, :, None] != 0)
        & (kseg[:, None, :] != 0)
    )
    if causal is not None:
        q_pos = q_off + jnp.arange(q.shape[1])
        k_pos = k_off + jnp.arange(k.shape[1])
        mask = mask & causal(q_pos[:, None], k_pos[None, :])
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


def ring_segment_attention(
    q: jnp.ndarray,  # (B, S, H, D) sequence-sharded over ``axis``
    k: jnp.ndarray,
    v: jnp.ndarray,
    segments: jnp.ndarray,  # (B, S)
    mesh: Mesh,
    axis: str = "model",
    *,
    causal: bool = False,
    scale: float | None = None,
) -> jnp.ndarray:
    """Sequence-parallel segment attention over ``mesh[axis]``.

    Semantics match ``ops.attention.segment_attention`` (block-diagonal by
    nonzero segment id, optional causal, masked rows -> 0); the sequence axis
    of every operand is sharded over ``axis``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    seq_len = q.shape[1]
    if seq_len % n:
        raise ValueError(f"sequence {seq_len} not divisible by ring size {n}")
    shard = seq_len // n

    def local_fn(q, k, v, segments):
        idx = lax.axis_index(axis)
        q_off = idx * shard

        def step(carry, step_i):
            acc, k_cur, v_cur, kseg_cur = carry
            src = (idx + step_i) % n  # shard that k_cur originated from
            k_off = src * shard
            if causal:
                # strictly-later source shards are fully masked; the diagonal
                # shard is lower-triangular; earlier shards are fully live
                cfn = lambda qp, kp: qp >= kp
            else:
                cfn = None
            part = _local_attention(
                q, k_cur, v_cur, segments, kseg_cur, q_off, k_off, scale, cfn
            )
            acc = _merge(acc, part)
            # rotate K/V/segments to the next device on the ring
            perm = [(i, (i - 1) % n) for i in range(n)]
            k_nxt = lax.ppermute(k_cur, axis, perm)
            v_nxt = lax.ppermute(v_cur, axis, perm)
            kseg_nxt = lax.ppermute(kseg_cur, axis, perm)
            return (acc, k_nxt, v_nxt, kseg_nxt), None

        b, sq, h, d = q.shape
        acc0 = (
            jnp.zeros((b, sq, h, d), jnp.float32),
            jnp.full((b, sq, h), NEG_INF, jnp.float32),
            jnp.zeros((b, sq, h), jnp.float32),
        )
        (acc, _, _, _), _ = lax.scan(
            step, (acc0, k, v, segments), jnp.arange(n)
        )
        out, m, l = acc
        out = out / jnp.maximum(l, 1e-30)[..., None]
        out = jnp.where((l > 0)[..., None], out, 0.0)
        return out.astype(v.dtype)

    spec = P(None, axis, None, None)
    seg_spec = P(None, axis)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec, seg_spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, segments)
