"""Rotary position embeddings (LLaMA convention, position-id indexed).

Matches the reference semantics (``mmmm/models/cogvlm/modeling_cogvlm.py:145-193``):
``inv_freq = base ** -(2i/d)``, the cos/sin table is ``cat([freqs, freqs], -1)``,
and rotation uses ``rotate_half`` (split-in-half permutation, not interleaved).
Position ids are arbitrary per-token integers (CogVLM's scheme repeats and
freezes positions), so cos/sin are gathered by position id.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(max_pos: int, head_dim: int, base: float = 10000.0, dtype=jnp.float32):
    """Precompute the (max_pos, head_dim) cos/sin tables."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    position_ids: jnp.ndarray,
):
    """Rotate q/k of shape (B, S, H, D) by per-token positions (B, S)."""
    cos_g = cos[position_ids][:, :, None, :].astype(q.dtype)  # (B, S, 1, D)
    sin_g = sin[position_ids][:, :, None, :].astype(q.dtype)
    q_rot = q * cos_g + _rotate_half(q) * sin_g
    k_rot = k * cos_g + _rotate_half(k) * sin_g
    return q_rot, k_rot
