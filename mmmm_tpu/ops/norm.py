"""Normalization primitives.

Numerics follow the reference stack (``mmmm/models/cogvlm/modeling_cogvlm.py:30-41``):
RMSNorm computes the variance in fp32 and casts back to the input dtype; LayerNorm
is the standard fp32-accumulated affine layer norm. XLA fuses these into the
surrounding matmuls, so no Pallas kernel is needed.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LLaMA-style RMSNorm: fp32 variance, scale, cast back to input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(variance + eps)
    return (weight * xf).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Standard layer norm over the last axis with optional affine params."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * (var + eps) ** -0.5
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out.astype(dtype)
