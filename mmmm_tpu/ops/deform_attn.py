"""Multi-scale deformable attention (XLA formulation).

Equivalent of detrex's ``MsDeformAttn`` CUDA op (the only native code in the
reference tree, ``scripts/data/vg/MIMIC-CXR/detrex/detrex/layers/csrc/
MsDeformAttn/*``): each query samples ``P`` learned points per head per
feature level by bilinear interpolation and reduces them with learned
weights. On TPU this is gathers + lerps that XLA fuses; no custom kernel is
needed at pseudo-labeling scale. This op is the compute core for the planned
DINO-style detector that replaces the reference's MIMIC-CXR pseudo-box
pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    value: jnp.ndarray,  # (H, W, C)
    points: jnp.ndarray,  # (N, 2) normalized (x, y) in [0, 1]
) -> jnp.ndarray:
    """Bilinear interpolation with zero padding outside (align_corners=False)."""
    h, w, _ = value.shape
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = value[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[:, None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def ms_deform_attn(
    values: list[jnp.ndarray],  # per level (B, H_l, W_l, heads, head_dim)
    sampling_locations: jnp.ndarray,  # (B, Q, heads, L, P, 2) normalized (x, y)
    attention_weights: jnp.ndarray,  # (B, Q, heads, L, P), softmaxed over (L, P)
) -> jnp.ndarray:
    """Returns (B, Q, heads * head_dim)."""
    b, q, heads, num_levels, num_points, _ = sampling_locations.shape
    head_dim = values[0].shape[-1]

    def per_sample(vals, locs, weights):
        # locs (Q, heads, L, P, 2); weights (Q, heads, L, P)
        out = jnp.zeros((q, heads, head_dim), jnp.float32)
        for lvl in range(num_levels):
            v = vals[lvl]  # (H, W, heads, D)
            for hd in range(heads):
                pts = locs[:, hd, lvl].reshape(q * num_points, 2)
                sampled = bilinear_sample(v[:, :, hd], pts).reshape(q, num_points, head_dim)
                out = out.at[:, hd].add(
                    jnp.sum(sampled * weights[:, hd, lvl][:, :, None], axis=1)
                )
        return out.reshape(q, heads * head_dim)

    return jax.vmap(per_sample)(
        tuple(values),
        sampling_locations.astype(jnp.float32),
        attention_weights.astype(jnp.float32),
    )
