"""SAM image encoder: 3-D ViT with variable-z patch embedding.

Equivalent of ``mmmm/models/segvol/modeling/image_encoder.py`` (a MONAI ViT
with xformers varlen attention monkey-patched in). TPU re-design: bucketed
same-shape batches, segment-id flash attention, pre-norm transformer blocks
(x = x + attn(norm1(x)); x = x + mlp(norm2(x))), qkv without bias (MONAI
``qkv_bias=False`` default in ``build_sam.py``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops import layer_norm, segment_attention
from ...ops.gelu import gelu
from ...ops.remat import remat_policy
from ...ops.resample import resample_nd, variable_patch_embed_3d
from .config import SamConfig


def init_encoder_params(key, cfg: SamConfig, dtype=jnp.float32) -> dict:
    c, i, L = cfg.embed_dim, cfg.encoder_mlp_dim, cfg.encoder_num_layers
    ks = iter(jax.random.split(key, 12))
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    return {
        "patch": {
            "proj_w": nrm(next(ks), (c, cfg.in_channels, *cfg.patch_size)),
            "proj_b": jnp.zeros((c,), dtype),
            "pos": nrm(next(ks), (1, c, *cfg.pos_embed_shape)),
        },
        "layers": {
            "qkv_w": nrm(next(ks), (L, c, 3 * c)),
            "out_w": nrm(next(ks), (L, c, c)),
            "out_b": jnp.zeros((L, c), dtype),
            "ln1_w": jnp.ones((L, c), dtype),
            "ln1_b": jnp.zeros((L, c), dtype),
            "ln2_w": jnp.ones((L, c), dtype),
            "ln2_b": jnp.zeros((L, c), dtype),
            "fc1_w": nrm(next(ks), (L, c, i)),
            "fc1_b": jnp.zeros((L, i), dtype),
            "fc2_w": nrm(next(ks), (L, i, c)),
            "fc2_b": jnp.zeros((L, c), dtype),
        },
        "norm_w": jnp.ones((c,), dtype),
        "norm_b": jnp.zeros((c,), dtype),
    }


def _block(x, lp, *, num_heads: int, segments, attn_impl: str):
    b, s, c = x.shape
    d = c // num_heads
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
    qkv = jnp.dot(h, lp["qkv_w"])
    q, k, v = [t.reshape(b, s, num_heads, d) for t in jnp.split(qkv, 3, axis=-1)]
    # segments are built all-ones below (bucketed batches, no packing):
    # the xla path skips the mask build entirely (semantically a no-op)
    attn = segment_attention(
        q, k, v, segments, impl=attn_impl, all_valid=True
    ).reshape(b, s, c)
    x = x + jnp.dot(attn, lp["out_w"]) + lp["out_b"]
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
    h = gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"])
    x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
    return x


def encoder_forward(
    params: dict,
    cfg: SamConfig,
    image: jnp.ndarray,  # (B, C, D, H, W)
    patch_size: tuple[int, int, int],
    *,
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """Returns image embeddings (B, C_e, gd, gh, gw)."""
    x = variable_patch_embed_3d(image, params["patch"]["proj_w"], params["patch"]["proj_b"], patch_size)
    b, c, gd, gh, gw = x.shape
    pos = resample_nd(params["patch"]["pos"].astype(jnp.float32), (gd, gh, gw)).astype(x.dtype)
    x = (x + pos).reshape(b, c, -1).transpose(0, 2, 1)
    segments = jnp.ones((b, x.shape[1]), jnp.int32)
    block = partial(_block, num_heads=cfg.encoder_num_heads, segments=segments, attn_impl=attn_impl)
    if remat:
        block = jax.checkpoint(block, policy=remat_policy(remat))
    x, _ = jax.lax.scan(lambda h, lp: (block(h, lp), None), x, params["layers"])
    x = layer_norm(x, params["norm_w"], params["norm_b"])
    return x.transpose(0, 2, 1).reshape(b, c, gd, gh, gw)
