"""EVA2-CLIP 3-D vision tower (CogVLM's image encoder, generalized to volumes).

Re-design of ``mmmm/models/cogvlm/visual.py`` for TPU:
  - batches are same-shaped (bucketed) instead of ragged lists: image
    (B, C, D, H, W) with static per-bucket ``patch_size`` / ``pool_size``,
    so every step compiles once per bucket and runs entirely on the MXU;
  - the variable-depth patch conv uses the runtime-collapsed kernel
    (``ops.resample``), matching ``resample.Downsample``;
  - the 3-D position embedding (stored on the (8, 32, 32) grid) is linearly
    resampled to each bucket's token grid, as in ``visual.py:66``;
  - attention is the segment-id flash kernel (bidirectional, one segment per
    image) replacing xformers ``BlockDiagonalMask`` packing (``visual.py:76``).

Post-norm layer structure (``visual.py:134-141``): x = x + ln1(attn(x)),
x = x + ln2(mlp(x)) — note the norm wraps the sublayer *output*, unlike
standard pre-norm ViTs.

Output: per image, ``boi ++ GLU(maxpool(tokens)) ++ eoi`` — (B, 2 + T', C_llm),
spliced into the LLM sequence by the caller (``modeling_cogvlm.py:449-453``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops import layer_norm, segment_attention
from ...ops.remat import remat_policy
from ...ops.resample import resample_nd, variable_patch_embed_3d
from .config import CogVLMConfig, VisionConfig



# The EVA reference uses exact (erf) GELU; ops/gelu.py dispatches bf16 to a
# fitted tanh-form kernel that is both ~erf-chain-exact (correctly rounded at
# bf16) and as fast as the tanh approximation (~69 ms cheaper per 24-image
# prefill on v5e). MMMM_GELU / legacy MMMM_FAST_GELU env knobs override.
from ...ops.gelu import gelu as _gelu

def init_vit_params(key, cfg: CogVLMConfig, dtype=jnp.float32) -> dict:
    v = cfg.vision
    ks = iter(jax.random.split(key, 24))
    c, i, L = v.hidden_size, v.intermediate_size, v.num_hidden_layers
    cl, il = cfg.hidden_size, cfg.intermediate_size
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    return {
        "patch": {
            "proj_w": nrm(next(ks), (c, v.in_channels, *v.patch_size)),
            "proj_b": jnp.zeros((c,), dtype),
            "cls": jnp.zeros((1, c), dtype),
            "cls_pos": jnp.zeros((1, c), dtype),
            "pos": nrm(next(ks), (1, c, *v.pos_embed_shape)),
        },
        "layers": {
            "qkv_w": nrm(next(ks), (L, c, 3 * c)),
            "qkv_b": jnp.zeros((L, 3 * c), dtype),
            "dense_w": nrm(next(ks), (L, c, c)),
            "dense_b": jnp.zeros((L, c), dtype),
            "ln1_w": jnp.ones((L, c), dtype),
            "ln1_b": jnp.zeros((L, c), dtype),
            "ln2_w": jnp.ones((L, c), dtype),
            "ln2_b": jnp.zeros((L, c), dtype),
            "fc1_w": nrm(next(ks), (L, c, i)),
            "fc1_b": jnp.zeros((L, i), dtype),
            "fc2_w": nrm(next(ks), (L, i, c)),
            "fc2_b": jnp.zeros((L, c), dtype),
        },
        "glu": {
            "linear_proj": nrm(next(ks), (c, cl)),
            "ln_w": jnp.ones((cl,), dtype),
            "ln_b": jnp.zeros((cl,), dtype),
            "gate": nrm(next(ks), (cl, il)),
            "h4h": nrm(next(ks), (cl, il)),
            "4hh": nrm(next(ks), (il, cl)),
        },
        "boi": jnp.zeros((cl,), dtype),
        "eoi": jnp.zeros((cl,), dtype),
    }


def _vit_layer(x, lp, *, num_heads: int, eps: float, segments, attn_impl: str):
    b, s, c = x.shape
    # head_dim comes from the weight (it may be lane-padded for serving,
    # see ``pad_attention_heads``); the softmax scale always uses the TRUE
    # head dim so padded and unpadded weights are numerically identical
    head_dim = lp["qkv_w"].shape[-1] // (3 * num_heads)
    scale = (c // num_heads) ** -0.5
    # attention sublayer, post-norm
    qkv = jnp.dot(x, lp["qkv_w"]) + lp["qkv_b"]
    q, k, v = jnp.split(qkv.reshape(b, s, 3 * num_heads, head_dim), 3, axis=2)
    # vit_forward builds segments as all-ones (bucketed batches, one image
    # per row — no packing), so the xla path can skip the mask entirely
    attn = segment_attention(
        q, k, v, segments, impl=attn_impl, scale=scale, all_valid=True
    )
    attn = jnp.dot(attn.reshape(b, s, num_heads * head_dim), lp["dense_w"]) + lp["dense_b"]
    x = x + layer_norm(attn, lp["ln1_w"], lp["ln1_b"], eps)
    # MLP sublayer, post-norm
    h = _gelu(jnp.dot(x, lp["fc1_w"]) + lp["fc1_b"])
    h = jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
    x = x + layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
    return x


def pad_attention_heads(vit_params: dict, num_heads: int, target: int = 128) -> dict:
    """Lossless serving transform: pad every attention head from its native
    dim (EVA: 1408/16 = 88) to ``target`` lanes with zeros.

    Zero-padded q/k lanes leave the logits unchanged (the scale stays at the
    true ``88**-0.5``); zero-padded v lanes produce zero output lanes which
    the zero-padded dense rows then ignore — the forward is bit-identical.
    What it buys on TPU: head_dim 88 wastes 31% of MXU lanes in both
    attention matmuls and forces the flash kernel off (``segment_attention``
    "auto" needs 128-multiple head dims); padding at the *weight* level costs
    nothing at runtime, unlike padding activations every layer.
    """
    p = dict(vit_params)
    layers = dict(p["layers"])
    ell, c, three_c = layers["qkv_w"].shape
    d = c // num_heads
    if d == target:
        return vit_params

    def pad_last(a, from_d, shape_head):
        # reshape trailing (…, H*from_d) -> (…, H, from_d), pad, flatten back
        lead = a.shape[:-1]
        a = a.reshape(*lead, *shape_head, from_d)
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, target - from_d)])
        return a.reshape(*lead, -1)

    layers["qkv_w"] = pad_last(layers["qkv_w"], d, (3, num_heads))
    layers["qkv_b"] = pad_last(layers["qkv_b"], d, (3, num_heads))
    dw = layers["dense_w"].reshape(ell, num_heads, d, c)
    dw = jnp.pad(dw, ((0, 0), (0, 0), (0, target - d), (0, 0)))
    layers["dense_w"] = dw.reshape(ell, num_heads * target, c)
    p["layers"] = layers
    return p


def vit_forward(
    params: dict,
    cfg: CogVLMConfig,
    image: jnp.ndarray,  # (B, C, D, H, W)
    patch_size: tuple[int, int, int],
    pool_size: tuple[int, int, int],
    *,
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """Encode a bucketed image batch to LLM-space tokens (B, 2 + T', C_llm)."""
    v = cfg.vision
    x = variable_patch_embed_3d(image, params["patch"]["proj_w"], params["patch"]["proj_b"], patch_size)
    b, c, gd, gh, gw = x.shape
    pos = resample_nd(params["patch"]["pos"].astype(jnp.float32), (gd, gh, gw)).astype(x.dtype)
    x = (x + pos).reshape(b, c, gd * gh * gw).transpose(0, 2, 1)  # (B, T, C)
    cls = (params["patch"]["cls"] + params["patch"]["cls_pos"]).astype(x.dtype)
    x = jnp.concatenate([jnp.broadcast_to(cls[None], (b, 1, c)), x], axis=1)
    s = x.shape[1]
    segments = jnp.ones((b, s), jnp.int32)

    layer = partial(
        _vit_layer, num_heads=v.num_heads, eps=v.layer_norm_eps, segments=segments, attn_impl=attn_impl
    )
    if remat:
        layer = jax.checkpoint(layer, policy=remat_policy(remat))

    def scan_body(h, lp):
        return layer(h, lp), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])

    x = x[:, 1:]  # drop cls
    if any(p > 1 for p in pool_size):
        x = x.transpose(0, 2, 1).reshape(b, c, gd, gh, gw)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, *pool_size), (1, 1, *pool_size), "VALID"
        )
        x = x.reshape(b, c, -1).transpose(0, 2, 1)

    g = params["glu"]
    x = jnp.dot(x, g["linear_proj"])
    x = _gelu(layer_norm(x, g["ln_w"], g["ln_b"]))
    x = jax.nn.silu(jnp.dot(x, g["gate"])) * jnp.dot(x, g["h4h"])
    x = jnp.dot(x, g["4hh"])
    boi = jnp.broadcast_to(params["boi"].astype(x.dtype)[None, None], (b, 1, x.shape[-1]))
    eoi = jnp.broadcast_to(params["eoi"].astype(x.dtype)[None, None], (b, 1, x.shape[-1]))
    return jnp.concatenate([boi, x, eoi], axis=1)
