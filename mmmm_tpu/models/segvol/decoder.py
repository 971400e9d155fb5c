"""SAM prompt encoder + two-way transformer mask decoder.

Equivalents of ``mmmm/models/segvol/modeling/{prompt_encoder,mask_decoder,
transformer}.py``. The text-embedding prompt path is the one exercised by
MMMM (prompts come from ``vg_proj`` of LLM hidden states, or a CLIP text
encoder in stage 0); the point/box/mask prompt paths are ALSO implemented
(``encode_point_prompt`` / ``encode_box_prompt`` / ``encode_mask_prompt``
below, incl. the padding-point and label-identity rules — ref
prompt_encoder.py:60-107) and covered by tests/test_prompt_encoder.py.

The decoder runs per (sample, target) pair; callers vmap it over a padded,
fixed-size target axis so every bucketed batch compiles to one static program.
Attention sizes are tiny (<= ~10 queries x ~512 grid tokens), so plain XLA
einsum attention is used rather than the flash kernel.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import layer_norm
from ...ops.gelu import gelu
from ...ops.resample import variable_upsample_3d
from .config import SamConfig


# ---------------------------------------------------------------------------
# prompt encoder (text path + random Fourier dense PE)
# ---------------------------------------------------------------------------

def init_prompt_encoder_params(key, cfg: SamConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    c = cfg.embed_dim
    mc = 16  # mask_in_chans (ref prompt_encoder.py:21)

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    ks = jax.random.split(k5, 3)
    return {
        # (3, C/2) gaussian matrix, registered buffer in the reference
        "pe_gaussian": jax.random.normal(k1, (3, cfg.embed_dim // 2)).astype(dtype),
        "no_mask_embed": nrm(k2, (c,)),
        # 4 point identities: neg point, pos point, box lo corner, box hi
        # corner (ref prompt_encoder.py:37-39)
        "point_embeddings": nrm(k3, (4, c)),
        "not_a_point_embed": nrm(k4, (c,)),
        # mask downscaling: the reference keeps SAM's 2-D conv stack, which is
        # dead code on 3-D inputs ("not used at all in SegVol",
        # prompt_encoder.py:42); here it is a working 3-D equivalent
        "mask_down": {
            "conv1_w": nrm(ks[0], (2, 2, 2, 1, mc // 4), std=0.2),
            "conv1_b": jnp.zeros((mc // 4,), dtype),
            "ln1": {"scale": jnp.ones((mc // 4,), dtype), "bias": jnp.zeros((mc // 4,), dtype)},
            "conv2_w": nrm(ks[1], (2, 2, 2, mc // 4, mc), std=0.2),
            "conv2_b": jnp.zeros((mc,), dtype),
            "ln2": {"scale": jnp.ones((mc,), dtype), "bias": jnp.zeros((mc,), dtype)},
            "conv3_w": nrm(ks[2], (1, 1, 1, mc, c), std=0.2),
            "conv3_b": jnp.zeros((c,), dtype),
        },
    }


def dense_pe(params: dict, grid_shape: tuple[int, int, int]) -> jnp.ndarray:
    """Random-Fourier positional grid (C, gd, gh, gw).

    Mirrors ``PositionEmbeddingRandom.forward`` (``prompt_encoder.py:179-191``)
    including its coordinate convention: the encoded vector is
    (dim1, dim0, dim2) normalized center coordinates.
    """
    d0, d1, d2 = grid_shape
    g = np.mgrid[0:d0, 0:d1, 0:d2].astype(np.float32) + 0.5
    coords = jnp.asarray(
        np.stack([g[1] / d1, g[0] / d0, g[2] / d2], axis=-1)
    )  # (d0, d1, d2, 3) in [0, 1]
    coords = 2 * coords - 1
    proj = 2 * math.pi * (coords @ params["pe_gaussian"])
    pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    return pe.transpose(3, 0, 1, 2)


def encode_text_prompt(params: dict, text_embedding: jnp.ndarray, grid_shape):
    """(..., C) text embedding -> (sparse (..., 1, C), dense (..., C, *grid))."""
    sparse = text_embedding[..., None, :]
    dense = jnp.broadcast_to(
        params["no_mask_embed"].reshape(-1, 1, 1, 1),
        (text_embedding.shape[-1], *grid_shape),
    )
    return sparse, dense


def _pe_with_coords(params, coords, image_size):
    """Random-Fourier encoding of un-normalized (x, y, z) point coords against
    an (H, W, D) image size (ref ``forward_with_coords``,
    ``prompt_encoder.py:191-200``: x/=W, y/=H, z/=D)."""
    h, w, d = image_size
    norm = coords / jnp.asarray([w, h, d], coords.dtype)
    norm = 2 * norm - 1
    proj = 2 * math.pi * (norm @ params["pe_gaussian"].astype(norm.dtype))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def encode_point_prompt(
    params: dict,
    points: jnp.ndarray,  # (N, 3) un-normalized (x, y, z) coords
    labels: jnp.ndarray,  # (N,) int: 1 pos, 0 neg, -1 padding
    image_size: tuple[int, int, int],
    pad: bool = True,
) -> jnp.ndarray:
    """Point prompts -> (N[+1], C) sparse embeddings.

    Matches ``_embed_points`` (``prompt_encoder.py:66-83``): +0.5 pixel-center
    shift, a padding point appended when no box accompanies the points,
    label-dependent identity embeddings (padding points drop their PE
    entirely and use ``not_a_point_embed``).
    """
    points = points + 0.5
    if pad:
        points = jnp.concatenate([points, jnp.zeros((1, 3), points.dtype)], 0)
        labels = jnp.concatenate([labels, jnp.full((1,), -1, labels.dtype)], 0)
    pe = _pe_with_coords(params, points, image_size)
    lab = labels[:, None]
    pe = jnp.where(lab == -1, params["not_a_point_embed"][None], pe)
    pe = pe + jnp.where(lab == 0, params["point_embeddings"][0][None], 0.0)
    pe = pe + jnp.where(lab == 1, params["point_embeddings"][1][None], 0.0)
    return pe


def encode_box_prompt(
    params: dict,
    boxes: jnp.ndarray,  # (N, 6) un-normalized (x0, y0, z0, x1, y1, z1)
    image_size: tuple[int, int, int],
) -> jnp.ndarray:
    """Box prompts -> (N * 2, C): two PE'd corners with distinct identity
    embeddings (ref ``_embed_boxes``, ``prompt_encoder.py:85-92``)."""
    corners = (boxes + 0.5).reshape(-1, 2, 3)
    pe = _pe_with_coords(params, corners, image_size)
    pe = pe.at[:, 0, :].add(params["point_embeddings"][2])
    pe = pe.at[:, 1, :].add(params["point_embeddings"][3])
    return pe.reshape(-1, pe.shape[-1])


def _ln_channels_last(p, x, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def encode_mask_prompt(params: dict, mask: jnp.ndarray) -> jnp.ndarray:
    """(1, D, H, W) input mask -> dense (C, D/4, H/4, W/4) embedding.

    3-D working equivalent of the reference's (dead-code 2-D) mask
    downscaling stack: conv(s2) + LN + GELU, twice, then 1x1 projection.
    """
    p = params["mask_down"]
    x = mask[None].transpose(0, 2, 3, 4, 1).astype(p["conv1_w"].dtype)  # NDHWC

    def conv(x, w, b, stride):
        y = jax.lax.conv_general_dilated(
            x, w, (stride,) * 3, "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + b

    # reference uses nn.GELU (exact erf) here (prompt_encoder.py:21); jax's
    # default approximate=True would be a parity drift.
    x = gelu(_ln_channels_last(p["ln1"], conv(x, p["conv1_w"], p["conv1_b"], 2)))
    x = gelu(_ln_channels_last(p["ln2"], conv(x, p["conv2_w"], p["conv2_b"], 2)))
    x = conv(x, p["conv3_w"], p["conv3_b"], 1)
    return x[0].transpose(3, 0, 1, 2)  # (C, d, h, w)


def encode_prompts(
    params: dict,
    grid_shape: tuple[int, int, int],
    image_size: tuple[int, int, int],
    *,
    points: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    boxes: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    text_embedding: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full prompt-encoder forward (ref ``prompt_encoder.py:123-151``):
    concatenate point/box/text sparse embeddings in that order; dense is the
    mask embedding, or the broadcast no-mask embedding."""
    sparse_parts = []
    if points is not None:
        sparse_parts.append(
            encode_point_prompt(params, *points, image_size, pad=boxes is None)
        )
    if boxes is not None:
        sparse_parts.append(encode_box_prompt(params, boxes, image_size))
    if text_embedding is not None:
        sparse_parts.append(text_embedding[None, :])
    if not sparse_parts:
        raise ValueError("at least one prompt type is required")
    sparse = jnp.concatenate(sparse_parts, axis=0)
    if mask is not None:
        dense = encode_mask_prompt(params, mask)
    else:
        dense = jnp.broadcast_to(
            params["no_mask_embed"].reshape(-1, 1, 1, 1),
            (sparse.shape[-1], *grid_shape),
        )
    return sparse, dense


# ---------------------------------------------------------------------------
# two-way transformer
# ---------------------------------------------------------------------------

def _init_attn(ks, c, internal, dtype):
    k1, k2, k3, k4 = jax.random.split(ks, 4)
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    return {
        "q_w": nrm(k1, (c, internal)), "q_b": jnp.zeros((internal,), dtype),
        "k_w": nrm(k2, (c, internal)), "k_b": jnp.zeros((internal,), dtype),
        "v_w": nrm(k3, (c, internal)), "v_b": jnp.zeros((internal,), dtype),
        "out_w": nrm(k4, (internal, c)), "out_b": jnp.zeros((c,), dtype),
    }


def _attn(p, q, k, v, num_heads: int):
    """Dense multi-head attention on tiny unbatched (S, C) operands."""
    qh = (q @ p["q_w"] + p["q_b"])
    kh = (k @ p["k_w"] + p["k_b"])
    vh = (v @ p["v_w"] + p["v_b"])
    internal = qh.shape[-1]
    d = internal // num_heads

    def split(x):
        return x.reshape(*x.shape[:-1], num_heads, d).swapaxes(-3, -2)  # (H, S, d)

    qh, kh, vh = split(qh), split(kh), split(vh)
    logits = jnp.einsum("hqd,hkd->hqk", qh, kh, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * d**-0.5, axis=-1).astype(vh.dtype)
    out = jnp.einsum("hqk,hkd->hqd", probs, vh)
    out = out.swapaxes(-3, -2).reshape(*q.shape[:-1], internal)
    return out @ p["out_w"] + p["out_b"]


def _init_ln(c, dtype):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _ln(p, x):
    return layer_norm(x, p["w"], p["b"])


def init_two_way_params(key, cfg: SamConfig, dtype=jnp.float32) -> dict:
    c = cfg.embed_dim
    internal = c // cfg.attention_downsample_rate
    layers = []
    ks = jax.random.split(key, cfg.decoder_depth + 2)
    std = 0.02
    for li in range(cfg.decoder_depth):
        k = jax.random.split(ks[li], 8)
        layers.append({
            "self_attn": _init_attn(k[0], c, c, dtype),
            "norm1": _init_ln(c, dtype),
            "cross_t2i": _init_attn(k[1], c, internal, dtype),
            "norm2": _init_ln(c, dtype),
            "mlp_fc1_w": (jax.random.normal(k[2], (c, cfg.decoder_mlp_dim)) * std).astype(dtype),
            "mlp_fc1_b": jnp.zeros((cfg.decoder_mlp_dim,), dtype),
            "mlp_fc2_w": (jax.random.normal(k[3], (cfg.decoder_mlp_dim, c)) * std).astype(dtype),
            "mlp_fc2_b": jnp.zeros((c,), dtype),
            "norm3": _init_ln(c, dtype),
            "cross_i2t": _init_attn(k[4], c, internal, dtype),
            "norm4": _init_ln(c, dtype),
        })
    # stack layer pytrees along a leading axis for scan-free but compact storage
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "layers": stacked,
        "final_attn": _init_attn(ks[-2], c, internal, dtype),
        "norm_final": _init_ln(c, dtype),
    }


def two_way_forward(
    params: dict,
    cfg: SamConfig,
    image_embedding: jnp.ndarray,  # (T, C) flattened grid tokens
    image_pe: jnp.ndarray,  # (T, C)
    point_embedding: jnp.ndarray,  # (Q, C) output+prompt tokens
):
    """Two-way attention (``transformer.py:66-190``): queries <-> image tokens.

    Returns (queries (Q, C), keys (T, C)).
    """
    queries = point_embedding
    keys = image_embedding
    h = cfg.decoder_num_heads
    depth = cfg.decoder_depth
    for li in range(depth):
        lp = jax.tree.map(lambda x: x[li], params["layers"])
        if li == 0:
            queries = _attn(lp["self_attn"], queries, queries, queries, h)
        else:
            q = queries + point_embedding
            queries = queries + _attn(lp["self_attn"], q, q, queries, h)
        queries = _ln(lp["norm1"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _attn(lp["cross_t2i"], q, k, keys, h)
        queries = _ln(lp["norm2"], queries)

        mlp = jax.nn.relu(queries @ lp["mlp_fc1_w"] + lp["mlp_fc1_b"]) @ lp["mlp_fc2_w"] + lp["mlp_fc2_b"]
        queries = _ln(lp["norm3"], queries + mlp)

        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + _attn(lp["cross_i2t"], k, q, queries, h)
        keys = _ln(lp["norm4"], keys)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + _attn(params["final_attn"], q, k, keys, h)
    queries = _ln(params["norm_final"], queries)
    return queries, keys


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def init_mask_decoder_params(key, cfg: SamConfig, dtype=jnp.float32) -> dict:
    c = cfg.embed_dim
    ks = jax.random.split(key, 12)
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def mlp3(k, cin, ch, cout):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "w1": nrm(k1, (cin, ch)), "b1": jnp.zeros((ch,), dtype),
            "w2": nrm(k2, (ch, ch)), "b2": jnp.zeros((ch,), dtype),
            "w3": nrm(k3, (ch, cout)), "b3": jnp.zeros((cout,), dtype),
        }

    return {
        "iou_token": nrm(ks[0], (1, c)),
        "mask_tokens": nrm(ks[1], (cfg.num_mask_tokens, c)),
        "transformer": init_two_way_params(ks[2], cfg, dtype),
        # output_upscaling: Upsample(C, C/4) -> LayerNormNd -> GELU -> Upsample(C/4, C/8) -> GELU
        "up1_w": nrm(ks[3], (c, c // 4, 2, 2, 2)),
        "up1_b": jnp.zeros((c // 4,), dtype),
        "up_ln": _init_ln(c // 4, dtype),
        "up2_w": nrm(ks[4], (c // 4, c // 8, 2, 2, 2)),
        "up2_b": jnp.zeros((c // 8,), dtype),
        # hypernetwork MLPs: [0] semantic token, [1] shared by instance tokens
        "hyper_semantic": mlp3(ks[5], c, c, c // 8),
        "hyper_instance": mlp3(ks[6], c, c, c // 8),
        "txt_align_w": nrm(ks[7], (c, c // 8)),
        "txt_align_b": jnp.zeros((c // 8,), dtype),
    }


def _mlp3(p, x, relu_last=False):
    x = jax.nn.relu(x @ p["w1"] + p["b1"])
    x = jax.nn.relu(x @ p["w2"] + p["b2"])
    x = x @ p["w3"] + p["b3"]
    return x


def mask_decoder_forward(
    params: dict,
    cfg: SamConfig,
    image_embeddings: jnp.ndarray,  # (C, gd, gh, gw) one sample
    image_pe: jnp.ndarray,  # (C, gd, gh, gw)
    sparse_prompt: jnp.ndarray,  # (N_sp, C) prompt tokens for one target
    dense_prompt: jnp.ndarray,  # (C, gd, gh, gw)
    text_embedding: jnp.ndarray | None,  # (C,) for the similarity term
    patch_size_z: int,
):
    """Predict per-target mask logits; mirrors ``mask_decoder.py:89-149``.

    ``text_embedding=None`` (point/box-prompted segmentation) skips the
    text-similarity term, as the reference does when no text prompt is given.
    Returns (masks (num_mask_tokens, d', h', w'), mask_tokens_out
    (num_mask_tokens, C)) where d' = gd * z-upsampling, h' = gh*4, w' = gw*4.
    """
    c, gd, gh, gw = image_embeddings.shape
    output_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], axis=0)
    tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=0)  # (1+K+N_sp, C)

    src = (image_embeddings + dense_prompt).reshape(c, -1).T  # (T, C)
    pe = image_pe.reshape(c, -1).T
    hs, src = two_way_forward(params["transformer"], cfg, src, pe, tokens)
    mask_tokens_out = hs[1 : 1 + cfg.num_mask_tokens]  # (K+1, C)

    up = src.T.reshape(1, c, gd, gh, gw)
    up = variable_upsample_3d(up, params["up1_w"], params["up1_b"], patch_size_z, cnt=0)
    up = _ln(params["up_ln"], up.transpose(0, 2, 3, 4, 1)).transpose(0, 4, 1, 2, 3)
    up = gelu(up)
    up = variable_upsample_3d(up, params["up2_w"], params["up2_b"], patch_size_z, cnt=1)
    up = gelu(up)[0]  # (C/8, d', h', w')

    hyper_sem = _mlp3(params["hyper_semantic"], mask_tokens_out[:1])  # (1, C/8)
    hyper_inst = _mlp3(params["hyper_instance"], mask_tokens_out[1:])  # (K, C/8)
    hyper_in = jnp.concatenate([hyper_sem, hyper_inst], axis=0)  # (K+1, C/8)
    masks = jnp.einsum("mc,cdhw->mdhw", hyper_in, up)
    if text_embedding is not None:
        txt = text_embedding @ params["txt_align_w"] + params["txt_align_b"]  # (C/8,)
        sim = jnp.einsum("c,cdhw->dhw", txt, up)
        masks = masks + sim[None]
    return masks, mask_tokens_out
