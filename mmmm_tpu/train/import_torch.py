"""Torch checkpoint importers with 2-D -> 3-D weight surgery.

Adapts released torch checkpoints to the TPU parameter tree:

  - HF CogVLM (THUDM/cogvlm-chat-hf) -> ``init_cogvlm_params`` tree, including
    the MMMM surgery rules (``visual.py:37-57``, ``resample.py:31-53``):
    ViT position embedding (1+35*35, C) -> cls_pos + bilinear-resampled
    (32, 32) grid repeated over z=8; patch conv (C, 3, 14, 14) -> HW-resampled
    with response scaling -> mean-inflated over z to (C, 3, 16, 16, 16).
  - SegVol SAM -> ``init_sam_params`` tree (``image_encoder.py:82-119``,
    ``mask_decoder.py:76-87``, ``build_sam.py:58-77``): flattened patch
    embedding unfolded + resampled, 1-D token-grid pos embeds -> 3-D grid,
    4-D LayerNormNd stats mean-collapsed, mask-token table padded to
    1 + num_instances rows.

All torch Linear weights are (out, in) and transpose to the (in, out) matmul
convention; per-layer weights stack into the (L, ...) scan layout.
"""
from __future__ import annotations

import math

import numpy as np

from ..models.cogvlm import CogVLMConfig
from ..models.segvol import SamConfig


def _resample_np(x: np.ndarray, shape: tuple[int, ...], scale: bool = False) -> np.ndarray:
    import jax

    from ..ops.resample import resample_nd

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return np.asarray(resample_nd(np.asarray(x, np.float32), shape, scale=scale))


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.swapaxes(w, -1, -2))


def _stack(sd: dict, fmt: str, num_layers: int, transpose: bool = False) -> np.ndarray:
    mats = [np.asarray(sd[fmt.format(i)]) for i in range(num_layers)]
    out = np.stack(mats)
    return _t(out) if transpose else out


def inflate_conv_z(weight: np.ndarray, depth: int, mode: str = "mean") -> np.ndarray:
    """2-D conv kernel (Co, Ci, H, W) -> 3-D (Co, Ci, depth, H, W).

    ``mean``: each z slice = W/depth (sum over z preserves the 2-D response);
    ``center``: response concentrated at the central slice(s).
    """
    if mode == "mean":
        return np.repeat(weight[:, :, None] / depth, depth, axis=2)
    if mode == "center":
        out = np.zeros((*weight.shape[:2], depth, *weight.shape[2:]), weight.dtype)
        if depth % 2:
            out[:, :, depth // 2] = weight
        else:
            out[:, :, depth // 2 - 1] = weight / 2
            out[:, :, depth // 2] = weight / 2
        return out
    raise ValueError(mode)


def import_cogvlm(
    state_dict: dict,
    cfg: CogVLMConfig,
    *,
    vocab_resize_mean: bool = True,
) -> dict:
    """HF CogVLM ``state_dict`` (numpy leaves) -> our ``cogvlm`` params tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    L = cfg.num_hidden_layers
    v = cfg.vision
    lv = v.num_hidden_layers

    # ---- token embeddings / head (with vocab extension) -------------------
    def extend_vocab(w: np.ndarray) -> np.ndarray:
        if w.shape[0] >= cfg.vocab_size:
            return w[: cfg.vocab_size]
        extra = cfg.vocab_size - w.shape[0]
        fill = w.mean(axis=0, keepdims=True) if vocab_resize_mean else np.zeros((1, w.shape[1]), w.dtype)
        return np.concatenate([w, np.repeat(fill, extra, axis=0)], axis=0)

    llm = {
        "embed_tokens": extend_vocab(sd["model.embed_tokens.weight"]),
        "norm": sd["model.norm.weight"],
        "lm_head": _t(extend_vocab(sd["lm_head.weight"])),
        "layers": {
            "vis_qkv": _stack(sd, "model.layers.{}.self_attn.vision_expert_query_key_value.weight", L, True),
            "lang_qkv": _stack(sd, "model.layers.{}.self_attn.language_expert_query_key_value.weight", L, True),
            "vis_dense": _stack(sd, "model.layers.{}.self_attn.vision_expert_dense.weight", L, True),
            "lang_dense": _stack(sd, "model.layers.{}.self_attn.language_expert_dense.weight", L, True),
            "vis_mlp": {
                "gate": _stack(sd, "model.layers.{}.mlp.vision_mlp.gate_proj.weight", L, True),
                "up": _stack(sd, "model.layers.{}.mlp.vision_mlp.up_proj.weight", L, True),
                "down": _stack(sd, "model.layers.{}.mlp.vision_mlp.down_proj.weight", L, True),
            },
            "lang_mlp": {
                "gate": _stack(sd, "model.layers.{}.mlp.language_mlp.gate_proj.weight", L, True),
                "up": _stack(sd, "model.layers.{}.mlp.language_mlp.up_proj.weight", L, True),
                "down": _stack(sd, "model.layers.{}.mlp.language_mlp.down_proj.weight", L, True),
            },
            "input_ln": _stack(sd, "model.layers.{}.input_layernorm.weight", L),
            "post_ln": _stack(sd, "model.layers.{}.post_attention_layernorm.weight", L),
        },
    }

    # ---- vision tower -----------------------------------------------------
    vp = "model.vision."
    # pos embed (1 + h*w, C): row 0 is cls; grid resampled + z-repeated
    pos = sd[vp + "patch_embedding.position_embedding.weight"]
    cls_pos, grid = pos[:1], pos[1:]
    h0, w0 = v.pt_pos_embed_shape
    grid = grid.reshape(h0, w0, -1).transpose(2, 0, 1)[None]  # (1, C, h0, w0)
    if (h0, w0) != tuple(v.pos_embed_shape[1:]):
        grid = _resample_np(grid, tuple(v.pos_embed_shape[1:]))
    grid = np.repeat(grid[:, :, None], v.pos_embed_shape[0], axis=2)  # (1, C, D, H, W)

    proj_w = sd[vp + "patch_embedding.proj.weight"]  # (C, 3, ph0, pw0) 2-D conv
    if proj_w.ndim == 4:
        if proj_w.shape[2:] != tuple(v.patch_size[1:]):
            proj_w = _resample_np(proj_w, tuple(v.patch_size[1:]), scale=True)
        proj_w = inflate_conv_z(proj_w, v.patch_size[0], "mean")

    vision = {
        "patch": {
            "proj_w": proj_w,
            "proj_b": sd[vp + "patch_embedding.proj.bias"],
            "cls": sd[vp + "patch_embedding.cls_embedding"].reshape(1, -1),
            "cls_pos": cls_pos,
            "pos": grid,
        },
        "layers": {
            "qkv_w": _stack(sd, vp + "transformer.layers.{}.attention.query_key_value.weight", lv, True),
            "qkv_b": _stack(sd, vp + "transformer.layers.{}.attention.query_key_value.bias", lv),
            "dense_w": _stack(sd, vp + "transformer.layers.{}.attention.dense.weight", lv, True),
            "dense_b": _stack(sd, vp + "transformer.layers.{}.attention.dense.bias", lv),
            "ln1_w": _stack(sd, vp + "transformer.layers.{}.input_layernorm.weight", lv),
            "ln1_b": _stack(sd, vp + "transformer.layers.{}.input_layernorm.bias", lv),
            "ln2_w": _stack(sd, vp + "transformer.layers.{}.post_attention_layernorm.weight", lv),
            "ln2_b": _stack(sd, vp + "transformer.layers.{}.post_attention_layernorm.bias", lv),
            "fc1_w": _stack(sd, vp + "transformer.layers.{}.mlp.fc1.weight", lv, True),
            "fc1_b": _stack(sd, vp + "transformer.layers.{}.mlp.fc1.bias", lv),
            "fc2_w": _stack(sd, vp + "transformer.layers.{}.mlp.fc2.weight", lv, True),
            "fc2_b": _stack(sd, vp + "transformer.layers.{}.mlp.fc2.bias", lv),
        },
        "glu": {
            "linear_proj": _t(sd[vp + "linear_proj.linear_proj.weight"]),
            "ln_w": sd[vp + "linear_proj.norm1.weight"],
            "ln_b": sd[vp + "linear_proj.norm1.bias"],
            "gate": _t(sd[vp + "linear_proj.gate_proj.weight"]),
            "h4h": _t(sd[vp + "linear_proj.dense_h_to_4h.weight"]),
            "4hh": _t(sd[vp + "linear_proj.dense_4h_to_h.weight"]),
        },
        "boi": sd[vp + "boi"].reshape(-1),
        "eoi": sd[vp + "eoi"].reshape(-1),
    }
    return {"llm": llm, "vision": vision}


def import_segvol_sam(
    state_dict: dict,
    cfg: SamConfig,
    *,
    pt_in_channels: int = 1,
    pt_patch_size: tuple[int, int, int] = (4, 16, 16),
    pt_pos_embed_shape: tuple[int, int, int] = (8, 8, 8),
    instance: bool = False,
    fresh_mask_tokens: np.ndarray | None = None,
) -> dict:
    """SegVol ``state_dict`` (numpy leaves, keys relative to the sam module)
    -> our sam params tree. Heads absent from the checkpoint (box/disc for
    iSAM, fresh mask tokens) are left out; merge over a fresh init.

    ``fresh_mask_tokens``: the freshly initialized (num_mask_tokens, C) table;
    rows beyond the pretrained ones keep this init (the reference clones the
    module's own fresh rows, ``mask_decoder.py:83-88``) instead of zeros."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    c = cfg.embed_dim
    L = cfg.encoder_num_layers

    # patch embedding stored flattened: (C, p0*p1*p2*ci)
    pw = sd["image_encoder.patch_embedding.patch_embeddings.1.weight"]
    p0, p1, p2 = pt_patch_size
    pw = pw.reshape(c, p0, p1, p2, pt_in_channels).transpose(0, 4, 1, 2, 3)
    if tuple(pt_patch_size) != tuple(cfg.patch_size):
        pw = _resample_np(pw, tuple(cfg.patch_size), scale=True)
    if pt_in_channels == 1 and cfg.in_channels != 1:
        pw = np.repeat(pw, cfg.in_channels, axis=1) / cfg.in_channels

    pos = sd["image_encoder.patch_embedding.position_embeddings"]  # (1, T, C)
    d0, h0, w0 = pt_pos_embed_shape
    pos = pos.reshape(d0, h0, w0, c).transpose(3, 0, 1, 2)[None]
    if tuple(pt_pos_embed_shape) != tuple(cfg.pos_embed_shape):
        pos = _resample_np(pos, tuple(cfg.pos_embed_shape))

    enc_prefix = "image_encoder.blocks.{}."
    encoder = {
        "patch": {
            "proj_w": pw,
            "proj_b": sd["image_encoder.patch_embedding.patch_embeddings.1.bias"],
            "pos": pos,
        },
        "layers": {
            "qkv_w": _stack(sd, enc_prefix + "attn.qkv.weight", L, True),
            "out_w": _stack(sd, enc_prefix + "attn.out_proj.weight", L, True),
            "out_b": _stack(sd, enc_prefix + "attn.out_proj.bias", L),
            "ln1_w": _stack(sd, enc_prefix + "norm1.weight", L),
            "ln1_b": _stack(sd, enc_prefix + "norm1.bias", L),
            "ln2_w": _stack(sd, enc_prefix + "norm2.weight", L),
            "ln2_b": _stack(sd, enc_prefix + "norm2.bias", L),
            "fc1_w": _stack(sd, enc_prefix + "mlp.linear1.weight", L, True),
            "fc1_b": _stack(sd, enc_prefix + "mlp.linear1.bias", L),
            "fc2_w": _stack(sd, enc_prefix + "mlp.linear2.weight", L, True),
            "fc2_b": _stack(sd, enc_prefix + "mlp.linear2.bias", L),
        },
        "norm_w": sd["image_encoder.norm.weight"],
        "norm_b": sd["image_encoder.norm.bias"],
    }

    prompt = {
        "pe_gaussian": sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"].reshape(-1),
    }
    # point/box prompt identities (Embedding(1, C) each); the reference's 2-D
    # mask_downscaling stack is dead code on 3-D inputs and is NOT imported —
    # our 3-D equivalent keeps its fresh init (models/segvol/decoder.py)
    if "prompt_encoder.point_embeddings.0.weight" in sd:
        prompt["point_embeddings"] = np.stack(
            [sd[f"prompt_encoder.point_embeddings.{i}.weight"].reshape(-1) for i in range(4)]
        )
        prompt["not_a_point_embed"] = sd["prompt_encoder.not_a_point_embed.weight"].reshape(-1)

    md = "mask_decoder."
    # mask tokens: pad pretrained rows to 1 + num_instances
    mt = sd[md + "mask_tokens.weight"]
    if mt.shape[0] < cfg.num_mask_tokens:
        if fresh_mask_tokens is not None:
            pad = np.asarray(fresh_mask_tokens)[mt.shape[0] : cfg.num_mask_tokens]
        else:
            pad = np.zeros((cfg.num_mask_tokens - mt.shape[0], mt.shape[1]), mt.dtype)
        mt = np.concatenate([mt, pad], axis=0)
    mt = mt[: cfg.num_mask_tokens]

    # LayerNormNd stats possibly stored 4-D: mean-collapse (mask_decoder.py:76-81)
    ln_w = sd[md + "output_upscaling.1.weight"]
    ln_b = sd[md + "output_upscaling.1.bias"]
    if ln_w.ndim > 1:
        ln_w = ln_w.reshape(ln_w.shape[0], -1).mean(-1)
        ln_b = ln_b.reshape(ln_b.shape[0], -1).mean(-1)

    def attn(prefix):
        return {
            "q_w": _t(sd[prefix + "q_proj.weight"]), "q_b": sd[prefix + "q_proj.bias"],
            "k_w": _t(sd[prefix + "k_proj.weight"]), "k_b": sd[prefix + "k_proj.bias"],
            "v_w": _t(sd[prefix + "v_proj.weight"]), "v_b": sd[prefix + "v_proj.bias"],
            "out_w": _t(sd[prefix + "out_proj.weight"]), "out_b": sd[prefix + "out_proj.bias"],
        }

    def ln(prefix):
        return {"w": sd[prefix + "weight"], "b": sd[prefix + "bias"]}

    layers = []
    for i in range(cfg.decoder_depth):
        p = f"{md}transformer.layers.{i}."
        layers.append({
            "self_attn": attn(p + "self_attn."),
            "norm1": ln(p + "norm1."),
            "cross_t2i": attn(p + "cross_attn_token_to_image."),
            "norm2": ln(p + "norm2."),
            "mlp_fc1_w": _t(sd[p + "mlp.lin1.weight"]), "mlp_fc1_b": sd[p + "mlp.lin1.bias"],
            "mlp_fc2_w": _t(sd[p + "mlp.lin2.weight"]), "mlp_fc2_b": sd[p + "mlp.lin2.bias"],
            "norm3": ln(p + "norm3."),
            "cross_i2t": attn(p + "cross_attn_image_to_token."),
            "norm4": ln(p + "norm4."),
        })
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)

    def mlp3(prefix):
        return {
            "w1": _t(sd[prefix + "layers.0.weight"]), "b1": sd[prefix + "layers.0.bias"],
            "w2": _t(sd[prefix + "layers.1.weight"]), "b2": sd[prefix + "layers.1.bias"],
            "w3": _t(sd[prefix + "layers.2.weight"]), "b3": sd[prefix + "layers.2.bias"],
        }

    decoder = {
        "iou_token": sd[md + "iou_token.weight"],
        "mask_tokens": mt,
        "transformer": {
            "layers": stacked,
            "final_attn": attn(md + "transformer.final_attn_token_to_image."),
            "norm_final": ln(md + "transformer.norm_final_attn."),
        },
        "up1_w": sd[md + "output_upscaling.0.weight"],
        "up1_b": sd[md + "output_upscaling.0.bias"],
        "up_ln": {"w": ln_w, "b": ln_b},
        "up2_w": sd[md + "output_upscaling.3.weight"],
        "up2_b": sd[md + "output_upscaling.3.bias"],
        "hyper_semantic": mlp3(md + "output_hypernetworks_mlps.0."),
        "hyper_instance": mlp3(md + "output_hypernetworks_mlps.1."),
        "txt_align_w": _t(sd[md + "txt_align_upscaled_embedding.weight"]),
        "txt_align_b": sd[md + "txt_align_upscaled_embedding.bias"],
    }
    return {"encoder": encoder, "prompt": prompt, "decoder": decoder}


def merge_imported(fresh: dict, imported: dict) -> dict:
    """Overlay imported leaves onto a freshly initialized tree (keeps heads
    the checkpoint doesn't cover, asserts shape agreement elsewhere)."""
    out = {}
    for k, v in fresh.items():
        if k not in imported:
            out[k] = v
        elif isinstance(v, dict):
            out[k] = merge_imported(v, imported[k])
        else:
            iv = imported[k]
            if tuple(np.shape(iv)) != tuple(np.shape(v)):
                raise ValueError(f"shape mismatch at {k}: {np.shape(iv)} vs {np.shape(v)}")
            out[k] = np.asarray(iv, dtype=np.asarray(v).dtype if hasattr(v, "dtype") else np.float32)
    return out
