"""Checkpoint-importer tests: synthetic HF/SegVol state dicts at tiny scale."""
import jax
import numpy as np
import pytest

from mmmm_tpu.models.cogvlm import CogVLMConfig, init_cogvlm_params
from mmmm_tpu.models.segvol import SamConfig, init_sam_params
from mmmm_tpu.train.import_torch import (
    import_cogvlm,
    import_segvol_sam,
    inflate_conv_z,
    merge_imported,
)


def _tree_shapes(t, prefix=""):
    out = {}
    for k, v in t.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def _fake_cogvlm_sd(cfg: CogVLMConfig, base_vocab: int):
    rng = np.random.default_rng(0)
    c, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    v = cfg.vision
    cv, iv, lv = v.hidden_size, v.intermediate_size, v.num_hidden_layers
    h0, w0 = v.pt_pos_embed_shape
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(base_vocab, c)),
        "model.norm.weight": np.ones(c),
        "lm_head.weight": rng.normal(size=(base_vocab, c)),
        "model.vision.patch_embedding.position_embedding.weight": rng.normal(size=(1 + h0 * w0, cv)),
        "model.vision.patch_embedding.proj.weight": rng.normal(size=(cv, 3, 3, 3)),  # 2-D conv, pt patch 3x3
        "model.vision.patch_embedding.proj.bias": rng.normal(size=(cv,)),
        "model.vision.patch_embedding.cls_embedding": rng.normal(size=(cv,)),
        "model.vision.boi": rng.normal(size=(1, 1, c)),
        "model.vision.eoi": rng.normal(size=(1, 1, c)),
        "model.vision.linear_proj.linear_proj.weight": rng.normal(size=(c, cv)),
        "model.vision.linear_proj.norm1.weight": np.ones(c),
        "model.vision.linear_proj.norm1.bias": np.zeros(c),
        "model.vision.linear_proj.gate_proj.weight": rng.normal(size=(i, c)),
        "model.vision.linear_proj.dense_h_to_4h.weight": rng.normal(size=(i, c)),
        "model.vision.linear_proj.dense_4h_to_h.weight": rng.normal(size=(c, i)),
    }
    for li in range(L):
        p = f"model.layers.{li}."
        sd[p + "self_attn.vision_expert_query_key_value.weight"] = rng.normal(size=(3 * c, c))
        sd[p + "self_attn.language_expert_query_key_value.weight"] = rng.normal(size=(3 * c, c))
        sd[p + "self_attn.vision_expert_dense.weight"] = rng.normal(size=(c, c))
        sd[p + "self_attn.language_expert_dense.weight"] = rng.normal(size=(c, c))
        for ex in ("vision_mlp", "language_mlp"):
            sd[p + f"mlp.{ex}.gate_proj.weight"] = rng.normal(size=(i, c))
            sd[p + f"mlp.{ex}.up_proj.weight"] = rng.normal(size=(i, c))
            sd[p + f"mlp.{ex}.down_proj.weight"] = rng.normal(size=(c, i))
        sd[p + "input_layernorm.weight"] = np.ones(c)
        sd[p + "post_attention_layernorm.weight"] = np.ones(c)
    for li in range(lv):
        p = f"model.vision.transformer.layers.{li}."
        sd[p + "attention.query_key_value.weight"] = rng.normal(size=(3 * cv, cv))
        sd[p + "attention.query_key_value.bias"] = rng.normal(size=(3 * cv,))
        sd[p + "attention.dense.weight"] = rng.normal(size=(cv, cv))
        sd[p + "attention.dense.bias"] = rng.normal(size=(cv,))
        sd[p + "input_layernorm.weight"] = np.ones(cv)
        sd[p + "input_layernorm.bias"] = np.zeros(cv)
        sd[p + "post_attention_layernorm.weight"] = np.ones(cv)
        sd[p + "post_attention_layernorm.bias"] = np.zeros(cv)
        sd[p + "mlp.fc1.weight"] = rng.normal(size=(iv, cv))
        sd[p + "mlp.fc1.bias"] = rng.normal(size=(iv,))
        sd[p + "mlp.fc2.weight"] = rng.normal(size=(cv, iv))
        sd[p + "mlp.fc2.bias"] = rng.normal(size=(cv,))
    return sd


def test_import_cogvlm_tree_matches_init():
    cfg = CogVLMConfig.tiny(vocab_size=100)  # 92 base + 8 specials
    sd = _fake_cogvlm_sd(cfg, base_vocab=92)
    tree = import_cogvlm(sd, cfg)
    fresh = init_cogvlm_params(jax.random.PRNGKey(0), cfg)
    assert _tree_shapes(tree) == _tree_shapes(fresh)
    # vocab extension rows = mean of base rows
    emb = tree["llm"]["embed_tokens"]
    np.testing.assert_allclose(emb[92:], np.repeat(emb[:92].mean(0, keepdims=True), 8, 0), atol=1e-6)
    # qkv transpose: x @ ours == torch Linear(x)
    x = np.random.default_rng(1).normal(size=(5, cfg.hidden_size))
    got = x @ np.asarray(tree["llm"]["layers"]["lang_qkv"][0])
    want = x @ sd["model.layers.0.self_attn.language_expert_query_key_value.weight"].T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pos_embed_inflation_z_constant():
    """z-repeated grid: every z slice of the imported pos embed is identical."""
    cfg = CogVLMConfig.tiny(vocab_size=100)
    sd = _fake_cogvlm_sd(cfg, base_vocab=92)
    tree = import_cogvlm(sd, cfg)
    pos = tree["vision"]["patch"]["pos"]  # (1, C, D, H, W)
    for z in range(1, pos.shape[2]):
        np.testing.assert_allclose(pos[:, :, z], pos[:, :, 0], atol=1e-6)


def test_inflate_conv_z_preserves_response():
    rng = np.random.default_rng(2)
    w2 = rng.normal(size=(4, 3, 5, 5))
    for mode in ("mean", "center"):
        w3 = inflate_conv_z(w2, 4, mode)
        # summing over z recovers the 2-D kernel (constant-in-z input response)
        np.testing.assert_allclose(w3.sum(2), w2, atol=1e-6)


def _fake_segvol_sd(cfg: SamConfig, pt_patch=(2, 4, 4), pt_pos=(2, 2, 2)):
    rng = np.random.default_rng(3)
    c, L = cfg.embed_dim, cfg.encoder_num_layers
    internal = c // cfg.attention_downsample_rate
    sd = {
        "image_encoder.patch_embedding.patch_embeddings.1.weight": rng.normal(
            size=(c, pt_patch[0] * pt_patch[1] * pt_patch[2] * 1)
        ),
        "image_encoder.patch_embedding.patch_embeddings.1.bias": rng.normal(size=(c,)),
        "image_encoder.patch_embedding.position_embeddings": rng.normal(
            size=(1, pt_pos[0] * pt_pos[1] * pt_pos[2], c)
        ),
        "image_encoder.norm.weight": np.ones(c),
        "image_encoder.norm.bias": np.zeros(c),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": rng.normal(size=(3, c // 2)),
        "prompt_encoder.no_mask_embed.weight": rng.normal(size=(1, c)),
        "mask_decoder.iou_token.weight": rng.normal(size=(1, c)),
        "mask_decoder.mask_tokens.weight": rng.normal(size=(2, c)),  # fewer than 1+num_instances
        "mask_decoder.output_upscaling.0.weight": rng.normal(size=(c, c // 4, 2, 2, 2)),
        "mask_decoder.output_upscaling.0.bias": rng.normal(size=(c // 4,)),
        # 4-D LayerNormNd stats (SegVol quirk)
        "mask_decoder.output_upscaling.1.weight": rng.normal(size=(c // 4, 3, 3, 3)),
        "mask_decoder.output_upscaling.1.bias": rng.normal(size=(c // 4, 3, 3, 3)),
        "mask_decoder.output_upscaling.3.weight": rng.normal(size=(c // 4, c // 8, 2, 2, 2)),
        "mask_decoder.output_upscaling.3.bias": rng.normal(size=(c // 8,)),
        "mask_decoder.txt_align_upscaled_embedding.weight": rng.normal(size=(c // 8, c)),
        "mask_decoder.txt_align_upscaled_embedding.bias": rng.normal(size=(c // 8,)),
    }
    for i in range(L):
        p = f"image_encoder.blocks.{i}."
        sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * c, c))
        sd[p + "attn.out_proj.weight"] = rng.normal(size=(c, c))
        sd[p + "attn.out_proj.bias"] = rng.normal(size=(c,))
        sd[p + "norm1.weight"] = np.ones(c)
        sd[p + "norm1.bias"] = np.zeros(c)
        sd[p + "norm2.weight"] = np.ones(c)
        sd[p + "norm2.bias"] = np.zeros(c)
        sd[p + "mlp.linear1.weight"] = rng.normal(size=(cfg.encoder_mlp_dim, c))
        sd[p + "mlp.linear1.bias"] = rng.normal(size=(cfg.encoder_mlp_dim,))
        sd[p + "mlp.linear2.weight"] = rng.normal(size=(c, cfg.encoder_mlp_dim))
        sd[p + "mlp.linear2.bias"] = rng.normal(size=(c,))
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}."
        for name, dim in (
            ("self_attn.", c),
            ("cross_attn_token_to_image.", internal),
            ("cross_attn_image_to_token.", internal),
        ):
            for proj in ("q_proj", "k_proj", "v_proj"):
                sd[p + name + proj + ".weight"] = rng.normal(size=(dim, c))
                sd[p + name + proj + ".bias"] = rng.normal(size=(dim,))
            sd[p + name + "out_proj.weight"] = rng.normal(size=(c, dim))
            sd[p + name + "out_proj.bias"] = rng.normal(size=(c,))
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[p + n + ".weight"] = np.ones(c)
            sd[p + n + ".bias"] = np.zeros(c)
        sd[p + "mlp.lin1.weight"] = rng.normal(size=(cfg.decoder_mlp_dim, c))
        sd[p + "mlp.lin1.bias"] = rng.normal(size=(cfg.decoder_mlp_dim,))
        sd[p + "mlp.lin2.weight"] = rng.normal(size=(c, cfg.decoder_mlp_dim))
        sd[p + "mlp.lin2.bias"] = rng.normal(size=(c,))
    fp = "mask_decoder.transformer.final_attn_token_to_image."
    for proj in ("q_proj", "k_proj", "v_proj"):
        sd[fp + proj + ".weight"] = rng.normal(size=(internal, c))
        sd[fp + proj + ".bias"] = rng.normal(size=(internal,))
    sd[fp + "out_proj.weight"] = rng.normal(size=(c, internal))
    sd[fp + "out_proj.bias"] = rng.normal(size=(c,))
    sd["mask_decoder.transformer.norm_final_attn.weight"] = np.ones(c)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = np.zeros(c)
    for mi in range(2):
        p = f"mask_decoder.output_hypernetworks_mlps.{mi}."
        sd[p + "layers.0.weight"] = rng.normal(size=(c, c))
        sd[p + "layers.0.bias"] = rng.normal(size=(c,))
        sd[p + "layers.1.weight"] = rng.normal(size=(c, c))
        sd[p + "layers.1.bias"] = rng.normal(size=(c,))
        sd[p + "layers.2.weight"] = rng.normal(size=(c // 8, c))
        sd[p + "layers.2.bias"] = rng.normal(size=(c // 8,))
    return sd


def test_import_segvol_and_merge():
    cfg = SamConfig.tiny()
    sd = _fake_segvol_sd(cfg)
    tree = import_segvol_sam(
        sd, cfg, pt_in_channels=1, pt_patch_size=(2, 4, 4), pt_pos_embed_shape=(2, 2, 2)
    )
    fresh = init_sam_params(jax.random.PRNGKey(0), cfg, instance=True)
    merged = merge_imported(fresh, tree)
    assert _tree_shapes(merged) == _tree_shapes(fresh)
    # box/disc heads survive from fresh init (absent from checkpoint)
    np.testing.assert_allclose(
        np.asarray(merged["box_head"]["w1"]), np.asarray(fresh["box_head"]["w1"])
    )
    # mask tokens: pretrained rows kept, rest padded with zeros
    np.testing.assert_allclose(
        merged["decoder"]["mask_tokens"][:2], sd["mask_decoder.mask_tokens.weight"]
    )
    # 4-D LayerNormNd stats collapsed to per-channel means
    np.testing.assert_allclose(
        merged["decoder"]["up_ln"]["w"],
        sd["mask_decoder.output_upscaling.1.weight"].reshape(cfg.embed_dim // 4, -1).mean(-1),
        rtol=1e-6,
    )
    # in-channel replication keeps conv response for grayscale inputs
    pw = merged["encoder"]["patch"]["proj_w"]
    np.testing.assert_allclose(pw[:, 0], pw[:, 1], atol=1e-6)
