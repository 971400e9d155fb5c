"""Torch-numerics parity harness (the offline route to the token-identical gate).

Strategy: independent *torch* mirrors of the reference modules (math
transcribed from the cited reference lines — the reference itself needs
xformers/CUDA and cannot be imported) generate state dicts in the HF/SegVol
checkpoint key format; ``import_cogvlm`` / ``import_segvol_sam`` map them into
the JAX tree (including the 2-D -> 3-D surgery rules), and both forwards run
on the same inputs. Any divergence in an importer mapping, a surgery rule, or
a forward-math detail fails these tests.

Reference math mirrored here:
  - RMSNorm fp32 variance              modeling_cogvlm.py:30-41
  - rotate-half RoPE by position id    modeling_cogvlm.py:145-193
  - expert-mask off-by-one + padding   modeling_cogvlm.py:58-70
  - dual-expert attention/MLP          modeling_cogvlm.py:72-98,228-284
  - decoder layer + final norm + head  modeling_cogvlm.py:286-340,601-706
  - EVA post-norm layer / GLU / pool   visual.py:79-208
  - patch/pos-embed 2-D->3-D surgery   visual.py:37-57, resample.py:31-62
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig, cogvlm_forward
from mmmm_tpu.train.import_torch import import_cogvlm

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch mirrors (fp32, functional over the HF-format state dict)
# --------------------------------------------------------------------------

def t_rms_norm(x, w, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (w * (x.float() * torch.rsqrt(var + eps))).to(x.dtype)


def t_rotate_half(x):
    h = x.shape[-1] // 2
    return torch.cat([-x[..., h:], x[..., :h]], dim=-1)


def t_rope_tables(max_pos, dim, base=10000.0):
    inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(max_pos).float()
    freqs = torch.outer(t, inv)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def t_apply_rope(q, k, cos, sin, pos):
    # q, k: (B, H, S, D); pos: (B, S)
    c = F.embedding(pos, cos)[:, None]
    s = F.embedding(pos, sin)[:, None]
    return q * c + t_rotate_half(q) * s, k * c + t_rotate_half(k) * s


def t_expert_mask(tt, padding):
    vis = torch.zeros_like(tt, dtype=torch.bool)
    vis[:, :-1] = (tt[:, :-1] == 1) & (tt[:, 1:] == 1)
    lang = ~vis
    if tt.shape[1] > 1:
        vis = vis & padding
        lang = lang & padding
    return vis, lang


def t_causal_attention(q, k, v, padding):
    # (B, H, S, D); causal within each sample's valid tokens, fp32 softmax
    scale = q.shape[-1] ** -0.5
    s = q.shape[2]
    scores = (q * scale) @ k.transpose(-1, -2)
    causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
    mask = causal[None, None] & padding[:, None, None, :]
    scores = scores.masked_fill(~mask, float("-inf"))
    probs = scores.float().softmax(-1).to(q.dtype)
    probs = torch.nan_to_num(probs)  # fully-masked (pad) query rows
    return probs @ v


def torch_llm_forward(sd, cfg, embeds, tt, pos, padding):
    """Mirror of CogVLMModel.llm_forward + lm_head (modeling_cogvlm.py:477-586)."""
    b, s, c = embeds.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    cos, sin = t_rope_tables(cfg.max_position_embeddings, d)
    x = embeds
    vis, lang = t_expert_mask(tt, padding)

    def dual(t, wv, wl):
        out = torch.zeros(*t.shape[:-1], wv.shape[0], dtype=t.dtype)
        out[vis] = t[vis] @ wv.T
        out[lang] = t[lang] @ wl.T
        return out

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        res = x
        xn = torch.where(
            padding[..., None], t_rms_norm(x, sd[p + "input_layernorm.weight"], cfg.rms_norm_eps), x
        )
        qkv = dual(
            xn,
            sd[p + "self_attn.vision_expert_query_key_value.weight"],
            sd[p + "self_attn.language_expert_query_key_value.weight"],
        )
        q, k, v = [
            t.reshape(b, s, h, d).permute(0, 2, 1, 3) for t in qkv.split(c, dim=-1)
        ]
        q, k = t_apply_rope(q, k, cos, sin, pos)
        ctx = t_causal_attention(q, k, v, padding).permute(0, 2, 1, 3).reshape(b, s, c)
        attn_out = dual(
            ctx,
            sd[p + "self_attn.vision_expert_dense.weight"],
            sd[p + "self_attn.language_expert_dense.weight"],
        )
        x = res + attn_out
        res = x
        xn = torch.where(
            padding[..., None],
            t_rms_norm(x, sd[p + "post_attention_layernorm.weight"], cfg.rms_norm_eps),
            x,
        )

        def mlp(t, pre):
            gate = t @ sd[p + f"mlp.{pre}.gate_proj.weight"].T
            up = t @ sd[p + f"mlp.{pre}.up_proj.weight"].T
            return (F.silu(gate) * up) @ sd[p + f"mlp.{pre}.down_proj.weight"].T

        out = torch.zeros_like(xn)
        out[vis] = mlp(xn[vis], "vision_mlp")
        out[lang] = mlp(xn[lang], "language_mlp")
        x = res + out
    x = t_rms_norm(x, sd["model.norm.weight"], cfg.rms_norm_eps)
    logits = (x @ sd["lm_head.weight"].T).float()
    return x, logits


def torch_vit_surgery(sd, cfg):
    """The reference's 2-D checkpoint adaptation, in torch (visual.py:37-57,
    resample.py:31-53): pos grid bilinear-resampled + z-repeated; patch conv
    HW-resampled with response scaling then mean-inflated over z."""
    v = cfg.vision
    out = dict(sd)
    vp = "model.vision."
    pos = sd[vp + "patch_embedding.position_embedding.weight"]
    cls_pos, grid = pos[:1], pos[1:]
    h0, w0 = v.pt_pos_embed_shape
    grid = grid.reshape(h0, w0, -1).permute(2, 0, 1)[None]
    if (h0, w0) != tuple(v.pos_embed_shape[1:]):
        grid = F.interpolate(grid, v.pos_embed_shape[1:], mode="bilinear", align_corners=False)
    grid = grid[:, :, None].expand(-1, -1, v.pos_embed_shape[0], -1, -1).contiguous()
    out["__pos3d"] = grid
    out["__cls_pos"] = cls_pos

    w = sd[vp + "patch_embedding.proj.weight"]
    if w.shape[2:] != tuple(v.patch_size[1:]):
        old = w.shape[2] * w.shape[3]
        w = F.interpolate(w, v.patch_size[1:], mode="bilinear", align_corners=False)
        w = w * (old / (v.patch_size[1] * v.patch_size[2]))
    w = (w / v.patch_size[0])[:, :, None].expand(-1, -1, v.patch_size[0], -1, -1).contiguous()
    out["__proj3d"] = w
    return out


def torch_vit_forward(sd, cfg, image, patch_size, pool_size):
    """Mirror of EVA2CLIPModel (visual.py:59-208) on the surgered 3-D weights."""
    v = cfg.vision
    vp = "model.vision."
    w = sd["__proj3d"]
    if w.shape[2] != patch_size[0]:
        assert w.shape[2] % patch_size[0] == 0
        w = w.reshape(
            w.shape[0], w.shape[1], patch_size[0], w.shape[2] // patch_size[0], *w.shape[3:]
        ).sum(3)
    x = F.conv3d(image, w, sd[vp + "patch_embedding.proj.bias"], stride=patch_size)
    pos = F.interpolate(sd["__pos3d"], x.shape[2:], mode="trilinear", align_corners=False)
    x = (x + pos).flatten(2).transpose(1, 2)  # (B, T, C)
    cls = sd[vp + "patch_embedding.cls_embedding"].reshape(1, -1) + sd["__cls_pos"]
    x = torch.cat([cls[None].expand(x.shape[0], -1, -1), x], dim=1)

    b, s, c = x.shape
    nh = v.num_heads
    for i in range(v.num_hidden_layers):
        p = f"{vp}transformer.layers.{i}."
        qkv = x @ sd[p + "attention.query_key_value.weight"].T + sd[p + "attention.query_key_value.bias"]
        q, k, vv = [
            t.reshape(b, s, nh, c // nh).permute(0, 2, 1, 3) for t in qkv.split(c, dim=-1)
        ]
        scores = (q * (c // nh) ** -0.5) @ k.transpose(-1, -2)
        attn = scores.float().softmax(-1).to(q.dtype) @ vv
        attn = attn.permute(0, 2, 1, 3).reshape(b, s, c)
        attn = attn @ sd[p + "attention.dense.weight"].T + sd[p + "attention.dense.bias"]
        # post-norm quirk: residual + LN(sublayer_out)
        x = x + F.layer_norm(
            attn, (c,), sd[p + "input_layernorm.weight"], sd[p + "input_layernorm.bias"], v.layer_norm_eps
        )
        h = F.gelu(x @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
        h = h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + F.layer_norm(
            h, (c,), sd[p + "post_attention_layernorm.weight"], sd[p + "post_attention_layernorm.bias"], v.layer_norm_eps
        )

    x = x[:, 1:]
    grid = tuple(i // p for i, p in zip(image.shape[2:], patch_size))
    if any(p > 1 for p in pool_size):
        x = x.transpose(1, 2).reshape(b, c, *grid)
        x = F.max_pool3d(x, pool_size)
        x = x.flatten(2).transpose(1, 2)
    x = x @ sd[vp + "linear_proj.linear_proj.weight"].T
    x = F.gelu(
        F.layer_norm(
            x, (x.shape[-1],), sd[vp + "linear_proj.norm1.weight"], sd[vp + "linear_proj.norm1.bias"]
        )
    )
    x = F.silu(x @ sd[vp + "linear_proj.gate_proj.weight"].T) * (
        x @ sd[vp + "linear_proj.dense_h_to_4h.weight"].T
    )
    x = x @ sd[vp + "linear_proj.dense_4h_to_h.weight"].T
    boi = sd[vp + "boi"].reshape(1, 1, -1).expand(b, -1, -1)
    eoi = sd[vp + "eoi"].reshape(1, 1, -1).expand(b, -1, -1)
    return torch.cat([boi, x, eoi], dim=1)


# --------------------------------------------------------------------------
# state-dict builder (HF checkpoint key format, 2-D vision weights)
# --------------------------------------------------------------------------

def make_cogvlm_state_dict(cfg: CogVLMConfig, gen):
    c, i, L, voc = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size
    v = cfg.vision
    vc, vi, vL = v.hidden_size, v.intermediate_size, v.num_hidden_layers

    def r(*shape):
        return torch.from_numpy(gen.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "model.embed_tokens.weight": r(voc, c),
        "model.norm.weight": 1 + 0.1 * r(c),
        "lm_head.weight": r(voc, c),
    }
    for li in range(L):
        p = f"model.layers.{li}."
        sd[p + "self_attn.vision_expert_query_key_value.weight"] = r(3 * c, c)
        sd[p + "self_attn.language_expert_query_key_value.weight"] = r(3 * c, c)
        sd[p + "self_attn.vision_expert_dense.weight"] = r(c, c)
        sd[p + "self_attn.language_expert_dense.weight"] = r(c, c)
        for pre in ("vision_mlp", "language_mlp"):
            sd[p + f"mlp.{pre}.gate_proj.weight"] = r(i, c)
            sd[p + f"mlp.{pre}.up_proj.weight"] = r(i, c)
            sd[p + f"mlp.{pre}.down_proj.weight"] = r(c, i)
        sd[p + "input_layernorm.weight"] = 1 + 0.1 * r(c)
        sd[p + "post_attention_layernorm.weight"] = 1 + 0.1 * r(c)

    vp = "model.vision."
    h0, w0 = v.pt_pos_embed_shape
    sd[vp + "patch_embedding.position_embedding.weight"] = r(1 + h0 * w0, vc)
    sd[vp + "patch_embedding.proj.weight"] = r(vc, v.in_channels, 4, 4)  # 2-D ckpt kernel
    sd[vp + "patch_embedding.proj.bias"] = r(vc)
    sd[vp + "patch_embedding.cls_embedding"] = r(vc)
    for li in range(vL):
        p = f"{vp}transformer.layers.{li}."
        sd[p + "attention.query_key_value.weight"] = r(3 * vc, vc)
        sd[p + "attention.query_key_value.bias"] = r(3 * vc)
        sd[p + "attention.dense.weight"] = r(vc, vc)
        sd[p + "attention.dense.bias"] = r(vc)
        sd[p + "input_layernorm.weight"] = 1 + 0.1 * r(vc)
        sd[p + "input_layernorm.bias"] = 0.1 * r(vc)
        sd[p + "post_attention_layernorm.weight"] = 1 + 0.1 * r(vc)
        sd[p + "post_attention_layernorm.bias"] = 0.1 * r(vc)
        sd[p + "mlp.fc1.weight"] = r(vi, vc)
        sd[p + "mlp.fc1.bias"] = r(vi)
        sd[p + "mlp.fc2.weight"] = r(vc, vi)
        sd[p + "mlp.fc2.bias"] = r(vc)
    sd[vp + "linear_proj.linear_proj.weight"] = r(c, vc)
    sd[vp + "linear_proj.norm1.weight"] = 1 + 0.1 * r(c)
    sd[vp + "linear_proj.norm1.bias"] = 0.1 * r(c)
    sd[vp + "linear_proj.gate_proj.weight"] = r(i, c)
    sd[vp + "linear_proj.dense_h_to_4h.weight"] = r(i, c)
    sd[vp + "linear_proj.dense_4h_to_h.weight"] = r(c, i)
    sd[vp + "boi"] = r(1, 1, c)
    sd[vp + "eoi"] = r(1, 1, c)
    return sd


CFG = CogVLMConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
    vision=VisionConfig(
        hidden_size=24,
        intermediate_size=40,
        num_hidden_layers=2,
        num_heads=4,
        patch_size=(2, 6, 6),       # z_max 2; HW 6 != ckpt 4 -> exercises resample
        pos_embed_shape=(2, 4, 4),  # 5x5 ckpt grid -> 4x4 = a true downsample
        pt_pos_embed_shape=(5, 5),
    ),
)


@pytest.fixture(scope="module")
def imported():
    gen = np.random.default_rng(7)
    sd = make_cogvlm_state_dict(CFG, gen)
    params = import_cogvlm({k: v.numpy() for k, v in sd.items()}, CFG)
    params = jax.tree.map(jnp.asarray, params)
    return sd, params


def test_resample_matches_torch_interpolate():
    """resample_nd == F.interpolate(align_corners=False) in all regimes,
    including downsampling (where jax.image.resize would anti-alias)."""
    from mmmm_tpu.ops.resample import resample_nd

    gen = np.random.default_rng(0)
    x2 = gen.standard_normal((1, 3, 5, 5)).astype(np.float32)
    for tgt in [(4, 4), (8, 8), (7, 3), (32, 32)]:
        got = np.asarray(resample_nd(jnp.asarray(x2), tgt))
        want = F.interpolate(torch.from_numpy(x2), tgt, mode="bilinear", align_corners=False)
        np.testing.assert_allclose(got, want.numpy(), atol=2e-6)
    x3 = gen.standard_normal((1, 2, 4, 6, 6)).astype(np.float32)
    for tgt in [(2, 4, 4), (8, 8, 8), (3, 5, 7)]:
        got = np.asarray(resample_nd(jnp.asarray(x3), tgt))
        want = F.interpolate(torch.from_numpy(x3), tgt, mode="trilinear", align_corners=False)
        np.testing.assert_allclose(got, want.numpy(), atol=2e-6)


def test_surgery_rules_match_torch(imported):
    """Importer's pos-embed inflation + conv resample/inflation == the same
    rules computed with torch ops (visual.py:37-57, resample.py:31-53)."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["pos"]), tsd["__pos3d"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["proj_w"]), tsd["__proj3d"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["cls_pos"]), tsd["__cls_pos"].numpy(), atol=0
    )


@pytest.mark.parametrize("patch_z", [2, 1])
def test_vit_forward_parity(imported, patch_z):
    """JAX ViT == torch mirror on the surgered weights, incl. the runtime
    z-kernel collapse (patch_z=1 sums the stored z=2 kernel)."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    gen = np.random.default_rng(3)
    image = gen.standard_normal((2, 3, 2, 24, 24)).astype(np.float32)
    patch = (patch_z, 6, 6)
    pool = (1, 2, 2)
    want = torch_vit_forward(tsd, CFG, torch.from_numpy(image), patch, pool).numpy()

    from mmmm_tpu.models.cogvlm.vit import vit_forward

    got = np.asarray(
        jax.jit(
            lambda p, im: vit_forward(p, CFG, im, patch, pool, attn_impl="xla")
        )(params["vision"], jnp.asarray(image))
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_full_forward_parity(imported):
    """End-to-end (embed -> vision splice -> dual-expert decoder -> fp32
    logits): JAX forward == torch mirror to ~1e-4, valid positions, both
    a full-length and a padded sample."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    gen = np.random.default_rng(11)
    b = 2
    patch, pool = (2, 6, 6), (1, 2, 2)
    image = gen.standard_normal((b, 3, 2, 24, 24)).astype(np.float32)
    vis_tok = torch_vit_forward(tsd, CFG, torch.from_numpy(image), patch, pool)
    n_vis = vis_tok.shape[1]  # boi + 4 + eoi = 6

    s = 16
    ids = gen.integers(0, CFG.vocab_size, size=(b, s)).astype(np.int32)
    tt = np.zeros((b, s), np.int32)
    tt[:, 1 : 1 + n_vis] = 1
    # CogVLM position scheme: bos=0, boi=1, patches share 2, eoi=3, text 4...
    pos = np.zeros((b, s), np.int32)
    pos[:, 1] = 1
    pos[:, 2 : n_vis] = 2
    pos[:, n_vis] = 3
    pos[:, n_vis + 1 :] = 4 + np.arange(s - n_vis - 1)
    valid_len = np.asarray([s, s - 3])
    padding = (np.arange(s)[None] < valid_len[:, None])

    # torch: embed, splice, forward
    emb = F.embedding(torch.from_numpy(ids.astype(np.int64)), tsd["model.embed_tokens.weight"])
    emb = torch.cat([emb[:, :1], vis_tok, emb[:, 1 + n_vis :]], dim=1)
    _, want_logits = torch_llm_forward(
        tsd, CFG, emb, torch.from_numpy(tt.astype(np.int64)),
        torch.from_numpy(pos.astype(np.int64)), torch.from_numpy(padding),
    )

    segs = padding.astype(np.int32)
    got_hidden, got_logits = jax.jit(
        lambda p, *a: cogvlm_forward(p, CFG, *a, patch, pool, attn_impl="xla")
    )(
        params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
        jnp.asarray(segs), jnp.asarray(image),
    )
    got_logits = np.asarray(got_logits)
    for bi in range(b):
        np.testing.assert_allclose(
            got_logits[bi, : valid_len[bi]],
            want_logits.numpy()[bi, : valid_len[bi]],
            atol=2e-4, rtol=1e-3,
        )


def test_inflate_conv_z_center_even_odd():
    """Center inflation == the reference rule for odd and even depths
    (resample.py:40-49)."""
    from mmmm_tpu.train.import_torch import inflate_conv_z

    w = np.random.default_rng(0).standard_normal((2, 3, 4, 4)).astype(np.float32)
    odd = inflate_conv_z(w, 3, "center")
    assert odd.shape == (2, 3, 3, 4, 4)
    np.testing.assert_array_equal(odd[:, :, 1], w)
    np.testing.assert_array_equal(odd[:, :, 0], 0)
    even = inflate_conv_z(w, 4, "center")
    np.testing.assert_array_equal(even[:, :, 1], w / 2)
    np.testing.assert_array_equal(even[:, :, 2], w / 2)
    np.testing.assert_array_equal(even[:, :, 0], 0)
    # sum over z preserves the 2-D response in both modes
    np.testing.assert_allclose(inflate_conv_z(w, 4, "mean").sum(2), w, atol=1e-6)
    np.testing.assert_allclose(even.sum(2), w, atol=1e-6)


# ==========================================================================
# SegVol SAM parity (encoder surgery + prompt encoder + two-way decoder)
# Reference math mirrored:
#   - pre-norm MONAI ViT blocks           image_encoder.py:121-136,204-207
#   - SegVol patch/pos-embed surgery      image_encoder.py:82-119
#   - random-Fourier dense PE             prompt_encoder.py:154-201
#   - text prompt + no-mask dense embed   prompt_encoder.py:124-151
#   - two-way transformer                 transformer.py:66-239
#   - mask decoder + z-collapse upscaler  mask_decoder.py:89-149, resample.py:64-94
#   - box/disc instance heads             sam.py:394-432
# ==========================================================================

from mmmm_tpu.models.segvol import SamConfig
from mmmm_tpu.models.segvol.sam import init_sam_params, instance_sam_forward, sam_forward
from mmmm_tpu.train.import_torch import import_segvol_sam, merge_imported

SAM_CFG = SamConfig(
    in_channels=3,
    embed_dim=32,
    encoder_num_layers=2,
    encoder_num_heads=4,
    patch_size=(2, 4, 4),
    pos_embed_shape=(2, 4, 4),
    num_instances=3,
    decoder_depth=2,
    decoder_num_heads=8,
    decoder_mlp_dim=64,
)
PT_PATCH = (1, 4, 4)      # checkpoint stores z=1 -> resampled to 2 (scale=True)
PT_POS = (2, 2, 2)        # checkpoint grid -> upsampled to (2, 4, 4)
PT_MASK_TOKENS = 2        # checkpoint rows < num_mask_tokens=4 -> fresh pad


def make_segvol_state_dict(cfg: SamConfig, gen):
    c = cfg.embed_dim

    def r(*shape):
        return torch.from_numpy(gen.standard_normal(shape).astype(np.float32) * 0.05)

    p0, p1, p2 = PT_PATCH
    sd = {
        "image_encoder.patch_embedding.patch_embeddings.1.weight": r(c, p0 * p1 * p2 * 1),
        "image_encoder.patch_embedding.patch_embeddings.1.bias": r(c),
        "image_encoder.patch_embedding.position_embeddings": r(1, int(np.prod(PT_POS)), c),
        "image_encoder.norm.weight": 1 + 0.1 * r(c),
        "image_encoder.norm.bias": 0.1 * r(c),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": r(3, c // 2),
        "prompt_encoder.no_mask_embed.weight": r(1, c),
    }
    for i in range(cfg.encoder_num_layers):
        p = f"image_encoder.blocks.{i}."
        sd[p + "attn.qkv.weight"] = r(3 * c, c)
        sd[p + "attn.out_proj.weight"] = r(c, c)
        sd[p + "attn.out_proj.bias"] = r(c)
        sd[p + "norm1.weight"] = 1 + 0.1 * r(c)
        sd[p + "norm1.bias"] = 0.1 * r(c)
        sd[p + "norm2.weight"] = 1 + 0.1 * r(c)
        sd[p + "norm2.bias"] = 0.1 * r(c)
        sd[p + "mlp.linear1.weight"] = r(4 * c, c)
        sd[p + "mlp.linear1.bias"] = r(4 * c)
        sd[p + "mlp.linear2.weight"] = r(c, 4 * c)
        sd[p + "mlp.linear2.bias"] = r(c)

    md = "mask_decoder."
    sd[md + "iou_token.weight"] = r(1, c)
    sd[md + "mask_tokens.weight"] = r(PT_MASK_TOKENS, c)
    internal = c // cfg.attention_downsample_rate

    def attn_sd(prefix, idim):
        sd[prefix + "q_proj.weight"] = r(idim, c)
        sd[prefix + "q_proj.bias"] = r(idim)
        sd[prefix + "k_proj.weight"] = r(idim, c)
        sd[prefix + "k_proj.bias"] = r(idim)
        sd[prefix + "v_proj.weight"] = r(idim, c)
        sd[prefix + "v_proj.bias"] = r(idim)
        sd[prefix + "out_proj.weight"] = r(c, idim)
        sd[prefix + "out_proj.bias"] = r(c)

    for i in range(cfg.decoder_depth):
        p = f"{md}transformer.layers.{i}."
        attn_sd(p + "self_attn.", c)
        attn_sd(p + "cross_attn_token_to_image.", internal)
        attn_sd(p + "cross_attn_image_to_token.", internal)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[p + n + ".weight"] = 1 + 0.1 * r(c)
            sd[p + n + ".bias"] = 0.1 * r(c)
        sd[p + "mlp.lin1.weight"] = r(cfg.decoder_mlp_dim, c)
        sd[p + "mlp.lin1.bias"] = r(cfg.decoder_mlp_dim)
        sd[p + "mlp.lin2.weight"] = r(c, cfg.decoder_mlp_dim)
        sd[p + "mlp.lin2.bias"] = r(c)
    attn_sd(md + "transformer.final_attn_token_to_image.", internal)
    sd[md + "transformer.norm_final_attn.weight"] = 1 + 0.1 * r(c)
    sd[md + "transformer.norm_final_attn.bias"] = 0.1 * r(c)
    sd[md + "output_upscaling.0.weight"] = r(c, c // 4, 2, 2, 2)
    sd[md + "output_upscaling.0.bias"] = r(c // 4)
    # 4-D LayerNormNd stats, as SegVol stores them (mean-collapsed on load)
    sd[md + "output_upscaling.1.weight"] = 1 + 0.1 * r(c // 4, 2, 3, 3)
    sd[md + "output_upscaling.1.bias"] = 0.1 * r(c // 4, 2, 3, 3)
    sd[md + "output_upscaling.3.weight"] = r(c // 4, c // 8, 2, 2, 2)
    sd[md + "output_upscaling.3.bias"] = r(c // 8)
    for i in range(2):
        p = f"{md}output_hypernetworks_mlps.{i}."
        sd[p + "layers.0.weight"] = r(c, c)
        sd[p + "layers.0.bias"] = r(c)
        sd[p + "layers.1.weight"] = r(c, c)
        sd[p + "layers.1.bias"] = r(c)
        sd[p + "layers.2.weight"] = r(c // 8, c)
        sd[p + "layers.2.bias"] = r(c // 8)
    sd[md + "txt_align_upscaled_embedding.weight"] = r(c // 8, c)
    sd[md + "txt_align_upscaled_embedding.bias"] = r(c // 8)
    return sd


def torch_segvol_surgery(sd, cfg: SamConfig):
    """SegVol checkpoint adaptation in torch (image_encoder.py:82-119)."""
    out = dict(sd)
    c = cfg.embed_dim
    p0, p1, p2 = PT_PATCH
    pw = sd["image_encoder.patch_embedding.patch_embeddings.1.weight"]
    pw = pw.reshape(c, p0, p1, p2, 1).permute(0, 4, 1, 2, 3)
    if PT_PATCH != tuple(cfg.patch_size):
        old = p0 * p1 * p2
        pw = F.interpolate(pw, cfg.patch_size, mode="trilinear", align_corners=False)
        pw = pw * (old / np.prod(cfg.patch_size))
    pw = pw.expand(-1, cfg.in_channels, -1, -1, -1) / cfg.in_channels
    out["__proj3d"] = pw.contiguous()
    pos = sd["image_encoder.patch_embedding.position_embeddings"]
    d0, h0, w0 = PT_POS
    pos = pos.reshape(d0, h0, w0, c).permute(3, 0, 1, 2)[None]
    if PT_POS != tuple(cfg.pos_embed_shape):
        pos = F.interpolate(pos, cfg.pos_embed_shape, mode="trilinear", align_corners=False)
    out["__pos3d"] = pos
    ln_w = sd["mask_decoder.output_upscaling.1.weight"]
    ln_b = sd["mask_decoder.output_upscaling.1.bias"]
    out["__up_ln_w"] = ln_w.reshape(ln_w.shape[0], -1).mean(-1)
    out["__up_ln_b"] = ln_b.reshape(ln_b.shape[0], -1).mean(-1)
    return out


def torch_segvol_encoder(sd, cfg: SamConfig, image, patch_size):
    w = sd["__proj3d"]
    if w.shape[2] != patch_size[0]:
        assert w.shape[2] % patch_size[0] == 0
        w = w.reshape(
            w.shape[0], w.shape[1], patch_size[0], w.shape[2] // patch_size[0], *w.shape[3:]
        ).sum(3)
    x = F.conv3d(image, w, sd["image_encoder.patch_embedding.patch_embeddings.1.bias"], stride=patch_size)
    grid = x.shape[2:]
    pos = F.interpolate(sd["__pos3d"], grid, mode="trilinear", align_corners=False)
    x = (x + pos).flatten(2).transpose(1, 2)
    b, s, c = x.shape
    nh = cfg.encoder_num_heads
    for i in range(cfg.encoder_num_layers):
        p = f"image_encoder.blocks.{i}."
        h = F.layer_norm(x, (c,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = h @ sd[p + "attn.qkv.weight"].T
        q, k, v = [t.reshape(b, s, nh, c // nh).permute(0, 2, 1, 3) for t in qkv.split(c, dim=-1)]
        attn = ((q * (c // nh) ** -0.5) @ k.transpose(-1, -2)).float().softmax(-1).to(q.dtype) @ v
        attn = attn.permute(0, 2, 1, 3).reshape(b, s, c)
        x = x + attn @ sd[p + "attn.out_proj.weight"].T + sd[p + "attn.out_proj.bias"]
        h = F.layer_norm(x, (c,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        h = F.gelu(h @ sd[p + "mlp.linear1.weight"].T + sd[p + "mlp.linear1.bias"])
        x = x + h @ sd[p + "mlp.linear2.weight"].T + sd[p + "mlp.linear2.bias"]
    x = F.layer_norm(x, (c,), sd["image_encoder.norm.weight"], sd["image_encoder.norm.bias"])
    return x.transpose(1, 2).reshape(b, c, *grid)


def torch_dense_pe(sd, grid):
    g = sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    h, w, d = grid
    ones = torch.ones(h, w, d)
    y = (ones.cumsum(0) - 0.5) / h
    x = (ones.cumsum(1) - 0.5) / w
    z = (ones.cumsum(2) - 0.5) / d
    coords = 2 * torch.stack([x, y, z], dim=-1) - 1
    proj = 2 * np.pi * (coords @ g)
    return torch.cat([proj.sin(), proj.cos()], dim=-1).permute(3, 0, 1, 2)


def torch_attn(sd, prefix, q, k, v, num_heads):
    qh = q @ sd[prefix + "q_proj.weight"].T + sd[prefix + "q_proj.bias"]
    kh = k @ sd[prefix + "k_proj.weight"].T + sd[prefix + "k_proj.bias"]
    vh = v @ sd[prefix + "v_proj.weight"].T + sd[prefix + "v_proj.bias"]
    internal = qh.shape[-1]
    d = internal // num_heads

    def split(t):
        return t.reshape(*t.shape[:-1], num_heads, d).transpose(-3, -2)

    qh, kh, vh = split(qh), split(kh), split(vh)
    probs = ((qh * d ** -0.5) @ kh.transpose(-1, -2)).float().softmax(-1).to(qh.dtype)
    out = (probs @ vh).transpose(-3, -2).reshape(*q.shape[:-1], internal)
    return out @ sd[prefix + "out_proj.weight"].T + sd[prefix + "out_proj.bias"]


def torch_two_way(sd, cfg: SamConfig, image_emb, image_pe, tokens):
    md = "mask_decoder.transformer."
    h = cfg.decoder_num_heads
    queries, keys = tokens, image_emb

    def ln(prefix, x):
        return F.layer_norm(x, (x.shape[-1],), sd[prefix + "weight"], sd[prefix + "bias"])

    for i in range(cfg.decoder_depth):
        p = f"{md}layers.{i}."
        if i == 0:
            queries = torch_attn(sd, p + "self_attn.", queries, queries, queries, h)
        else:
            q = queries + tokens
            queries = queries + torch_attn(sd, p + "self_attn.", q, q, queries, h)
        queries = ln(p + "norm1.", queries)
        q = queries + tokens
        k = keys + image_pe
        queries = queries + torch_attn(sd, p + "cross_attn_token_to_image.", q, k, keys, h)
        queries = ln(p + "norm2.", queries)
        mlp = F.relu(queries @ sd[p + "mlp.lin1.weight"].T + sd[p + "mlp.lin1.bias"])
        mlp = mlp @ sd[p + "mlp.lin2.weight"].T + sd[p + "mlp.lin2.bias"]
        queries = ln(p + "norm3.", queries + mlp)
        q = queries + tokens
        k = keys + image_pe
        keys = keys + torch_attn(sd, p + "cross_attn_image_to_token.", k, q, queries, h)
        keys = ln(p + "norm4.", keys)
    q = queries + tokens
    k = keys + image_pe
    queries = queries + torch_attn(sd, md + "final_attn_token_to_image.", q, k, keys, h)
    queries = ln(md + "norm_final_attn.", queries)
    return queries, keys


def torch_upsample(x, w, b, patch_size_z, cnt):
    if patch_size_z < (1 << (cnt + 1)):
        w = w.mean(2, keepdim=True)
        stride = (1, 2, 2)
    else:
        stride = (2, 2, 2)
    return F.conv_transpose3d(x, w, b, stride)


def torch_mask_decoder(sd, cfg: SamConfig, emb, pe, text, patch_size_z, mask_tokens):
    md = "mask_decoder."
    c, gd, gh, gw = emb.shape
    output_tokens = torch.cat([sd[md + "iou_token.weight"], mask_tokens], dim=0)
    tokens = torch.cat([output_tokens, text[None]], dim=0)
    dense = sd["prompt_encoder.no_mask_embed.weight"].reshape(-1, 1, 1, 1).expand(c, gd, gh, gw)
    src = (emb + dense).reshape(c, -1).T
    pe_t = pe.reshape(c, -1).T
    hs, src = torch_two_way(sd, cfg, src, pe_t, tokens)
    mask_tokens_out = hs[1 : 1 + cfg.num_mask_tokens]
    up = src.T.reshape(1, c, gd, gh, gw)
    up = torch_upsample(up, sd[md + "output_upscaling.0.weight"], sd[md + "output_upscaling.0.bias"], patch_size_z, 0)
    up = F.layer_norm(
        up.permute(0, 2, 3, 4, 1), (c // 4,), sd["__up_ln_w"], sd["__up_ln_b"]
    ).permute(0, 4, 1, 2, 3)
    up = F.gelu(up)
    up = torch_upsample(up, sd[md + "output_upscaling.3.weight"], sd[md + "output_upscaling.3.bias"], patch_size_z, 1)
    up = F.gelu(up)[0]

    def mlp3(prefix, t):
        t = F.relu(t @ sd[prefix + "layers.0.weight"].T + sd[prefix + "layers.0.bias"])
        t = F.relu(t @ sd[prefix + "layers.1.weight"].T + sd[prefix + "layers.1.bias"])
        return t @ sd[prefix + "layers.2.weight"].T + sd[prefix + "layers.2.bias"]

    hyper = torch.cat(
        [
            mlp3(md + "output_hypernetworks_mlps.0.", mask_tokens_out[:1]),
            mlp3(md + "output_hypernetworks_mlps.1.", mask_tokens_out[1:]),
        ],
        dim=0,
    )
    masks = torch.einsum("mc,cdhw->mdhw", hyper, up)
    txt = text @ sd[md + "txt_align_upscaled_embedding.weight"].T + sd[md + "txt_align_upscaled_embedding.bias"]
    masks = masks + torch.einsum("c,cdhw->dhw", txt, up)[None]
    return masks, mask_tokens_out


@pytest.fixture(scope="module")
def segvol_imported():
    gen = np.random.default_rng(21)
    sd = make_segvol_state_dict(SAM_CFG, gen)
    fresh = init_sam_params(jax.random.PRNGKey(5), SAM_CFG, instance=True)
    imported = import_segvol_sam(
        {k: v.numpy() for k, v in sd.items()},
        SAM_CFG,
        pt_in_channels=1,
        pt_patch_size=PT_PATCH,
        pt_pos_embed_shape=PT_POS,
        fresh_mask_tokens=np.asarray(fresh["decoder"]["mask_tokens"]),
    )
    params = jax.tree.map(jnp.asarray, merge_imported(fresh, imported))
    return sd, params


def test_segvol_surgery_matches_torch(segvol_imported):
    sd, params = segvol_imported
    tsd = torch_segvol_surgery(sd, SAM_CFG)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["patch"]["proj_w"]), tsd["__proj3d"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["patch"]["pos"]), tsd["__pos3d"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["up_ln"]["w"]), tsd["__up_ln_w"].numpy(), atol=1e-6
    )
    # pretrained mask-token rows imported, extra rows keep the fresh init
    mt = np.asarray(params["decoder"]["mask_tokens"])
    np.testing.assert_allclose(mt[:PT_MASK_TOKENS], sd["mask_decoder.mask_tokens.weight"].numpy())
    assert np.abs(mt[PT_MASK_TOKENS:]).sum() > 0


@pytest.mark.parametrize("patch_z", [2, 1])
def test_segvol_semantic_forward_parity(segvol_imported, patch_z):
    """sam_forward (encoder + text prompt + two-way decoder + z-aware
    upscaling + trilinear upsample) == torch mirror."""
    sd, params = segvol_imported
    tsd = torch_segvol_surgery(sd, SAM_CFG)
    gen = np.random.default_rng(31)
    image = gen.standard_normal((1, 3, 2, 16, 16)).astype(np.float32)
    prompts = gen.standard_normal((1, 2, SAM_CFG.embed_dim)).astype(np.float32)
    patch = (patch_z, 4, 4)

    t_emb = torch_segvol_encoder(tsd, SAM_CFG, torch.from_numpy(image), patch)
    pe = torch_dense_pe(tsd, t_emb.shape[2:])
    mt = torch.from_numpy(np.asarray(params["decoder"]["mask_tokens"]))
    want = []
    for n in range(prompts.shape[1]):
        m, _ = torch_mask_decoder(
            tsd, SAM_CFG, t_emb[0], pe, torch.from_numpy(prompts[0, n]), patch_z, mt
        )
        want.append(
            F.interpolate(m[0][None, None], image.shape[2:], mode="trilinear")[0, 0]
        )
    want = torch.stack(want)[None]  # (1, N, D, H, W) semantic token

    got, _ = jax.jit(
        lambda p, im, pr: sam_forward(p, SAM_CFG, im, patch, pr, attn_impl="xla")
    )(params, jnp.asarray(image), jnp.asarray(prompts))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4, rtol=1e-3)


def test_segvol_instance_heads_parity(segvol_imported):
    """Box/disc head math on the decoder token embeddings == torch mirror
    (heads are fresh-initialized; weights shared via the merged tree)."""
    sd, params = segvol_imported
    tsd = torch_segvol_surgery(sd, SAM_CFG)
    gen = np.random.default_rng(41)
    image = gen.standard_normal((1, 3, 2, 16, 16)).astype(np.float32)
    prompts = gen.standard_normal((1, 1, SAM_CFG.embed_dim)).astype(np.float32)
    patch = (2, 4, 4)

    out = jax.jit(
        lambda p, im, pr: dataclasses_to_tuple(
            instance_sam_forward(p, SAM_CFG, im, patch, pr, attn_impl="xla")
        )
    )(params, jnp.asarray(image), jnp.asarray(prompts))
    masks, masks_low, boxes, disc = out

    t_emb = torch_segvol_encoder(tsd, SAM_CFG, torch.from_numpy(image), patch)
    pe = torch_dense_pe(tsd, t_emb.shape[2:])
    mt = torch.from_numpy(np.asarray(params["decoder"]["mask_tokens"]))
    _, tok = torch_mask_decoder(
        tsd, SAM_CFG, t_emb[0], pe, torch.from_numpy(prompts[0, 0]), 2, mt
    )
    bh = {k: torch.from_numpy(np.asarray(v)) for k, v in params["box_head"].items()}
    x = F.relu(tok @ bh["w1"] + bh["b1"])
    x = F.relu(x @ bh["w2"] + bh["b2"])
    want_boxes = torch.sigmoid(x @ bh["w3"] + bh["b3"])
    dh = {k: torch.from_numpy(np.asarray(v)) for k, v in params["disc_head"].items()}
    y = F.relu(tok[1:] @ dh["w1"] + dh["b1"])
    want_disc = (y @ dh["w2"] + dh["b2"])[:, 0]
    np.testing.assert_allclose(np.asarray(boxes)[0, 0], want_boxes.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(disc)[0, 0], want_disc.numpy(), atol=1e-5, rtol=1e-4)


def dataclasses_to_tuple(o):
    return (o.masks_logits, o.masks_logits_low_res, o.boxes, o.disc_logit)
